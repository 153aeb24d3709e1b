"""Encoding operators: processlist event encode/decode, entry split.
Reference: processlist.go:96-120,136-158; scriptedinputsreceiver/
operator.go:130-164."""

from __future__ import annotations

import base64
import json
import zlib

from pyspark.sql import functions as F

from sparkcollector.operators.encode import (
    PROCESSLIST_VERSION,
    decode_processlist_message,
    processlist_event,
    split_entries,
)


def _procs(spark):
    return spark.createDataFrame(
        [
            ("h1", 10, "bash", 90, 5),
            ("h1", 2, "top", 40, 2),
            ("h1", 7, "idle", 1, 1),
            ("h2", 3, "py\\win", 50, 9),  # backslash exercises escaping
        ],
        ["host", "pid", "command", "cpu_c", "mem_c"],
    )


def test_processlist_event_message_format(spark):
    out = {
        r["host"]: r
        for r in processlist_event(
            _procs(spark), fields=["command", "cpu_c", "mem_c"],
            top_n=2, order_col="cpu_c",
        ).collect()
    }
    # top_n=2 drops h1's idle proc
    assert out["h1"]["n_procs"] == 2
    msg = json.loads(out["h1"]["message"])
    assert set(msg) == {"t", "v"} and msg["v"] == PROCESSLIST_VERSION
    # decode by hand: base64 -> zlib -> unescape
    raw = zlib.decompress(base64.b64decode(msg["t"])).decode()
    assert raw.replace("\\\\", "\\") == '{"2":["top",40,2],"10":["bash",90,5]}'


def test_processlist_exact_encoded_bytes(spark):
    """Pin the exact message for one host: the oracle can only check
    the decoded roundtrip (DuckDB has no zlib), so the encoded bytes
    are pinned here (zlib level-default, deterministic)."""
    one = spark.createDataFrame(
        [("h", 1, "a", 3, 4)], ["host", "pid", "command", "cpu_c", "mem_c"]
    )
    msg = processlist_event(
        one, fields=["command", "cpu_c", "mem_c"], order_col="cpu_c"
    ).collect()[0]["message"]
    expected_t = base64.b64encode(
        zlib.compress(b'{"1":["a",3,4]}')
    ).decode()
    assert json.loads(msg) == {"t": expected_t, "v": PROCESSLIST_VERSION}


def test_processlist_decode_roundtrip_with_backslashes(spark):
    enc = processlist_event(
        _procs(spark), fields=["command", "cpu_c", "mem_c"], top_n=10,
        order_col="cpu_c",
    )
    dec = {
        r["host"]: r["decoded"]
        for r in enc.select(
            "host", decode_processlist_message(F.col("message")).alias("decoded")
        ).collect()
    }
    # to_json escapes the backslash in py\win; decode un-doubles the
    # processlist escaping layer, leaving valid JSON text
    assert json.loads(dec["h2"]) == {"3": ["py\\win", 50, 9]}


def test_split_entries(spark):
    df = spark.createDataFrame(
        [("j1", "line a\nline b\n\nline c")], ["job", "stdout"]
    )
    out = split_entries(
        df, text_col="stdout", source="top", sourcetype="script"
    ).collect()
    assert [(r["entry_no"], r["entry"]) for r in out] == [
        (0, "line a"), (1, "line b"), (3, "line c")
    ]
    assert all(r["com.splunk.source"] == "top" for r in out)
    assert all(r["com.splunk.sourcetype"] == "script" for r in out)


def test_snapshot_diff_changes_only(spark):
    from sparkcollector.operators.encode import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k long, v string"
    )
    got = {r["k"]: r["change"]
           for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_jwt_parse_roundtrip_and_malformed(spark):
    import base64 as b64

    from sparkcollector.operators.encode import jwt_parse

    def tok(payload: str) -> str:
        enc = lambda s: b64.urlsafe_b64encode(s.encode()).decode().rstrip("=")
        return enc('{"alg":"HS256","typ":"JWT"}') + "." + enc(payload) + ".x"

    rows = [
        (1, tok('{"sub":"alice","iat":100,"exp":200}')),
        (2, tok('{"sub":"b?b","iat":1,"exp":2}')),  # ? -> base64url chars
        (3, "not-a-jwt"),
    ]
    df = spark.createDataFrame(rows, "id long, token string")
    got = {r["id"]: r for r in jwt_parse(df, "token").collect()}
    assert got[1]["jwt_alg"] == "HS256"
    assert got[1]["claim_sub"] == "alice" and got[1]["claim_exp"] == "200"
    assert got[2]["claim_sub"] == "b?b"
    assert got[3]["claim_sub"] is None and got[3]["jwt_alg"] is None


def _py_varint_msg(fields):
    """Independent golden encoder: [(field_no, value|None), ...] -> bytes."""
    out = b""
    for i, v in fields:
        if v is None:
            continue
        out += bytes([i * 8])
        while v >= 128:
            out += bytes([(v % 128) | 128])
            v >>= 7
        out += bytes([v])
    return out


def test_proto_varint_decode_golden_bytes(spark):
    from sparkcollector.operators.encode import proto_varint_decode

    rows = [
        (1, 0, 0, 0),
        (2, 127, 128, 129),
        (3, 300, 2**21 - 1, 2**56),
        (4, 986342345, None, 7),
        (5, 2**62, 1, 16383),
    ]
    df = spark.createDataFrame(
        [(i, _py_varint_msg([(1, a), (2, b), (3, c)])) for i, a, b, c in rows],
        "id long, pb binary",
    )
    got = {r["id"]: r for r in proto_varint_decode(df, "pb", 3).collect()}
    for i, a, b, c in rows:
        g = got[i]
        assert (g["pb_f1"], g["pb_f2"], g["pb_f3"]) == (a, b, c), i


def test_proto_varint_encode_matches_golden_and_roundtrips(spark):
    from sparkcollector.operators.encode import (
        proto_varint_decode,
        proto_varint_encode,
    )

    rows = [(1, 0, 0, 0), (2, 127, 128, 129), (3, 300, 2**21 - 1, 2**56),
            (4, 986342345, None, 7), (5, 2**62, 1, 16383)]
    df = spark.createDataFrame(rows, "id long, a long, b long, c long")
    enc = proto_varint_encode(df, ["a", "b", "c"])
    got = {r["id"]: r for r in
           proto_varint_decode(enc, "pb_bytes", 3).collect()}
    for i, a, b, c in rows:
        g = got[i]
        assert bytes(g["pb_bytes"]) == _py_varint_msg(
            [(1, a), (2, b), (3, c)]
        ), i
        assert (g["pb_f1"], g["pb_f2"], g["pb_f3"]) == (a, b, c), i


def test_proto_varint_decode_skips_unknown_fields(spark):
    from sparkcollector.operators.encode import proto_varint_decode

    # fields 5 and 7 are not requested; decoder must skip their varints
    # byte-correctly and still land fields 1 and 2.
    blob = (_py_varint_msg([(5, 999999)]) + _py_varint_msg([(1, 42)])
            + _py_varint_msg([(7, 3)]) + _py_varint_msg([(2, 77)]))
    df = spark.createDataFrame([(1, blob)], "id long, pb binary")
    g = proto_varint_decode(df, "pb", 3).collect()[0]
    assert (g["pb_f1"], g["pb_f2"], g["pb_f3"]) == (42, 77, None)
