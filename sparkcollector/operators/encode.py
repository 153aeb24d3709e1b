"""Encoding operators: processlist event encode, scripted-inputs split.

* :func:`processlist_event` — the processlist monitor's single-event
  encode (reference: internal/signalfx-agent/pkg/monitors/processlist/
  processlist.go:45-51, 96-120, 136-158): the top-N process rows per
  host collapse into ONE ``objects.top-info`` event whose message is
  ``{"t": base64(zlib(escaped JSON object)), "v": version}``.  The
  collect/rank/JSON-build stages are pure Catalyst; only the zlib
  compression itself is a (scalar, Arrow-batched) pandas UDF — there
  is no JVM-side zlib surface in Spark SQL, and the UDF sees one
  already-built string per host, not per process.
* :func:`decode_processlist_message` — the inverse (base64 → zlib
  inflate → unescape), used by tests and the roundtrip oracle entry.
* :func:`split_entries` — scripted_inputs stdout splitting
  (internal/receiver/scriptedinputsreceiver/operator.go:130-164): a
  captured output blob splits on a delimiter into one entry per line,
  tagged with ``com.splunk.source`` / ``com.splunk.sourcetype``
  attributes.  Pure Catalyst ``split`` + ``posexplode``.

Scale note: per-host process lists are bounded (top-N), so the
collect_list per host is O(N) — safe; the compression UDF processes
one small string per host.
"""

from __future__ import annotations

import base64
import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

PROCESSLIST_VERSION = "0.0.30"


# pandas_udf parses its DDL against the ACTIVE session, so the UDFs
# are built lazily (first use), not at import time.
def _zlib_b64():
    @pandas_udf("string")
    def f(s: pd.Series) -> pd.Series:
        """base64(zlib(utf-8 bytes)) — Arrow-batched, one per host."""
        return s.map(
            lambda v: None
            if v is None
            else base64.b64encode(zlib.compress(v.encode("utf-8"))).decode(
                "ascii"
            )
        )

    return f


def _b64_unzlib():
    @pandas_udf("string")
    def f(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else zlib.decompress(base64.b64decode(v)).decode("utf-8")
        )

    return f


def processlist_event(
    df: DataFrame,
    host_col: str = "host",
    pid_col: str = "pid",
    fields: list[str] | None = None,
    top_n: int = 10,
    order_col: str = "cpu_percent",
) -> DataFrame:
    """Top-``top_n`` processes per host → one encoded event per host.

    Mirrors encodeEventMessage: processes render as a JSON object
    ``{"<pid>": [field, ...], ...}``, backslashes are doubled, the
    blob is zlib-compressed and base64-wrapped into
    ``{"t":"<b64>","v":"<version>"}``.  Ranking (row_number over
    ``order_col`` desc) and the JSON build are Catalyst; pids sort
    numerically within the object so the message is deterministic.

    Output: (host, n_procs, message).
    """
    fields = fields or ["command", "cpu_percent", "mem_percent"]
    w = Window.partitionBy(host_col).orderBy(
        F.col(order_col).desc(), F.col(pid_col)
    )
    top = df.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= top_n
    )

    # per-field JSON scalar rendering: strings quoted+escaped via
    # to_json on a 1-field struct (then strip the wrapper), numerics
    # rendered as-is.
    def _json_scalar(c: Column) -> Column:
        j = F.to_json(F.struct(c.alias("x")))
        return F.regexp_replace(
            F.regexp_replace(j, r'^\{"x":', ""), r"\}$", ""
        )

    entry = F.concat(
        F.lit('"'),
        F.col(pid_col).cast("string"),
        F.lit('":['),
        F.concat_ws(",", *[_json_scalar(F.col(f)) for f in fields]),
        F.lit("]"),
    )
    g = (
        top.select(host_col, F.col(pid_col).cast("long").alias("_pid"), entry.alias("_e"))
        .groupBy(host_col)
        .agg(
            F.count(F.lit(1)).alias("n_procs"),
            F.concat(
                F.lit("{"),
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("_pid"), F.col("_e")))
                        ),
                        lambda s: s["_e"],
                    ),
                ),
                F.lit("}"),
            ).alias("_json"),
        )
    )
    escaped = F.regexp_replace(F.col("_json"), r"\\", r"\\\\")
    return g.select(
        F.col(host_col).alias("host"),
        "n_procs",
        F.concat(
            F.lit('{"t":"'),
            _zlib_b64()(escaped),
            F.lit('","v":"'),
            F.lit(PROCESSLIST_VERSION),
            F.lit('"}'),
        ).alias("message"),
    )


def decode_processlist_message(message: Column) -> Column:
    """Inverse of :func:`processlist_event`'s message: extract ``t``,
    base64-decode, inflate, un-escape — yields the JSON object text."""
    t = F.get_json_object(message, "$.t")
    return F.regexp_replace(_b64_unzlib()(t), r"\\\\", r"\\")


def split_entries(
    df: DataFrame,
    text_col: str = "stdout",
    delimiter: str = "\n",
    source: str | None = None,
    sourcetype: str | None = None,
    drop_empty: bool = True,
) -> DataFrame:
    """Split a captured output blob into one entry per line with the
    splunk source attributes attached (operator.go:150-158).

    Output: original columns + (entry_no, entry[, com.splunk.source,
    com.splunk.sourcetype]).
    """
    out = df.select(
        "*",
        F.posexplode(F.split(F.col(text_col), delimiter)).alias(
            "entry_no", "entry"
        ),
    ).drop(text_col)
    if drop_empty:
        out = out.filter(F.col("entry") != "")
    if source is not None:
        out = out.withColumn("com.splunk.source", F.lit(source))
    if sourcetype is not None:
        out = out.withColumn("com.splunk.sourcetype", F.lit(sourcetype))
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Keyed diff of two table versions (the regression-diff / CDC
    shape an Iceberg snapshot compare produces): one row per changed
    key with ``change`` in {added, removed, changed}, plus a
    per-column md5 over the compared fields so 'changed' is
    content-exact, not schema-guessy.  Unchanged keys emit nothing.

    ONE full-outer hash join on the key — the canonical minimal plan;
    both sides prune to key + compared columns before the shuffle.
    """
    def fp(df: DataFrame) -> DataFrame:
        h = F.md5(
            F.concat_ws(
                "\x1f", *[F.col(c).cast("string") for c in compare_cols]
            )
        )
        return df.select(*key_cols, h.alias("_h"))

    o = fp(old).withColumnRenamed("_h", "_ho")
    n = fp(new).withColumnRenamed("_h", "_hn")
    j = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") != F.col("_hn"), F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )


def jwt_parse(
    df: DataFrame,
    token_col: str,
    claims: list[str] | None = None,
) -> DataFrame:
    """Parse JWT tokens into header/payload claims, entirely JVM-side.

    Reference analog: the collector's HEC/signalfx receivers validate
    bearer tokens on ingest (access-token passthrough in exporter
    configs); a batch audit over logged tokens needs the same split +
    base64url-decode + claim extraction, as columnar expressions (no
    Python in the hot path — ``unbase64``/``get_json_object`` are
    Catalyst builtins inside one codegen span).

    Handles RFC 7515 base64url: translates ``-_`` back to ``+/`` and
    re-pads to a multiple of 4 before ``unbase64`` (JWT segments are
    emitted unpadded).  Malformed tokens (fewer than 2 dots) yield NULL
    claims rather than errors — dead-letter semantics, like
    ``parse.regex_parse(on_error="send")``.

    Returns the input plus ``jwt_alg`` and one ``claim_<name>`` string
    column per requested claim (default: sub, iat, exp).
    """
    claims = claims or ["sub", "iat", "exp"]

    def decoded(i: int) -> Column:
        s = F.split(F.col(token_col), r"\.").getItem(i)
        std = F.translate(s, "-_", "+/")
        padded = F.concat(
            std,
            F.substring(
                F.lit("==="), F.lit(1), (F.lit(4) - F.length(std) % 4) % 4
            ),
        )
        return F.unbase64(padded).cast("string")

    ok = F.size(F.split(F.col(token_col), r"\.")) >= 2
    hdr = F.when(ok, decoded(0))
    pay = F.when(ok, decoded(1))
    out = df.withColumn("jwt_alg", F.get_json_object(hdr, "$.alg"))
    for c in claims:
        out = out.withColumn(f"claim_{c}", F.get_json_object(pay, f"$.{c}"))
    return out


def proto_varint_decode(
    df: DataFrame,
    bin_col: str,
    n_fields: int = 3,
) -> DataFrame:
    """Decode protobuf varint fields from a binary column — no UDF.

    Wire-format ingestion without a Python worker: a protobuf message
    of varint-typed fields (wire type 0) is a byte-level state
    machine, and Catalyst's ``aggregate`` HOF IS a fold — so the
    decoder runs as a per-row JVM expression: bytes -> (tag, varint)
    pairs with an accumulator struct carrying {mode, field, val,
    shift, f1..fk}.  Handles multi-byte varints (7-bit groups,
    continuation bit) and fields arriving in any order; unknown field
    numbers are skipped byte-correctly.

    Returns input + ``pb_f1``..``pb_f{n_fields}`` (long, NULL when the
    field is absent).  Fields must be wire-type 0 (varint) with field
    numbers <= 15 (single-byte tags) — the shape the collector's
    internal counters use (signalfx protobuf datapoints,
    pkg/core/dpsink semantics as behavioral spec).
    """
    store = " ".join(
        f"when acc.field = {i} then"
        f" named_struct('mode', 0L, 'field', 0L, 'val', 0L, 'shift', 0L,"
        + ", ".join(
            (
                f"'f{j}', acc.val + shiftleft(byte % 128, "
                f"cast(acc.shift as int))"
                if j == i
                else f"'f{j}', acc.f{j}"
            )
            for j in range(1, n_fields + 1)
        )
        + ")"
        for i in range(1, n_fields + 1)
    )
    all_fs = ", ".join(
        f"'f{j}', acc.f{j}" for j in range(1, n_fields + 1)
    )
    lam = f"""
    (acc, byte) -> case
      when acc.mode = 0 then
        named_struct('mode', 1L, 'field', cast(byte div 8 as bigint),
          'val', 0L, 'shift', 0L, {all_fs})
      when byte >= 128 then
        named_struct('mode', 1L, 'field', acc.field,
          'val', acc.val + shiftleft(byte % 128,
            cast(acc.shift as int)),
          'shift', acc.shift + 7, {all_fs})
      else case {store}
        else named_struct('mode', 0L, 'field', 0L, 'val', 0L,
          'shift', 0L, {all_fs}) end
      end
    """
    init = (
        "named_struct('mode', 0L, 'field', 0L, 'val', 0L, 'shift', 0L, "
        + ", ".join(
            f"'f{i}', cast(null as bigint)"
            for i in range(1, n_fields + 1)
        )
        + ")"
    )
    dec = F.expr(
        f"aggregate(transform(sequence(1, octet_length({bin_col})),"
        f" i -> cast(conv(hex(substr({bin_col}, i, 1)), 16, 10) as bigint)),"
        f" {init}, {lam})"
    )
    out = df.withColumn("_pb", dec)
    for i in range(1, n_fields + 1):
        out = out.withColumn(f"pb_f{i}", F.col("_pb").getField(f"f{i}"))
    return out.drop("_pb")


def proto_varint_encode(
    df: DataFrame,
    field_cols: list[str],
    out_col: str = "pb_bytes",
) -> DataFrame:
    """Encode long columns as a protobuf varint message — no UDF.

    The inverse of :func:`proto_varint_decode`: field ``i`` (1-based,
    from ``field_cols`` order) becomes tag byte ``i*8`` (wire type 0)
    followed by the little-endian 7-bit groups of the value with
    continuation bits.  NULL fields are omitted (proto3 absent-field
    semantics).  Values must be non-negative longs.

    Byte count per varint is computed with exact integer arithmetic
    (count of non-zero 7-bit groups), never float log — boundary values
    like 2^56 encode correctly.  Everything runs as Catalyst
    expressions inside whole-stage codegen: at 10^12 rows this is a
    pure map stage, zero exchanges, no Python workers.
    """
    pieces = []
    for i, c in enumerate(field_cols, start=1):
        nb = (
            f"size(filter(sequence(0, 9),"
            f" k -> k = 0 or shiftright({c}, 7 * k) > 0))"
        )
        body = (
            f"aggregate(transform(sequence(0, {nb} - 1),"
            f" k -> if(k < {nb} - 1,"
            f" 128 + pmod(shiftright({c}, 7 * k), 128),"
            f" pmod(shiftright({c}, 7 * k), 128))),"
            f" cast('' as binary),"
            f" (acc, b) -> concat(acc, unhex(lpad(hex(b), 2, '0'))))"
        )
        pieces.append(
            f"if({c} is null, cast('' as binary),"
            f" concat(unhex(lpad(hex({i * 8}), 2, '0')), {body}))"
        )
    return df.withColumn(out_col, F.expr("concat(" + ", ".join(pieces) + ")"))
