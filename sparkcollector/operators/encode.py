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
