"""Multiline record reassembly (the stanza ``multiline`` operator).

The reference's filelog receiver reassembles multi-line records with a
``line_start_pattern`` regex: a line matching the pattern starts a new
record; following non-matching lines are appended to it
(cmd/otelcol/config/collector/splunk_logs_config_linux.yaml:89-90,
246-247).

Spark-first: within each file partition, ordered by byte/line offset,
a record id is the RUNNING COUNT of start-matches (window sum), then
lines group-concat by (file, record id).  One shuffle on the file key;
ordering comes from the offset column, never task scheduling.  Lines
before the first start-match form record 0 (partial head record),
mirroring the stanza recombine operator's behavior of emitting the
leading fragment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def reassemble_multiline(
    lines: DataFrame,
    line_start_pattern: str,
    file_col: str = "file",
    offset_col: str = "offset",
    line_col: str = "line",
    joiner: str = "\n",
) -> DataFrame:
    """Group lines into records by a start-pattern regex.

    Output: (file, record_id, n_lines, record) with ``record`` the
    joined lines in offset order.
    """
    is_start = F.col(line_col).rlike(line_start_pattern).cast("int")
    w = (
        Window.partitionBy(file_col)
        .orderBy(offset_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = lines.withColumn("record_id", F.sum(is_start).over(w))
    return (
        tagged.groupBy(file_col, "record_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col(offset_col).alias("o"), F.col(line_col).alias("l"))
                        )
                    ),
                    lambda s: s["l"],
                ),
                joiner,
            ).alias("record"),
        )
    )


def stacktrace_group(
    df: DataFrame,
    text_col: str,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Sentry-style Java stack-trace grouping over multiline records.

    The collector ships JVM exception traces as one multiline log
    record (the reassembly step upstream of this, reference: stanza
    ``recombine`` semantics / splunk_logs_config_linux.yaml multiline
    blocks); the classic downstream ask is GROUPING: which distinct
    failures are these?  Two traces are the same failure when the
    exception class and the frame *signatures* agree — line numbers
    must NOT discriminate (a redeploy shifts every line number).

    Extraction is pure Catalyst: ``regexp_extract`` for the header
    exception class/message, ``regexp_extract_all`` for the ``at ``
    frames with the ``:NNN)`` suffix normalized to ``)``, the last
    ``Caused by:`` chain element as root cause.  The fingerprint is
    ``md5(exception_class | frame;frame;...)`` — identical traces from
    different line numbers collide, different call paths do not.

    Adds columns: ``exc_class``, ``exc_msg``, ``root_cause``,
    ``top_frame`` (normalized), ``fingerprint``.  A 10^12-row scan
    stays a pure map stage; the usual rollup afterwards groups on a
    bounded fingerprint set.
    """
    t = F.col(text_col)
    exc = F.regexp_extract(t, r"^([\w.$]+(?:Exception|Error))(?::|\n|$)", 1)
    msg = F.regexp_extract(t, r"^[\w.$]+(?:Exception|Error): ([^\n]*)", 1)
    frames = F.expr(
        f"transform(regexp_extract_all({text_col},"
        r" '\\tat ([^\\n]+)', 1),"
        " f -> regexp_replace(f, ':\\\\d+\\\\)$', ')'))"
    )
    # last Caused-by = the root cause: final element of all matches
    # (no variable-length lookbehind needed).  try_element_at: ANSI
    # mode is on and no-match yields an EMPTY array, not NULL.
    root = F.expr(
        f"try_element_at(regexp_extract_all({text_col},"
        r" 'Caused by: ([\\w.$]+(?:Exception|Error))', 1), -1)"
    )
    out = df.withColumn("exc_class", F.when(exc != "", exc)).withColumn(
        "exc_msg", F.when(exc != "", msg)
    )
    out = out.withColumn("_frames", frames)
    out = out.withColumn(
        "root_cause", F.coalesce(root, F.col("exc_class"))
    )
    out = out.withColumn(
        "top_frame", F.try_element_at(F.col("_frames"), F.lit(1))
    ).withColumn(
        "fingerprint",
        F.when(
            F.col("exc_class").isNotNull(),
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("exc_class"),
                    F.array_join(F.col("_frames"), ";"),
                )
            ),
        ),
    )
    return out.drop("_frames")
