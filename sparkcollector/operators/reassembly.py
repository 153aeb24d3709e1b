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
