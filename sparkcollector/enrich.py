"""Enrichment: broadcast lookup joins on ``role`` and ``tool``.

The reference enriches every record with constant/extra dimensions held
in small in-memory maps — receiver extra dimensions win over datapoint
dims (reference: pkg/receiver/smartagentreceiver/output.go:256-259,
317-320), resource detection stamps host/cloud attrs
(agent_config.yaml:135-137), and k8s attributes are a metadata join.

Spark-first equivalent (SURVEY.md §2.5): keep the lookup tables tiny
and **broadcast** them, so the join is map-side with zero shuffle on
the 100 TB fact side.  The dimension-update side channel
(dimension.go:29-60, SCD upserts) is modeled by
:func:`apply_dim_updates`, the MERGE-INTO analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# FIXTURES.md §2/§3 lookup contents (deterministic fixtures).
ROLE_ATTRS = [
    ("user", "human", 1, "product"),
    ("assistant", "model", 2, "inference"),
    ("system", "orchestrator", 3, "platform"),
    ("tool", "plugin", 0, "plugins"),
]
ROLE_ATTRS_COLS = ["role", "actor_kind", "priority", "team"]

TOOL_ATTRS = [
    ("bash", "exec", "high"),
    ("read", "fs", "low"),
    ("write", "fs", "medium"),
    ("search", "net", "medium"),
    ("none", "noop", "low"),
]
TOOL_ATTRS_COLS = ["tool", "tool_category", "risk_level"]


def role_attrs_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ROLE_ATTRS, ROLE_ATTRS_COLS)


def tool_attrs_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(TOOL_ATTRS, TOOL_ATTRS_COLS)


def enrich_turns(
    df: DataFrame,
    role_attrs: DataFrame | None = None,
    tool_attrs: DataFrame | None = None,
) -> DataFrame:
    """Broadcast-join role and tool dimension attributes onto turns.

    Left joins: an unknown role/tool yields NULL attrs rather than
    dropping the row (the collector never drops on missing metadata).
    """
    spark = df.sparkSession
    role_attrs = role_attrs if role_attrs is not None else role_attrs_df(spark)
    tool_attrs = tool_attrs if tool_attrs is not None else tool_attrs_df(spark)
    return df.join(F.broadcast(role_attrs), "role", "left").join(
        F.broadcast(tool_attrs), "tool", "left"
    )


def apply_dim_updates(dims: DataFrame, updates: DataFrame) -> DataFrame:
    """SCD-style dimension maintenance (MERGE INTO analog).

    ``updates`` rows are ``(key_cols..., property, value)`` deltas in
    the reference's dimension-update shape
    (pkg/receiver/smartagentreceiver/dimension.go:29-60): a non-NULL
    value upserts the property; a NULL value removes it (resets to
    NULL).  ``dims`` is wide (one column per property); the last update
    per (key, property) wins, keyed by an ``seq`` ordering column.

    Pure DataFrame implementation: pivot the deltas to wide form, left
    join on the key, and coalesce update-over-current per property —
    which is exactly what an Iceberg ``MERGE INTO ... WHEN MATCHED
    UPDATE`` compiles to, minus the copy-on-write file plumbing.
    """
    key = dims.columns[0]
    props = [c for c in dims.columns if c != key]

    w_last = (
        updates.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(key, "property").orderBy(F.col("seq").desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn", "seq")
    )
    wide = (
        w_last.groupBy(key)
        .pivot("property", props)
        .agg(F.first("value"))
    )
    # track which properties were touched (NULL value could mean remove)
    touched = (
        w_last.groupBy(key)
        .agg(F.collect_set("property").alias("_touched"))
    )
    wide = wide.join(touched, key, "inner")

    joined = dims.alias("d").join(F.broadcast(wide.alias("u")), key, "left")
    out_cols = [F.col(f"d.{key}").alias(key)]
    for p in props:
        out_cols.append(
            F.when(
                F.array_contains(F.coalesce(F.col("u._touched"), F.array()), p),
                F.col(f"u.{p}"),
            )
            .otherwise(F.col(f"d.{p}"))
            .alias(p)
        )
    return joined.select(*out_cols)
