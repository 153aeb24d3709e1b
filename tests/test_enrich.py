"""Broadcast enrichment + SCD dimension-update semantics
(pkg/receiver/smartagentreceiver/output.go:256-259, dimension.go:29-60
behaviors, re-expressed as broadcast joins / MERGE-INTO analog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcollector.enrich import apply_dim_updates, enrich_turns


def test_enrich_preserves_rows_and_adds_attrs(turns_df):
    out = enrich_turns(turns_df)
    assert out.count() == turns_df.count()
    for c in ("actor_kind", "priority", "team", "tool_category", "risk_level"):
        assert c in out.columns
    # every synth role/tool is in the lookup tables -> no NULL attrs
    assert out.filter(F.col("actor_kind").isNull()).count() == 0
    assert out.filter(F.col("tool_category").isNull()).count() == 0


def test_enrich_unknown_key_left_join(spark):
    df = spark.createDataFrame(
        [("c", 0, "alien", "t", "laser")], ["conv_id", "turn_idx", "role", "text", "tool"]
    ).withColumn("ts", F.current_timestamp())
    r = enrich_turns(df).collect()[0]
    assert r["actor_kind"] is None and r["tool_category"] is None


def test_enrich_plan_is_broadcast(turns_df):
    plan = enrich_turns(turns_df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_apply_dim_updates_upsert_remove_last_wins(spark):
    dims = spark.createDataFrame(
        [("web", "t1", "alice"), ("db", "t2", "bob")],
        ["svc", "tier", "owner"],
    )
    updates = spark.createDataFrame(
        [
            ("web", "owner", "carol", 1),   # upsert
            ("web", "owner", "dave", 2),    # last wins
            ("db", "tier", None, 1),        # remove -> NULL
        ],
        ["svc", "property", "value", "seq"],
    )
    out = {r["svc"]: r for r in apply_dim_updates(dims, updates).collect()}
    assert out["web"]["owner"] == "dave" and out["web"]["tier"] == "t1"
    assert out["db"]["tier"] is None and out["db"]["owner"] == "bob"
