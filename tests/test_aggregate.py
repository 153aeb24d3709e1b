"""Count/sum connector analogs + salted aggregation equivalence
(components.go:344/348 behaviors; SURVEY.md §2.6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcollector.aggregate import conv_bucket, count_connector, sum_connector
from sparkcollector.parse import parse_turns
from sparkcollector.route import route
from sparkcollector.skew import salted_count


def test_count_connector_total_matches_input(turns_df):
    routed = route(parse_turns(turns_df))
    agg = count_connector(routed)
    total = agg.agg(F.sum("n").alias("t")).collect()[0]["t"]
    assert total == turns_df.count()
    assert set(agg.columns) == {"sink", "conv_bucket", "role", "tool", "window_start", "n"}


def test_conv_bucket_deterministic_and_bounded(turns_df):
    b = turns_df.select(conv_bucket().alias("b")).distinct().collect()
    vals = {r["b"] for r in b}
    assert vals <= set(range(16))
    # stable across evaluations
    b2 = {r["b"] for r in turns_df.select(conv_bucket().alias("b")).distinct().collect()}
    assert vals == b2


def test_salted_count_equals_plain_groupby(turns_df):
    plain = {
        (r["role"], r["tool"]): r["n"]
        for r in turns_df.groupBy("role", "tool").agg(F.count("*").alias("n")).collect()
    }
    salted = {
        (r["role"], r["tool"]): r["n"]
        for r in salted_count(turns_df, ["role", "tool"], n_salts=8).collect()
    }
    assert plain == salted


def test_sum_connector(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.5), ("b", 4.0)], ["k", "v"]
    )
    got = {r["k"]: r["total"] for r in sum_connector(df, "v", ["k"]).collect()}
    assert got == {"a": 3.5, "b": 4.0}


def test_count_conditions_single_pass(spark):
    from pyspark.sql import functions as F

    from sparkcollector.aggregate import count_conditions

    df = spark.createDataFrame(
        [("a", 1, None), ("a", 200, "p"), ("b", 150, "p")],
        "grp string, value int, props string",
    )
    got = {
        r["grp"]: (r["big"], r["with_props"], r["total"])
        for r in count_conditions(
            df,
            {"big": "value > 100", "with_props": "props is not null",
             "total": "true"},
            keys=["grp"],
        ).collect()
    }
    assert got == {"a": (1, 1, 2), "b": (1, 1, 1)}
    # one pass: a single aggregate, no per-metric scan/union
    plan = count_conditions(
        df, {"big": "value > 100"}, keys=["grp"]
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("aggregate") <= 2  # partial + final


def test_session_window_counts_gap_merge(spark):
    import datetime as dt

    from sparkcollector.aggregate import session_window_counts

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("u1", t0),
        ("u1", t0 + dt.timedelta(minutes=10)),   # within gap: same session
        ("u1", t0 + dt.timedelta(minutes=50)),   # 40min after last: new
        ("u2", t0),
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp")
    out = session_window_counts(df, ["user"], "ts", gap="30 minutes")
    got = {
        (r["user"], r["session_start"]): r["n_events"] for r in out.collect()
    }
    assert got == {
        ("u1", t0): 2,
        ("u1", t0 + dt.timedelta(minutes=50)): 1,
        ("u2", t0): 1,
    }


def test_session_window_boundary_semantics(spark):
    import datetime as dt

    from sparkcollector.aggregate import session_window_counts

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # Spark's native session window treats the gap as a CLOSED boundary:
    # an event at exactly last_ts+gap still merges; one second past it
    # starts a new session.  (The oracle in queries.py mirrors this with
    # a strict `>` new-session test.)
    df = spark.createDataFrame(
        [("u", t0), ("u", t0 + dt.timedelta(minutes=30))],
        "user string, ts timestamp",
    )
    out = session_window_counts(df, ["user"], "ts", gap="30 minutes")
    assert out.count() == 1

    df2 = spark.createDataFrame(
        [("u", t0), ("u", t0 + dt.timedelta(minutes=30, seconds=1))],
        "user string, ts timestamp",
    )
    out2 = session_window_counts(df2, ["user"], "ts", gap="30 minutes")
    assert out2.count() == 2


def test_time_rollup_pyramid_levels_consistent(spark):
    import datetime as dt

    from sparkcollector.aggregate import time_rollup_pyramid

    t0 = dt.datetime(2024, 1, 1, 10, 0, 30)
    rows = [
        ("a", t0, 1.0),
        ("a", t0 + dt.timedelta(minutes=1), 2.0),
        ("a", t0 + dt.timedelta(hours=2), 4.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = time_rollup_pyramid(df, "ts", "v", ["k"]).collect()
    by = {(r["resolution"], r["bucket_ts"]): r for r in out}
    # three minute rows, two hour rows, one day row
    assert sum(1 for r in out if r["resolution"] == "minute") == 3
    assert sum(1 for r in out if r["resolution"] == "hour") == 2
    assert sum(1 for r in out if r["resolution"] == "day") == 1
    day = next(r for r in out if r["resolution"] == "day")
    assert day["n"] == 3 and day["total"] == 7.0
    assert day["vmin"] == 1.0 and day["vmax"] == 4.0
    h10 = by[("hour", dt.datetime(2024, 1, 1, 10))]
    assert h10["n"] == 2 and h10["total"] == 3.0


def test_partial_agg_merge_equals_direct(spark):
    from pyspark.sql import functions as F

    from sparkcollector.aggregate import merge_partial_aggs, partial_agg

    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate([1, 5, 2, 8, 3, 9])],
        "grp string, i long, value double",
    )
    a = partial_agg(df.filter(F.col("i") < 3), ["grp"], "value")
    b = partial_agg(df.filter(F.col("i") >= 3), ["grp"], "value")
    m = merge_partial_aggs([a, b], ["grp"]).collect()[0]
    assert (m["n"], m["total"], m["vmin"], m["vmax"]) == (6, 28.0, 1.0, 9.0)
    assert abs(m["avg"] - 28.0 / 6) < 1e-6


def test_time_rollup_pyramid_null_ts_keeps_resolution(spark):
    import datetime as dt

    from sparkcollector.aggregate import time_rollup_pyramid

    # a NULL input ts makes EVERY trunc column NULL; resolution must
    # come from the grouping_id indicators, so the NULL-ts row appears
    # at each level with bucket_ts NULL instead of silently claiming a
    # coarser resolution (the coalesce-on-truncs regression)
    t0 = dt.datetime(2024, 1, 1, 10, 0, 30)
    rows = [("a", t0, 1.0), ("a", None, 5.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = time_rollup_pyramid(df, "ts", "v", ["k"]).collect()
    assert len(out) == 6  # (valid + NULL bucket) x 3 levels
    for lv in ("minute", "hour", "day"):
        lvl = [r for r in out if r["resolution"] == lv]
        assert len(lvl) == 2, f"{lv}: NULL-ts bucket missing"
        nullb = next(r for r in lvl if r["bucket_ts"] is None)
        assert nullb["n"] == 1 and nullb["total"] == 5.0
        valid = next(r for r in lvl if r["bucket_ts"] is not None)
        assert valid["n"] == 1 and valid["total"] == 1.0
