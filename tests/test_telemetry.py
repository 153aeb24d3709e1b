"""Telemetry processor semantics (SURVEY.md §2.4-§2.6 behaviors)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcollector.operators.telemetry import (
    AttrAction,
    TailPolicy,
    attributes_processor,
    cpu_utilization,
    group_by_attrs,
    histogram_bucket_delta,
    invalid_value_audit,
    metrics_transform,
    probabilistic_sample,
    redact,
    sample_bucket,
    tail_sample,
)


def test_histogram_bucket_delta(spark):
    df = spark.createDataFrame([("m", [1, 4, 9, 9, 12])], ["k", "cum_buckets"])
    r = histogram_bucket_delta(df).collect()[0]
    # last (+Inf) bucket dropped, like scraper.go:218-235
    assert r["bucket_counts"] == [1, 3, 5, 0]


def test_cpu_utilization_clamp_and_first_sample(spark):
    rows = [
        ("h", 1, 10.0, 100.0),
        ("h", 2, 60.0, 200.0),   # 50/100 -> 50%
        ("h", 3, 55.0, 300.0),   # negative delta -> clamp 0
        ("h", 4, 500.0, 400.0),  # 445/100 -> clamp 100
    ]
    df = spark.createDataFrame(rows, ["host", "t", "used", "total"])
    out = {r["t"]: r["utilization"] for r in cpu_utilization(df, ["host"], "used", "total", ["t"]).collect()}
    assert out[1] is None
    assert out[2] == 50.0 and out[3] == 0.0 and out[4] == 100.0


def test_probabilistic_sample_consistent(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], ["k"])
    a = {r["k"] for r in probabilistic_sample(df, "k", 30).collect()}
    b = {r["k"] for r in probabilistic_sample(df, "k", 30).collect()}
    assert a == b  # same keys always kept
    assert 0.2 < len(a) / 1000 < 0.4
    # smaller percent is a subset of larger (bucket < p is monotone)
    c = {r["k"] for r in probabilistic_sample(df, "k", 10).collect()}
    assert c <= a


def test_sample_bucket_matches_python_md5(spark):
    import hashlib

    df = spark.createDataFrame([("abc",), ("xyz",)], ["k"])
    got = {r["k"]: r["b"] for r in df.select("k", sample_bucket(F.col("k")).alias("b")).collect()}
    for k in ("abc", "xyz"):
        assert got[k] == int(hashlib.md5(k.encode()).hexdigest()[:8], 16) % 100


def test_tail_sample_any_keeps_whole_trace(spark):
    rows = [("t1", 1, "ok"), ("t1", 2, "ERROR"), ("t2", 1, "ok")]
    df = spark.createDataFrame(rows, ["trace", "i", "status"])
    kept = tail_sample(df, "trace", TailPolicy("status = 'ERROR'", "any"))
    assert {(r["trace"], r["i"]) for r in kept.collect()} == {("t1", 1), ("t1", 2)}


def test_metrics_transform_rename_and_merge(spark):
    rows = [("a", "x", 1.0), ("b", "x", 2.0), ("c", "x", 4.0)]
    df = spark.createDataFrame(rows, ["name", "lbl", "v"])
    out = metrics_transform(
        df, "name", "v", renames={"a": "b"}, aggregation="sum"
    )
    got = {r["name"]: r["v"] for r in out.collect()}
    assert got == {"b": 3.0, "c": 4.0}


def test_attributes_processor_actions(spark):
    df = spark.createDataFrame([("id=42 user=bob", "secret")], ["body", "token"])
    out = attributes_processor(
        df,
        [
            AttrAction("extract", "body", pattern=r"id=(\d+) user=(\w+)", groups=("rid", "user")),
            AttrAction("hash", "token"),
            AttrAction("upsert", "env", value="prod"),
            AttrAction("delete", "body"),
        ],
    )
    r = out.collect()[0]
    assert r["rid"] == "42" and r["user"] == "bob" and r["env"] == "prod"
    assert len(r["token"]) == 64 and "body" not in out.columns


def test_group_by_attrs_sorted(spark):
    df = spark.createDataFrame([("a", 3), ("a", 1), ("b", 2)], ["k", "v"])
    out = {r["k"]: r for r in group_by_attrs(df, ["k"], ["v"]).collect()}
    assert [x["v"] for x in out["a"]["records"]] == [1, 3]
    assert out["a"]["n_records"] == 2


def test_redact(spark):
    df = spark.createDataFrame([("e1", "pin 1234", "drop-me")], ["id", "msg", "secret"])
    out = redact(df, ["id", "msg"], ["msg"])
    r = out.collect()[0]
    assert r["msg"] == "pin ****" and "secret" not in out.columns


def test_invalid_value_audit(spark):
    rows = [("g", "1.5"), ("g", "nope"), ("g", None), ("h", "2")]
    df = spark.createDataFrame(rows, ["grp", "raw"])
    out = {r["grp"]: r for r in invalid_value_audit(df, "raw", ["grp"]).collect()}
    assert out["g"]["n_valid"] == 1 and out["g"]["n_invalid"] == 2
    assert out["g"]["valid_sum"] == 1.5 and out["h"]["n_valid"] == 1


def test_metrics_generation_rules(spark):
    from sparkcollector.operators.telemetry import metrics_generation

    df = spark.createDataFrame(
        [
            (1, "mem.used", 50.0), (1, "mem.limit", 200.0),
            (2, "mem.used", 30.0), (2, "mem.limit", 0.0),   # div-by-zero
            (3, "mem.used", 10.0),                           # missing pair
        ],
        ["host", "metric", "value"],
    )
    rules = [
        {"name": "mem.utilization", "type": "calculate",
         "metric1": "mem.used", "metric2": "mem.limit",
         "operation": "percent"},
        {"name": "mem.used.kb", "type": "scale",
         "metric1": "mem.used", "scale_by": 0.5},
    ]
    out = {
        (r["host"], r["metric"]): r["value"]
        for r in metrics_generation(df, rules, group_cols=["host"]).collect()
    }
    assert out[(1, "mem.utilization")] == 25.0
    assert (2, "mem.utilization") not in out       # zero divisor dropped
    assert (3, "mem.utilization") not in out       # missing operand dropped
    assert out[(1, "mem.used.kb")] == 25.0
    assert out[(2, "mem.used.kb")] == 15.0
    assert out[(3, "mem.used.kb")] == 5.0


def test_trace_batch_by_ip_batches(spark):
    from sparkcollector.operators.telemetry import trace_batch_by_ip

    df = spark.createDataFrame(
        [
            ("1.1.1.1", 20, "GET /a"),
            ("1.1.1.1", 10, "POST /B"),
            ("2.2.2.2", 5, "Q"),
        ],
        ["source_ip", "span_id", "name"],
    )
    out = {r["span_id"]: r for r in trace_batch_by_ip(df).collect()}
    # spans from different IPs never share a batch; batch_index is the
    # span's position sorted by span_id within its batch
    assert out[10]["batch_size"] == 2 and out[10]["batch_index"] == 0
    assert out[20]["batch_size"] == 2 and out[20]["batch_index"] == 1
    assert out[5]["batch_size"] == 1 and out[5]["batch_index"] == 0
    assert out[10]["translated_name"] == "1.1.1.1/post /b"


def test_drop_monitor_id_dim(spark):
    """converter/metrics.go:77-84: delete dims.monitorID iff it equals
    meta.monitorID; unset meta or differing values leave dims alone."""
    from pyspark.sql import functions as F

    from sparkcollector.operators.telemetry import drop_monitor_id_dim

    rows = [
        ("dup", {"monitorID": "m1", "k": "v"}, {"monitorID": "m1"}),
        ("diff", {"monitorID": "m1"}, {"monitorID": "m2"}),
        ("nometa", {"monitorID": "m1"}, {}),
        ("nodim", {"k": "v"}, {"monitorID": "m1"}),
    ]
    df = spark.createDataFrame(
        rows, "id string, dims map<string,string>, meta map<string,string>"
    )
    out = {
        r["id"]: r["d"]
        for r in drop_monitor_id_dim(df)
        .select("id", F.col("dims").alias("d"))
        .collect()
    }
    assert out["dup"] == {"k": "v"}
    assert out["diff"] == {"monitorID": "m1"}
    assert out["nometa"] == {"monitorID": "m1"}
    assert out["nodim"] == {"k": "v"}


def test_latency_percentiles_exact_and_sketch(spark):
    from sparkcollector.operators.telemetry import latency_percentiles

    rows = [("a", float(v)) for v in range(1, 101)] + [("b", 5.0), ("b", 15.0)]
    df = spark.createDataFrame(rows, "svc string, lat double")
    out = {
        r["svc"]: r
        for r in latency_percentiles(df, "lat", ["svc"]).collect()
    }
    # group a = 1..100: interpolated p50 = 50.5, p95 = 95.05, p99 = 99.01
    assert out["a"]["calls"] == 100
    assert out["a"]["p5"] == 50.5
    assert out["a"]["p95"] == 95.05
    assert out["a"]["p99"] == 99.01
    # two-point group: p50 interpolates the midpoint
    assert out["b"]["p5"] == 10.0
    sk = {
        r["svc"]: r
        for r in latency_percentiles(df, "lat", ["svc"], approx=True).collect()
    }
    # the sketch lands on an observed value near the exact rank
    assert abs(sk["a"]["p5"] - 50.5) <= 2
    assert abs(sk["a"]["p95"] - 95.05) <= 2


def test_transform_attrs_ottl_family(spark):
    from pyspark.sql import functions as F

    from sparkcollector.operators.telemetry import transform_attrs

    df = spark.createDataFrame(
        [(1,)], "id int"
    ).select(
        "id",
        F.create_map(
            F.lit("service"), F.lit("checkout-7731"),
            F.lit("debug_blob"), F.lit("x" * 50),
            F.lit("zone"), F.lit("eu-west-42"),
            F.lit("user"), F.lit("u9"),
        ).alias("m"),
    )
    out = df.select(
        transform_attrs(
            F.col("m"),
            keep_keys=["service", "zone", "user"],
            replace_pattern=(r"\d+", "#"),
            truncate_to=8,
            limit_to=2,
        ).alias("m")
    ).collect()[0]["m"]
    # keep_keys drops debug_blob; digits masked; truncated to 8 chars;
    # limit keeps the 2 smallest keys (service, user) deterministically
    assert out == {"service": "checkout", "user": "u#"}


def test_tail_sampling_policies_first_match_and_prob(spark):
    from pyspark.sql import functions as F

    from sparkcollector.operators.telemetry import (
        sample_bucket,
        tail_sampling_policies,
    )

    rows = [
        ("t1", "ok", 5), ("t1", "ERROR boom", 6),   # errors policy
        ("t2", "ok", 30),                            # long policy
        ("t3", "ERROR and", 40),                     # errors wins (ordered)
        ("t4", "ok", 1),                             # probabilistic only
    ]
    df = spark.createDataFrame(rows, "trace string, text string, turn int")
    got = {
        r["trace"]: r["sampled_by"]
        for r in tail_sampling_policies(
            df,
            "trace",
            [("errors", "text like '%ERROR%'", "any"),
             ("long", "turn >= 20", "any")],
            prob_percent=100,
        ).collect()
    }
    assert got["t1"] == "errors"
    assert got["t2"] == "long"
    assert got["t3"] == "errors"  # first match wins over 'long'
    assert got["t4"] == "probabilistic"  # 100% fallback
    # with the fallback off, t4 is dropped entirely
    got2 = {
        r["trace"]
        for r in tail_sampling_policies(
            df, "trace", [("errors", "text like '%ERROR%'", "any")]
        ).collect()
    }
    assert got2 == {"t1", "t3"}
    # the probabilistic bucket is the portable md5 bucket
    b = df.select(sample_bucket(F.col("trace")).alias("b")).first()["b"]
    assert 0 <= b < 100


def test_duration_histogram_cumulative_and_null(spark):
    from sparkcollector.operators.telemetry import duration_histogram

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 30.0), ("a", 200.0), ("a", None), ("b", 25.0)],
        "svc string, dur double",
    )
    got = {
        (r["svc"], r["le"]): r["n"]
        for r in duration_histogram(df, "dur", [25.0, 50.0], ["svc"]).collect()
    }
    # cumulative: le=50 includes le=25's values; NULL only in +Inf
    assert got == {
        ("a", "25.0"): 1, ("a", "50.0"): 2, ("a", "+Inf"): 4,
        ("b", "25.0"): 1, ("b", "50.0"): 1, ("b", "+Inf"): 1,
    }


def test_span_processor_both_directions(spark):
    from pyspark.sql import functions as F

    from sparkcollector.operators.telemetry import (
        span_from_attributes,
        span_to_attributes,
    )

    df = spark.createDataFrame(
        [("GET /user/123/orders",), ("GET /health",)], "span_name string"
    )
    t = span_to_attributes(
        df, [("user_id", r"/user/([0-9]+)/", "/user/{user_id}/")]
    )
    got = {r["span_name"]: r["user_id"] for r in t.collect()}
    # matched: group extracted, context preserved around the template
    assert got["GET /user/{user_id}/orders"] == "123"
    # unmatched: name untouched, attribute NULL
    assert got["GET /health"] is None
    # from_attributes: missing attribute keeps the original name
    f = span_from_attributes(
        t.withColumn("verb", F.lit("GET")),
        keys=["verb", "user_id"],
        separator=" ",
    )
    names = sorted(r["span_name"] for r in f.collect())
    assert names == ["GET /health", "GET 123"]


def test_count_min_overestimates_never_under(spark):
    from pyspark.sql import functions as F

    from sparkcollector.operators.telemetry import cm_estimate, count_min_sketch

    # zipf-ish: item i appears (50 - i) times
    rows = [(f"item{i}",) for i in range(40) for _ in range(50 - i)]
    df = spark.createDataFrame(rows, "item string")
    sketch = count_min_sketch(df, "item", depth=4, width=64)
    # sketch is fixed-size regardless of cardinality
    assert sketch.count() <= 4 * 64
    est = cm_estimate(sketch, df.distinct(), "item", depth=4, width=64)
    exact = df.groupBy("item").agg(F.count("*").alias("n"))
    joined = est.join(exact, "item").collect()
    assert all(r["cm_count"] >= r["n"] for r in joined)
    # with 40 items in 64 buckets x 4 rows, the heavy hitter estimate
    # is close: min-row collision mass is bounded
    top = {r["item"]: r["cm_count"] for r in joined}["item0"]
    assert 50 <= top <= 50 + 49  # at worst one full collision chain


def test_rate_anomaly_z_flags_burst(spark):
    import datetime as dt

    from sparkcollector.operators.telemetry import rate_anomaly_scores

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # minutes 0..9: steady 2 errors/min with slight jitter; minute 10: 30
    for m in range(10):
        k = 2 + (m % 2)
        for i in range(k):
            rows.append((t0 + dt.timedelta(minutes=m, seconds=i),))
    for i in range(30):
        rows.append((t0 + dt.timedelta(minutes=10, seconds=i),))
    df = spark.createDataFrame(rows, "ts timestamp")
    out = {
        r["minute_idx"]: r
        for r in rate_anomaly_scores(df, trailing_min=60).collect()
    }
    base = int(t0.timestamp() // 60)
    burst = out[base + 10]
    assert burst["n"] == 30
    assert burst["baseline_mean"] == 2.5
    assert burst["z"] is not None and burst["z"] > 10
    # the first minute has no trailing baseline
    assert out[base]["z"] is None


def test_m4_downsample_min_max_first_last(spark):
    import datetime as dt

    from sparkcollector.operators.telemetry import m4_downsample

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(minutes=1), 5.0),
        (2, t0 + dt.timedelta(minutes=30), 1.0),
        (3, t0 + dt.timedelta(minutes=59), 9.0),
        (4, t0 + dt.timedelta(minutes=70), 2.0),  # next bucket
    ]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, value double")
    got = {
        r["bucket_idx"]: r
        for r in m4_downsample(df, order_col="event_id", bucket_sec=3600).collect()
    }
    b0 = int(t0.timestamp() // 3600)
    r = got[b0]
    assert (r["n"], r["v_min"], r["v_max"], r["v_first"], r["v_last"]) == (
        3, 1.0, 9.0, 5.0, 9.0,
    )
    assert got[b0 + 1]["v_first"] == 2.0


def test_fill_time_gaps_zero_and_locf(spark):
    import datetime as dt

    from sparkcollector.operators.telemetry import fill_time_gaps

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t0, 3), ("a", t0 + dt.timedelta(minutes=3), 7),
        ("b", t0, 1),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, n bigint")
    base = int(t0.timestamp() // 60)
    zero = {
        (r["k"], r["bucket_idx"]): r["n"]
        for r in fill_time_gaps(df, key_col="k", fill="zero").collect()
    }
    # a spans 4 minutes with the middle two zero-filled; b has one row
    assert zero == {
        ("a", base): 3, ("a", base + 1): 0, ("a", base + 2): 0,
        ("a", base + 3): 7, ("b", base): 1,
    }
    locf = {
        (r["k"], r["bucket_idx"]): r["n"]
        for r in fill_time_gaps(df, key_col="k", fill="locf").collect()
    }
    assert locf[("a", base + 1)] == 3 and locf[("a", base + 2)] == 3


def test_batch_split_packing(spark):
    from sparkcollector.operators.telemetry import batch_split

    rows = [("k", i) for i in range(7)] + [("j", 0)]
    df = spark.createDataFrame(rows, "k string, i int")
    got = {
        (r["k"], r["i"]): (r["batch_id"], r["batch_pos"])
        for r in batch_split(df, "k", "i", max_batch=3).collect()
    }
    assert got[("k", 0)] == (0, 0) and got[("k", 2)] == (0, 2)
    assert got[("k", 3)] == (1, 0) and got[("k", 6)] == (2, 0)
    assert got[("j", 0)] == (0, 0)


def test_schema_expectations_null_counts_as_violation(spark):
    from sparkcollector.operators.telemetry import schema_expectations

    df = spark.createDataFrame(
        [(1.0,), (None,), (2000.0,)], "value double"
    )
    (r,) = schema_expectations(
        df, {"in_range": "value between 0 and 1000"}
    ).collect()
    # NULL predicate (row 2) AND out-of-range (row 3) both violate
    assert (r["rule"], r["violations"], r["total"]) == ("in_range", 2, 3)
    assert r["violation_rate"] == round(2 / 3, 6)


def test_tail_policies_null_predicate_not_matching(spark):
    from sparkcollector.operators.telemetry import (
        TailPolicy,
        tail_sample,
        tail_sampling_policies,
    )

    df = spark.createDataFrame(
        [("t1", None), ("t1", "x"), ("t2", "x"), ("t2", "x")],
        "trace string, attr string",
    )
    # 'all' mode: the NULL row must fail the policy, not be skipped
    got = {
        r["trace"]
        for r in tail_sampling_policies(
            df, "trace", [("p", "attr = 'x'", "all")]
        ).collect()
    }
    assert got == {"t2"}
    kept = tail_sample(df, "trace", TailPolicy("attr = 'x'", "all"))
    assert {r["trace"] for r in kept.collect()} == {"t2"}


def test_delta_to_cumulative_running_sum(spark):
    from sparkcollector.operators.telemetry import delta_to_cumulative

    df = spark.createDataFrame(
        [
            ("a", 1, 1.5),
            ("a", 2, 2.5),
            ("a", 3, -1.0),
            ("b", 1, 10.0),
        ],
        "series string, t int, value double",
    )
    got = {
        (r["series"], r["t"]): float(r["cumulative"])
        for r in delta_to_cumulative(df, ["series"], "value", "t").collect()
    }
    assert got == {
        ("a", 1): 1.5,
        ("a", 2): 4.0,
        ("a", 3): 3.0,
        ("b", 1): 10.0,
    }


def test_log_dedup_collapses_within_interval(spark):
    import datetime as dt

    from sparkcollector.operators.telemetry import log_dedup

    t0 = dt.datetime(2024, 1, 1, 0, 0, 10)
    rows = [
        ("disk full", t0),
        ("disk full", t0 + dt.timedelta(seconds=30)),
        ("disk full", t0 + dt.timedelta(minutes=2)),  # next window
        ("oom", t0 + dt.timedelta(seconds=5)),
    ]
    df = spark.createDataFrame(rows, "body string, ts timestamp")
    out = log_dedup(df, "body", "ts", interval="1 minute").collect()
    by_key = {(r["window_start"].minute, r["body"]): r for r in out}
    assert by_key[(0, "disk full")]["log_count"] == 2
    assert by_key[(0, "disk full")]["first_observed"] == t0
    assert by_key[(2, "disk full")]["log_count"] == 1
    assert by_key[(0, "oom")]["log_count"] == 1


def test_histogram_quantile_interpolation_and_inf_clamp(spark):
    from sparkcollector.operators.telemetry import (
        duration_histogram,
        histogram_quantile,
    )

    # 10 values uniform in (0, 100]: P50 interpolates inside a bucket
    vals = [(float(v),) for v in range(10, 101, 10)]
    df = spark.createDataFrame(vals, "v double")
    buckets = duration_histogram(df, "v", [25.0, 50.0, 100.0], [])
    # rank = 0.5*10 = 5; first bucket with cum>=5 is le=50 (cum 5);
    # prev (le=25) cum 2 -> 25 + 25*(5-2)/(5-2) = 50.0
    got = histogram_quantile(buckets.withColumn("g", F.lit(1)), 0.5, ["g"]).collect()
    assert got[0]["quantile"] == 50.0

    # all mass beyond the last finite bound: clamp to it
    df2 = spark.createDataFrame([(1000.0,), (2000.0,)], "v double")
    b2 = duration_histogram(df2, "v", [25.0, 50.0, 100.0], []).withColumn(
        "g", F.lit(1)
    )
    got2 = histogram_quantile(b2, 0.95, ["g"]).collect()
    assert got2[0]["quantile"] == 100.0


def test_slo_burn_rate_multiwindow_gate(spark):
    import datetime as dt

    from sparkcollector.operators.telemetry import slo_burn_rate

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # hour 0: sustained 50% errors (burning with objective .5 budget);
    # hour 1: all ok -> not burning
    rows = []
    for m in range(0, 60, 5):
        rows.append(("err", t0 + dt.timedelta(minutes=m)))
        rows.append(("ok", t0 + dt.timedelta(minutes=m, seconds=30)))
    for m in range(0, 60, 5):
        rows.append(("ok", t0 + dt.timedelta(hours=1, minutes=m)))
    df = spark.createDataFrame(rows, "status string, ts timestamp")
    out = {
        r["lw_start"]: r
        for r in slo_burn_rate(
            df, "status = 'ok'", "ts", objective=0.75
        ).collect()
    }
    burning = out[t0]
    assert burning["burning"] is True
    assert burning["long_burn"] == 2.0  # 50% errors / 25% budget
    quiet = out[t0 + dt.timedelta(hours=1)]
    assert quiet["burning"] is False and quiet["errors"] == 0


def test_counter_rate_reset_handling(spark):
    import datetime as dt

    from sparkcollector.operators.telemetry import counter_rate

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("s", t0, 10.0),
        ("s", t0 + dt.timedelta(seconds=10), 25.0),   # +15
        ("s", t0 + dt.timedelta(seconds=20), 3.0),    # reset -> increase = 3
        ("s", t0 + dt.timedelta(seconds=30), 8.0),    # +5
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, v double")
    out = sorted(
        counter_rate(df, ["series"], "v", "ts").collect(), key=lambda r: r["ts"]
    )
    assert out[0]["increase"] is None and out[0]["rate"] is None
    assert out[1]["increase"] == 15.0 and out[1]["rate"] == 1.5
    assert out[2]["increase"] == 3.0 and out[2]["reset"] is True
    assert out[3]["increase"] == 5.0 and out[3]["reset"] is False


def test_seasonal_baseline_anomaly_leave_one_out(spark):
    import datetime as dt

    from sparkcollector.operators.telemetry import seasonal_baseline_anomaly

    # hour-of-day 3 on four days: counts 2,3,2,8 -> the burst window's
    # baseline is mean(2,3,2) and z is large positive
    rows = []
    for day, n in [(1, 2), (2, 3), (3, 2), (4, 8)]:
        for i in range(n):
            rows.append((dt.datetime(2024, 1, day, 3, 0, i),))
    df = spark.createDataFrame(rows, "ts timestamp")
    out = {r["window_start"]: r for r in seasonal_baseline_anomaly(df).collect()}
    burst = out[dt.datetime(2024, 1, 4, 3)]
    assert burst["n"] == 8 and burst["baseline_mean"] == round(7 / 3, 4)
    assert burst["z"] is not None and burst["z"] > 3
    quiet = out[dt.datetime(2024, 1, 1, 3)]
    assert quiet["baseline_mean"] == round(13 / 3, 4)  # mean(3,2,8)
    # zero-variance peers leave z undefined (never a fake alert)
    rows0 = [
        (dt.datetime(2024, 1, d, 5, 0, i),)
        for d, n in [(1, 2), (2, 2), (3, 2), (4, 8)]
        for i in range(n)
    ]
    out0 = {
        r["window_start"]: r
        for r in seasonal_baseline_anomaly(
            spark.createDataFrame(rows0, "ts timestamp")
        ).collect()
    }
    assert out0[dt.datetime(2024, 1, 4, 5)]["z"] is None


def test_apdex_bands_and_score(spark):
    from sparkcollector.operators.telemetry import apdex

    rows = [
        ("svc", 10.0),   # satisfied (<= 50)
        ("svc", 50.0),   # satisfied (boundary closed)
        ("svc", 51.0),   # tolerating
        ("svc", 200.0),  # tolerating (4T boundary closed)
        ("svc", 201.0),  # frustrated
        ("other", 999.0),  # frustrated only
    ]
    df = spark.createDataFrame(rows, ["service", "value"])
    got = {
        r["service"]: (
            r["n_calls"], r["n_satisfied"], r["n_tolerating"], r["apdex"]
        )
        for r in apdex(df, "value", ["service"], threshold=50.0).collect()
    }
    # svc: (2 + 2/2) / 5 = 0.6; other: 0/1 = 0.0
    assert got == {"svc": (5, 2, 2, 0.6), "other": (1, 0, 0, 0.0)}


def test_exp_histogram_merge_downscale(spark):
    """Scale-2 buckets fold into scale-1 via floor(i/2) — negatives
    round toward -inf (arithmetic shift) — and counts add."""
    from sparkcollector.operators.telemetry import exp_histogram_merge

    rows = [
        # (grp, series, scale, bucket_idx, bucket_count)
        ("g", "a", 2, 5, 3),    # 5 >> 1 -> 2
        ("g", "a", 2, -3, 1),   # floor(-1.5) -> -2
        ("g", "b", 1, 2, 2),    # already at target
        ("h", "c", 3, 4, 7),    # single-series group: no downscale
    ]
    df = spark.createDataFrame(
        rows, ["grp", "series", "scale", "bucket_idx", "bucket_count"]
    )
    got = {
        (r["grp"], r["target_scale"], r["m_idx"]): r["bucket_count"]
        for r in exp_histogram_merge(df, ["grp"]).collect()
    }
    assert got == {
        ("g", 1, 2): 5,   # 3 (downscaled) + 2 (native)
        ("g", 1, -2): 1,
        ("h", 3, 4): 7,
    }


def test_rate_limit_tumbling_window_keeps_n(spark):
    """At most N per key per tumbling window, ranked by (ts, tiebreak);
    suppressed rows flagged, not dropped (ThrottledLogger shape,
    utils/log.go:60-155, N-per-window generalization)."""
    import datetime as dt

    from sparkcollector.operators.telemetry import rate_limit

    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)
    rows = [
        ("a", 1, t0),                                  # win 0: kept
        ("a", 2, t0 + dt.timedelta(seconds=5)),        # win 0: kept
        ("a", 3, t0 + dt.timedelta(seconds=10)),       # win 0: over cap
        ("a", 4, t0 + dt.timedelta(seconds=65)),       # win 1: kept
        ("b", 5, t0 + dt.timedelta(seconds=5)),        # other key: kept
    ]
    df = spark.createDataFrame(rows, ["k", "event_id", "ts"])
    out = rate_limit(
        df, "k", ts_col="ts", order_col="event_id",
        window_sec=60, max_per_window=2,
    )
    kept = {r["event_id"]: r["kept"] for r in out.collect()}
    assert kept == {1: True, 2: True, 3: False, 4: True, 5: True}
    # nothing dropped
    assert out.count() == 5


def test_throttle_exact_matches_sequential_replay(spark):
    """Per-key last-emission chain (utils/log.go:124-136): emit iff
    ts >= last_emitted + duration; first row always emits."""
    import datetime as dt

    from sparkcollector.operators.telemetry import throttle_exact

    t0 = dt.datetime(2025, 1, 1)
    secs = [0, 10, 60, 61, 130]
    df = spark.createDataFrame(
        [("m", t0 + dt.timedelta(seconds=s)) for s in secs], ["k", "ts"]
    )
    r = throttle_exact(df, "k", duration_sec=60).collect()[0]
    # kept: 0 (first), 60 (>=0+60), 130 (>=60+60); suppressed: 10, 61
    assert r["n_total"] == 5 and r["n_kept"] == 3
    assert r["last_kept_s"] - r["first_kept_s"] == 130.0


def test_hll_registers_merge_and_estimate_accuracy(spark):
    """Registers are mergeable (max across shards == whole-set
    registers) and the m=256 estimate lands within ~3 standard
    errors (1.04/sqrt(256) ~ 6.5%) of the true distinct count."""
    from sparkcollector.operators.telemetry import (
        hll_estimate,
        hll_registers,
    )

    df = spark.createDataFrame(
        [("g", f"item-{i}") for i in range(5000)], ["g", "k"]
    )
    regs = hll_registers(df, "k", ["g"])
    est = hll_estimate(regs, ["g"]).collect()[0]
    assert abs(est["est_distinct"] - 5000) / 5000 < 0.20
    # merge property: shard registers max-combine to the whole
    a = hll_registers(df.filter(F.col("k") < "item-3"), "k", ["g"])
    b = hll_registers(df.filter(F.col("k") >= "item-3"), "k", ["g"])
    merged = (
        a.unionByName(b)
        .groupBy("g", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    whole = {(r["reg"], r["rho"]) for r in regs.collect()}
    assert {(r["reg"], r["rho"]) for r in merged.collect()} == whole


def test_hll_small_range_linear_counting(spark):
    """Tiny cardinality hits the linear-counting branch and is near
    exact there."""
    from sparkcollector.operators.telemetry import (
        hll_estimate,
        hll_registers,
    )

    df = spark.createDataFrame([("g", f"x{i}") for i in range(20)], ["g", "k"])
    est = hll_estimate(hll_registers(df, "k", ["g"]), ["g"]).collect()[0]
    assert abs(est["est_distinct"] - 20) < 3
    assert est["zero_registers"] > 0


def test_rollup_by_type_selects_per_type_function(spark):
    from sparkcollector.operators.telemetry import rollup_by_type

    rows = [
        ("w1", "gauge", 2.0), ("w1", "gauge", 4.0),
        ("w1", "counter", 5.0), ("w1", "counter", 7.0),
        ("w1", "cumulative", 100.0), ("w1", "cumulative", 160.0),
        ("w1", "other", 9.0),
    ]
    df = spark.createDataFrame(rows, "win string, mtype string, value double")
    got = {
        r["mtype"]: (r["rollup"], r["value"])
        for r in rollup_by_type(df, ["win"]).collect()
    }
    assert got["gauge"] == ("average", 3.0)
    assert got["counter"] == ("sum", 12.0)
    assert got["cumulative"] == ("delta", 60.0)
    assert got["other"] == ("latest", None)


def test_labels_to_props_tags_sanitize_and_split(spark):
    from pyspark.sql import functions as F

    from sparkcollector.operators.telemetry import labels_to_props_tags

    df = spark.createDataFrame([(1,)], "id long").select(
        "id",
        F.create_map(
            F.lit("app.kubernetes.io/name"), F.lit("web"),
            F.lit("emptytag"), F.lit(""),
        ).alias("labels"),
    )
    got = {
        r["key"]: (r["kind"], r["value"])
        for r in labels_to_props_tags(df).collect()
    }
    assert got["app_kubernetes_io_name"] == ("property", "web")
    assert got["emptytag"] == ("tag", None)


def test_flatten_struct_dotpath_deep_and_flat(spark):
    from pyspark.sql import functions as F

    from sparkcollector.operators.telemetry import flatten_struct_dotpath

    df = spark.createDataFrame([(1, "x")], "id long, plain string").select(
        "id",
        "plain",
        F.struct(
            F.struct(F.lit(7).alias("deep")).alias("inner"),
            F.lit("v").alias("leaf"),
        ).alias("outer"),
    )
    out = flatten_struct_dotpath(df)
    assert out.columns == ["id", "plain", "outer.inner.deep", "outer.leaf"]
    row = out.collect()[0]
    assert row["outer.inner.deep"] == 7 and row["plain"] == "x"


def test_staleness_segments_split_on_nan(spark):
    from sparkcollector.operators.telemetry import staleness_segments

    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("s", 1, t0, 1.0),
        ("s", 2, t0 + datetime.timedelta(seconds=10), 2.0),
        ("s", 3, t0 + datetime.timedelta(seconds=20), float("nan")),
        ("s", 4, t0 + datetime.timedelta(seconds=30), 3.0),
        ("s", 5, t0 + datetime.timedelta(seconds=45), 4.0),
    ]
    df = spark.createDataFrame(
        rows, "k string, i long, ts timestamp, value double"
    )
    got = {
        r["segment"]: (r["n_points"], r["duration_s"])
        for r in staleness_segments(df, ["k"], "i").collect()
    }
    assert got[0] == (2, 10.0)   # before the marker
    assert got[1] == (2, 15.0)   # after the marker


def test_uptime_percent_gap_accounting(spark):
    import datetime

    from sparkcollector.operators.telemetry import uptime_percent

    t0 = datetime.datetime(2024, 1, 1)
    # heartbeats at 0,60,120 then a 300s outage, then 420,480
    offs = [0, 60, 120, 420, 480]
    df = spark.createDataFrame(
        [("s", i, t0 + datetime.timedelta(seconds=o))
         for i, o in enumerate(offs)],
        "k string, i long, ts timestamp",
    )
    r = uptime_percent(
        df, ["k"], order_cols=["ts", "i"],
        expected_interval_s=60.0, gap_factor=2.0,
    ).collect()[0]
    assert r["span_s"] == 480.0
    assert r["downtime_s"] == 240.0  # 300s gap minus one interval
    assert r["uptime_pct"] == 0.5


def test_winsorize_clamps_and_flags(spark):
    from sparkcollector.operators.telemetry import winsorize

    vals = list(range(1, 101))  # 1..100
    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate(vals)],
        "grp string, i long, value double",
    )
    out = winsorize(df, "value", ["grp"], lo=0.05, hi=0.95).collect()
    los = [r for r in out if r["clipped"] == "lo"]
    his = [r for r in out if r["clipped"] == "hi"]
    assert len(los) == 5 and len(his) == 5  # 1..5 and 96..100 clip
    assert all(r["clamped"] == r["lo_bound"] for r in los)
    mid = next(r for r in out if r["value"] == 50.0)
    assert mid["clipped"] is None and mid["clamped"] == 50.0


def test_mad_outliers_robust_to_the_outlier(spark):
    from sparkcollector.operators.telemetry import mad_outliers

    vals = [10.0, 11.0, 12.0, 10.5, 11.5, 10.2, 11.8, 1000.0]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "grp string, i long, value double",
    )
    out = {r["value"]: r["outlier"] for r in
           mad_outliers(df, "value", ["grp"], k=3.0).collect()}
    assert out[1000.0] is True
    assert all(not flag for v, flag in out.items() if v != 1000.0)


def test_heatmap_grid_fractions_sum_to_one(spark):
    import datetime

    from pyspark.sql import functions as F

    from sparkcollector.operators.telemetry import heatmap_grid

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(t0, 5.0), (t0, 20.0), (t0, 20.0), (t0, 200.0)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = heatmap_grid(df, bounds=(10.0, 50.0, 100.0), window_sec=3600)
    cells = {r["bucket_idx"]: r for r in out.collect()}
    assert cells[0]["n"] == 1 and cells[1]["n"] == 2 and cells[3]["n"] == 1
    assert all(r["win_total"] == 4 for r in cells.values())
    assert abs(sum(r["fraction"] for r in cells.values()) - 1.0) < 1e-9


def test_interarrival_stats_poisson_vs_metronome(spark):
    import datetime

    from sparkcollector.operators.telemetry import interarrival_stats

    t0 = datetime.datetime(2024, 1, 1)
    rows = [("tick", i, t0 + datetime.timedelta(seconds=60 * i))
            for i in range(10)]
    # bursty: gaps 1,1,1,117 repeated
    offs, cur = [], 0
    for i in range(12):
        cur += 1 if i % 4 != 3 else 117
        offs.append(cur)
    rows += [("burst", i, t0 + datetime.timedelta(seconds=o))
             for i, o in enumerate(offs)]
    df = spark.createDataFrame(rows, "k string, i long, ts timestamp")
    got = {r["k"]: r for r in interarrival_stats(
        df, ["k"], order_cols=["ts", "i"]).collect()}
    assert got["tick"]["mean_gap_s"] == 60.0
    assert got["tick"]["cv"] == 0.0          # metronomic
    assert got["burst"]["cv"] > 1.0          # bursty


def test_template_drift_shares(spark):
    from sparkcollector.operators.telemetry import template_drift

    rows = (
        [("error code 1", "a")] * 3 + [("error code 2", "a")] * 1
        + [("error code 9", "b")] * 1 + [("login ok", "b")] * 3
    )
    df = spark.createDataFrame(rows, "text string, period string")
    got = {r["template"]: r for r in
           template_drift(df, "period").collect()}
    err = got["error code <*>"]
    assert (err["n_a"], err["n_b"]) == (4, 1)
    assert err["share_a"] == 1.0 and err["share_b"] == 0.25
    assert err["share_delta"] == 0.75
    ok = got["login ok"]
    assert ok["n_a"] == 0 and ok["share_b"] == 0.75  # absent = 0


def test_cardinality_cap_first_seen_wins(spark):
    import datetime

    from sparkcollector.operators.telemetry import cardinality_cap

    t0 = datetime.datetime(2024, 1, 1)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    rows = [
        ("m", "s1", ts(0)), ("m", "s1", ts(10)),
        ("m", "s2", ts(1)),
        ("m", "s3", ts(2)), ("m", "s3", ts(5)), ("m", "s3", ts(6)),
    ]
    df = spark.createDataFrame(rows, "metric string, series string, ts timestamp")
    r = cardinality_cap(df, "metric", "series", cap=2).collect()[0]
    assert r["n_series"] == 3 and r["n_kept"] == 2
    assert r["kept_series"] == ["s1", "s2"]   # first-seen order
    assert r["points_kept"] == 3 and r["points_dropped"] == 3


def test_ht_estimate_consistency(spark):
    from sparkcollector.operators.telemetry import ht_estimate

    df = spark.createDataFrame(
        [("g", i) for i in range(5000)], "grp string, k long"
    )
    r = ht_estimate(df, ["grp"], "k", p=0.1).collect()[0]
    assert r["n_exact"] == 5000
    assert r["n_estimated"] == r["n_sampled"] / 0.1
    assert r["rel_error"] < 0.1  # md5 buckets are near-uniform


def test_ingest_lag_percentiles_exact(spark):
    import datetime

    from pyspark.sql import functions as F

    from sparkcollector.operators.telemetry import ingest_lag_percentiles

    t0 = datetime.datetime(2024, 1, 1)
    # lags 0..99 seconds -> p50 = 49.5 (interpolated), max = 99
    rows = [("s", t0, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, lag double")
    withproc = df.select(
        "k", "ts",
        (F.col("ts").cast("timestamp_ltz").cast("double")
         + F.col("lag")).alias("proc_ts"),
    )
    r = ingest_lag_percentiles(withproc, ["k"]).collect()[0]
    assert r["p50_lag_s"] == 49.5
    assert r["max_lag_s"] == 99.0


def test_late_data_audit_monotone_in_watermark(spark):
    import datetime

    from pyspark.sql import functions as F

    from sparkcollector.operators.telemetry import late_data_audit

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 30)  # window ends at :60
    rows = [(t0, 10.0), (t0, 40.0), (t0, 100.0), (t0, 400.0)]
    df = spark.createDataFrame(rows, "ts timestamp, lag double")
    withproc = df.select(
        "ts",
        (F.col("ts").cast("timestamp_ltz").cast("double")
         + F.col("lag")).alias("proc_ts"),
    )
    got = {r["watermark_s"]: r["n_late"] for r in late_data_audit(
        withproc, window_sec=60, watermarks=(0, 60, 300)).collect()}
    # proc times are +10/+40/+100/+400 from :30 -> arrive :40,:70,:130,:430
    assert got[0] == 3      # :70, :130, :430 after window end :60
    assert got[60] == 2     # :130, :430 after :120
    assert got[300] == 1    # :430 after :360


def test_time_weighted_avg_vs_plain(spark):
    import datetime

    from sparkcollector.operators.telemetry import time_weighted_avg

    t0 = datetime.datetime(2024, 1, 1)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    # 10 held for 90s, 100 held for 10s, final sample carries no
    # weight: TWA = (10*90 + 100*10) / 100 = 19; plain avg = 40
    rows = [("g", 1, ts(0), 10.0), ("g", 2, ts(90), 100.0),
            ("g", 3, ts(100), 10.0)]
    df = spark.createDataFrame(rows, "k string, i long, ts timestamp, value double")
    r = time_weighted_avg(df, ["k"], order_cols=["ts", "i"]).collect()[0]
    assert r["twa"] == 19.0
    assert r["plain_avg"] == 40.0
    assert r["span_s"] == 100.0


def test_hll_merge_equals_direct_build(spark):
    from pyspark.sql import functions as F

    from sparkcollector.operators.telemetry import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    df = spark.createDataFrame(
        [("g%d" % (i % 3), i % 500) for i in range(3000)],
        "grp string, item long",
    )
    merged = hll_merge(hll_registers(df, "item", ["grp"]))
    via_merge = hll_estimate(merged, ["scope"]).collect()[0]
    direct = hll_estimate(
        hll_registers(df.withColumn("scope", F.lit("all")), "item",
                      ["scope"]),
        ["scope"],
    ).collect()[0]
    # mergeability law: identical registers -> identical estimate
    assert via_merge["est_distinct"] == direct["est_distinct"]
    assert via_merge["zero_registers"] == direct["zero_registers"]


def test_forward_fill_carries_and_leading_gap(spark):
    from sparkcollector.operators.telemetry import forward_fill

    rows = [
        ("k", 1, None), ("k", 2, 5.0), ("k", 3, None),
        ("k", 4, None), ("k", 5, 7.0),
    ]
    df = spark.createDataFrame(rows, "key string, i long, value double")
    got = {r["i"]: r for r in
           forward_fill(df, ["key"], "i", "value").collect()}
    assert got[1]["leading_gap"] and got[1]["filled"] is None
    assert got[3]["filled"] == 5.0 and got[3]["was_filled"]
    assert got[4]["filled"] == 5.0
    assert got[5]["filled"] == 7.0 and not got[5]["was_filled"]


def test_payload_size_histogram_pow2(spark):
    from sparkcollector.operators.telemetry import payload_size_histogram

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("a", 17), ("a", 1024)],
        "grp string, sz long",
    )
    got = {r["bucket"]: (r["n"], r["total_bytes"]) for r in
           payload_size_histogram(df, "sz", ["grp"]).collect()}
    assert got[1] == (1, 1)
    assert got[2] == (1, 2)
    assert got[4] == (1, 3)
    assert got[32] == (1, 17)
    assert got[1024] == (1, 1024)


def test_fk_orphan_audit_both_directions(spark):
    from sparkcollector.operators.telemetry import fk_orphan_audit

    facts = spark.createDataFrame(
        [(1,), (1,), (2,), (9,)], "k long"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    got = {r["direction"]: r for r in
           fk_orphan_audit(facts, dim, "k").collect()}
    f = got["facts_missing_dim"]
    assert f["n_orphans"] == 1 and f["n_total"] == 4  # the key-9 row
    d = got["dim_unreferenced"]
    assert d["n_orphans"] == 1 and d["n_total"] == 3  # key 3 unused


def test_ingestion_completeness_gaps(spark):
    import datetime

    from sparkcollector.operators.telemetry import ingestion_completeness

    t0 = datetime.datetime(2024, 1, 1, 12)
    day = datetime.timedelta(days=1)
    # source s: days 0,1,3 of a 4-day span -> 1 missing
    rows = [("s", t0), ("s", t0 + day), ("s", t0 + 3 * day),
            ("s", t0 + 3 * day)]
    df = spark.createDataFrame(rows, "src string, ts timestamp")
    r = ingestion_completeness(df, "src").collect()[0]
    assert r["active_days"] == 3 and r["span_days"] == 4
    assert r["missing_days"] == 1 and r["completeness"] == 0.75


def test_concurrency_curve_sweep(spark):
    from sparkcollector.operators.telemetry import concurrency_curve

    # intervals: [0,10), [5,15), [20,30) -> max overlap 2
    rows = [("g", 1, 0.0, 10.0), ("g", 2, 5.0, 10.0), ("g", 3, 20.0, 10.0)]
    df = spark.createDataFrame(
        rows, "k string, i long, start_s double, dur_s double"
    )
    r = concurrency_curve(df, ["k"], "start_s", "dur_s", "i").collect()[0]
    assert r["max_concurrency"] == 2
    # area = 5*1 + 5*2 + 5*1 + 5*0 + 10*1 = 30 over span 30 -> 1.0
    assert abs(r["mean_concurrency"] - 1.0) < 1e-9
    # an interval ending exactly when another starts does NOT overlap
    rows2 = [("g", 1, 0.0, 10.0), ("g", 2, 10.0, 10.0)]
    df2 = spark.createDataFrame(
        rows2, "k string, i long, start_s double, dur_s double"
    )
    r2 = concurrency_curve(df2, ["k"], "start_s", "dur_s", "i").collect()[0]
    assert r2["max_concurrency"] == 1


def test_p95_trend_delta(spark):
    import datetime

    from sparkcollector.operators.telemetry import p95_trend

    t0 = datetime.datetime(2024, 1, 4)
    week = datetime.timedelta(days=7)
    rows = [("s", t0, float(v)) for v in range(1, 101)]
    rows += [("s", t0 + week, float(v * 2)) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    got = sorted(
        (r["week"], r["p95"], r["p95_delta"])
        for r in p95_trend(df, ["k"], "value", "ts").collect()
    )
    assert got[0][2] is None                   # first week: no baseline
    assert abs(got[1][1] - 2 * got[0][1]) < 1e-6
    assert abs(got[1][2] - got[0][1]) < 1e-6   # delta = +p95_week0


def test_ddsketch_quantiles_accuracy_and_buckets(spark):
    from sparkcollector.operators.telemetry import ddsketch_quantiles

    # 1..1000 exact: true p50=500 (rank floor(.5*999)+1), p99=991.
    rows = [("k", float(v)) for v in range(1, 1001)]
    rows += [("k", 0.0), ("k", -3.0)]          # zero-bucket values
    df = spark.createDataFrame(rows, "key string, value double")
    got = ddsketch_quantiles(df, ["key"], "value", alpha=0.01).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n"] == 1000 and r["n_nonpos"] == 2
    # sketch is bounded: far fewer buckets than values
    assert r["n_buckets"] < 400
    # relative-error guarantee: |est - true| <= alpha * true
    for est, true in ((r["p50_est"], 500.0), (r["p95_est"], 950.0),
                      (r["p99_est"], 990.0)):
        assert abs(est - true) <= 0.011 * true, (est, true)


def test_ddsketch_pinned_bucket():
    import math

    # bucket rule replay: gamma for alpha=0.01; v=100 -> ceil(ln/ln)
    gamma = (1.0 + 0.01) / (1.0 - 0.01)
    i = math.ceil(round(math.log(100.0) / math.log(gamma), 9))
    assert i == 231
    est = 2.0 * gamma**i / (gamma + 1.0)
    assert abs(est - 100.0) <= 1.0             # within alpha*v


def test_p_chart_flags_out_of_control_bucket(spark):
    import datetime

    from sparkcollector.operators.telemetry import p_chart

    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    # 5 buckets at 10% defects (100 obs each), one bucket at 60%
    for h in range(5):
        for i in range(100):
            rows.append((t0 + datetime.timedelta(hours=h, seconds=i),
                         i < 10))
    for i in range(100):
        rows.append((t0 + datetime.timedelta(hours=5, seconds=i), i < 60))
    df = spark.createDataFrame(rows, "ts timestamp, is_err boolean")
    got = sorted(p_chart(df, "is_err").collect(),
                 key=lambda r: r["bucket_start"])
    assert len(got) == 6
    # pooled centerline = (5*10 + 60)/600
    assert abs(got[0]["pbar"] - 110 / 600) < 1e-6
    assert [r["out_of_control"] for r in got] == [False] * 5 + [True]
    assert got[5]["p"] == 0.6
    # limits widen for thin buckets: a 4-obs bucket has wider bands
    rows2 = rows + [(t0 + datetime.timedelta(hours=6, seconds=i), i < 1)
                    for i in range(4)]
    df2 = spark.createDataFrame(rows2, "ts timestamp, is_err boolean")
    got2 = sorted(p_chart(df2, "is_err").collect(),
                  key=lambda r: r["bucket_start"])
    assert got2[6]["ucl"] > got2[0]["ucl"]


def test_ddsketch_merge_equals_direct(spark):
    from sparkcollector.operators.telemetry import ddsketch_merge_quantiles

    rows = [("k", i % 3, float(v)) for i, v in enumerate(range(1, 501))]
    df = spark.createDataFrame(rows, "key string, shard int, value double")
    r = ddsketch_merge_quantiles(df, ["key"], "shard", "value").collect()[0]
    assert r["merge_matches"] is True
    assert r["p50_merged"] == r["p50_direct"]
    assert r["p99_merged"] == r["p99_direct"]
    assert r["n"] == 500
    # merged estimate still honors the alpha guarantee
    assert abs(r["p50_merged"] - 250.0) <= 0.011 * 250.0 + 1


def test_trimmed_means_conventions(spark):
    from sparkcollector.operators.telemetry import trimmed_means

    # 1..10 plus one wild outlier 1000: mean is pulled, trimmed is not
    rows = [("k", float(v)) for v in range(1, 11)] + [("k", 1000.0)]
    df = spark.createDataFrame(rows, "key string, value double")
    r = trimmed_means(df, ["key"], "value", trim=0.1).collect()[0]
    assert r["n"] == 11
    assert r["mean"] > 90.0                   # outlier dominates
    assert r["trimmed_mean"] < 8.0            # outlier trimmed away
    assert r["winsorized_mean"] < r["mean"]   # clamped, not dropped
    # boundary values are KEPT: exact p10/p90 of 1..10 with no outlier
    df2 = spark.createDataFrame(
        [("q", float(v)) for v in range(1, 11)], "key string, value double"
    )
    r2 = trimmed_means(df2, ["key"], "value", trim=0.1).collect()[0]
    # p10 = 1.9, p90 = 9.1 -> kept 2..9 -> mean 5.5
    assert abs(r2["trimmed_mean"] - 5.5) < 1e-9
    assert abs(r2["lo_bound"] - 1.9) < 1e-9


def test_misra_gries_bounds_hold(spark):
    from sparkcollector.operators.telemetry import (
        misra_gries_heavy_hitters,
    )

    rows = []
    # heavy keys 0/1 everywhere; long tail of singletons per shard
    for sh in range(4):
        rows += [(0, sh)] * 50 + [(1, sh)] * 30
        rows += [(100 + sh * 100 + i, sh) for i in range(20)]
    df = spark.createDataFrame(rows, "k long, shard int")
    got = {r["key"]: r for r in
           misra_gries_heavy_hitters(df, "k", "shard", m=2).collect()}
    # every retained key's sandwich must hold (it is a theorem)
    assert all(r["within_bounds"] for r in got.values())
    assert got[0]["count_lower"] == 200 and got[0]["count_exact"] == 200
    # tail keys dropped: state is m=2 counters/shard, not the universe
    assert len(got) <= 8
    # upper bound accounts for shards where the key was not retained
    assert got[0]["count_upper"] >= got[0]["count_exact"]


def test_token_bucket_audit_drops(spark):
    import datetime

    from sparkcollector.operators.telemetry import token_bucket_audit

    t0 = datetime.datetime(2024, 1, 1)

    def ev(uid, i, sec):
        return (uid, i, t0 + datetime.timedelta(seconds=sec))

    rows = [
        # burst of 4 at t=0..3s, capacity 2: events 3 and 4 dropped
        ev(1, 1, 0), ev(1, 2, 1), ev(1, 3, 2), ev(1, 4, 3),
        # after 600s one token refilled: allowed again
        ev(1, 5, 650),
        # slow sender never drops
        ev(2, 6, 0), ev(2, 7, 700), ev(2, 8, 1400),
    ]
    df = spark.createDataFrame(rows, "user long, event_id long, ts timestamp")
    got = {r["key"]: r for r in token_bucket_audit(
        df, "user", "ts", order_cols=("ts", "event_id"),
        capacity=2.0, rate_per_sec=1.0 / 600.0).collect()}
    assert got[1]["n_events"] == 5 and got[1]["n_dropped"] == 2
    assert got[2]["n_dropped"] == 0
    assert got[1]["drop_rate"] == 0.4


def test_interval_last_value_keeps_latest_and_counts(spark):
    import datetime as dt

    from sparkcollector.operators.telemetry import interval_last_value

    base = dt.datetime(2024, 1, 1)
    rows = [("m1", base + dt.timedelta(hours=h), float(h), h)
            for h in range(10)]
    # exact-ts tie: higher event_id wins
    rows += [("m2", base, 1.0, 1), ("m2", base, 2.0, 2)]
    df = spark.createDataFrame(
        rows, "metric string, ts timestamp, value double, event_id long"
    )
    out = {(r["metric"], r["interval_id"]): r for r in interval_last_value(
        df, ["metric"], "ts", "value", "event_id", interval_s=21600
    ).collect()}
    first = [k for k in out if k[0] == "m1"][0][1]
    assert out[("m1", first)]["last_value"] == 5.0      # hour 5 ends 6h ivl
    assert out[("m1", first)]["n_points"] == 6
    assert out[("m1", first + 1)]["last_value"] == 9.0
    m2 = [v for k, v in out.items() if k[0] == "m2"][0]
    assert m2["last_value"] == 2.0 and m2["n_points"] == 2


def test_rendezvous_only_removed_nodes_keys_move(spark):
    from sparkcollector.operators.telemetry import rendezvous_routing

    df = spark.createDataFrame(
        [(i,) for i in range(500)], "k long"
    )
    nodes = ["n0", "n1", "n2", "n3"]
    out = {r["node"]: r for r in rendezvous_routing(
        df, "k", nodes, removed="n1").collect()}
    # every key assigned; HRW: keys NOT owned by n1 never move
    assert sum(r["n_keys_before"] for r in out.values()) == 500
    for node, r in out.items():
        if node == "n1":
            assert r["moved_out"] == r["n_keys_before"] > 0
        else:
            assert r["moved_out"] == 0


def test_hash_ring_total_and_rebalance(spark):
    from sparkcollector.operators.telemetry import consistent_hash_ring

    df = spark.createDataFrame([(i,) for i in range(400)], "k long")
    out = consistent_hash_ring(df, "k", ["a", "b", "c"], vnodes=16)
    rows = out.collect()
    assert sum(r["n_keys"] for r in rows) == 400
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-6
    # with 16 vnodes/node no node should own everything
    assert max(r["n_keys"] for r in rows) < 400
