"""Telemetry processors from the reference, re-expressed Spark-first.

Each function reimplements the observed semantics of one collector
processor/connector (SURVEY.md §2.4-§2.6) as pure Catalyst expressions:

* :func:`histogram_bucket_delta` — Prometheus cumulative histogram
  buckets → per-bucket counts, +Inf bucket dropped
  (internal/receiver/lightprometheusreceiver/scraper.go:218-235).
* :func:`cpu_utilization` — delta(used)/delta(total)*100 between
  consecutive samples per key, clamped to [0,100]
  (internal/signalfx-agent/pkg/monitors/cpu/cpu.go:172-199).
* :func:`probabilistic_sample` — consistent hash-based p%% sampling
  (probabilisticsamplerprocessor, components.go:330).  Uses an
  md5-derived 32-bit bucket so any engine reproduces the decision.
* :func:`tail_sample` — buffer complete traces, keep whole traces
  whose aggregate satisfies a policy (tailsamplingprocessor,
  components.go:335).
* :func:`metrics_transform` — rename series + ``aggregate_label_values``
  (merge label values, re-aggregate)
  (cmd/otelcol/config/collector/full_config_linux.yaml:503-545).
* :func:`attributes_processor` — ordered attr actions: upsert / insert
  / delete / extract (regex named groups) / hash (sha256)
  (full_config_linux.yaml:438-463).
* :func:`group_by_attrs` — regroup records under chosen keys
  (groupbyattrsprocessor, components.go:324).
* :func:`redact` — keep allowlisted columns, mask digit runs in the
  rest (redactionprocessor, components.go:331).
* :func:`invalid_value_audit` — skip non-numeric/NaN values but COUNT
  them in synthesized error metrics
  (signalfxgatewayprometheusremotewritereceiver/prometheus_to_otel.go:
  129-166, 179-190).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# ---------------------------------------------------------------------
# histogram bucket differencing
# ---------------------------------------------------------------------

def histogram_bucket_delta(
    df: DataFrame, bucket_col: str = "cum_buckets", drop_last: bool = True
) -> DataFrame:
    """Cumulative bucket counts -> per-bucket counts, in-row.

    ``zip_with(buckets, shift(buckets), (cur, prev) -> cur - prev)``;
    the reference walks buckets subtracting the running previous value
    and drops the +Inf bucket (scraper.go:218-235).
    """
    cum = F.col(bucket_col)
    prev = F.concat(F.array(F.lit(0).cast("long")), F.slice(cum, 1, F.size(cum) - 1))
    delta = F.zip_with(cum, prev, lambda c, p: c - p)
    if drop_last:
        delta = F.slice(delta, 1, F.size(cum) - 1)
    return df.withColumn("bucket_counts", delta)


# ---------------------------------------------------------------------
# cpu utilization (lag + clamp)
# ---------------------------------------------------------------------

def cpu_utilization(
    df: DataFrame,
    key_cols: list[str],
    used_col: str,
    total_col: str,
    order_cols: list[str],
) -> DataFrame:
    """per-key delta ratio, percent, clamped to [0, 100].

    utilization = clamp(delta(used) / delta(total) * 100); rows with no
    previous sample or zero total-delta yield NULL (the monitor emits
    nothing for the first sample, cpu.go:111-157).
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    d_used = F.col(used_col) - F.lag(used_col).over(w)
    d_total = F.col(total_col) - F.lag(total_col).over(w)
    util = F.when(
        d_total > 0,
        F.least(F.greatest(d_used / d_total * 100.0, F.lit(0.0)), F.lit(100.0)),
    )
    return df.withColumn("utilization", util)


# ---------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------

def sample_bucket(col: Column, buckets: int = 100) -> Column:
    """Engine-portable consistent hash bucket: first 8 md5 hex chars as
    a 32-bit int, mod ``buckets``.  (DuckDB:
    ``cast('0x' || substr(md5(x),1,8) as bigint) % buckets``.)"""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % buckets
    )


def probabilistic_sample(
    df: DataFrame, key_col: str, percent: int
) -> DataFrame:
    """Keep ~percent%% of keys, consistently: the same key is always
    kept or always dropped (hash-based, seed-free — the property the
    probabilistic sampler guarantees for trace coherence)."""
    return df.filter(sample_bucket(F.col(key_col)) < percent)


@dataclass(frozen=True)
class TailPolicy:
    """Keep a whole trace iff any/all rows satisfy ``predicate_sql``."""

    predicate_sql: str
    mode: str = "any"  # any | all


def tail_sample(
    df: DataFrame, trace_col: str, policy: TailPolicy
) -> DataFrame:
    """Tail sampling: evaluate the policy over the COMPLETE trace, then
    emit all rows of kept traces.  One aggregation + one semi join on
    the kept-trace list.  No broadcast hint: kept traces are
    O(matching traces) — unbounded at 10^12 turns — so we let AQE
    broadcast at runtime only when the aggregated side actually fits."""
    # NULL predicate results count as NOT matching (an unevaluable
    # condition must not satisfy an 'all' policy nor an 'any' policy)
    p = F.coalesce(F.expr(policy.predicate_sql), F.lit(False))
    agg = F.max(p.cast("int")) if policy.mode == "any" else F.min(p.cast("int"))
    kept = (
        df.groupBy(trace_col).agg(agg.alias("_keep")).filter(F.col("_keep") == 1)
    ).select(trace_col)
    return df.join(kept, trace_col, "left_semi")


# ---------------------------------------------------------------------
# metrics_transform
# ---------------------------------------------------------------------

def metrics_transform(
    df: DataFrame,
    name_col: str,
    value_col: str,
    renames: dict[str, str] | None = None,
    merge_values: dict[str, dict[str, str]] | None = None,
    group_cols: list[str] | None = None,
    aggregation: str = "sum",
) -> DataFrame:
    """Rename series; merge label values; re-aggregate.

    ``renames`` maps old->new series name; ``merge_values`` maps
    {label_col: {old_value: new_value}} (aggregate_label_values);
    rows are then re-aggregated over (name, group_cols) with
    sum/mean/min/max (yaml:515-545).
    """
    out = df
    name = F.col(name_col)
    if renames:
        for old, new in renames.items():
            name = F.when(name == old, new).otherwise(name)
    out = out.withColumn(name_col, name)
    if merge_values:
        for label, mapping in merge_values.items():
            c = F.col(label)
            for old, new in mapping.items():
                c = F.when(c == old, new).otherwise(c)
            out = out.withColumn(label, c)
    aggf = {
        "sum": F.sum,
        "mean": F.avg,
        "min": F.min,
        "max": F.max,
    }[aggregation]
    keys = [name_col, *(group_cols or [])]
    return out.groupBy(*keys).agg(aggf(value_col).alias(value_col))


# ---------------------------------------------------------------------
# attributes processor (ordered actions)
# ---------------------------------------------------------------------

@dataclass(frozen=True)
class AttrAction:
    """One action in the attributes processor's ordered list."""

    action: str  # upsert | insert | delete | extract | hash
    key: str
    value: object | None = None  # upsert constant
    from_attribute: str | None = None  # insert source
    pattern: str | None = None  # extract regex with named groups
    groups: tuple[str, ...] = field(default=())  # extract output names


def attributes_processor(df: DataFrame, actions: list[AttrAction]) -> DataFrame:
    """Apply ordered attribute actions as column operations
    (full_config_linux.yaml:438-463: upsert, insert from_attribute,
    delete, extract with named groups, hash)."""
    out = df
    for a in actions:
        if a.action == "upsert":
            out = out.withColumn(a.key, F.lit(a.value))
        elif a.action == "insert":
            src = F.col(a.from_attribute)
            if a.key in out.columns:
                out = out.withColumn(a.key, F.coalesce(F.col(a.key), src))
            else:
                out = out.withColumn(a.key, src)
        elif a.action == "delete":
            out = out.drop(a.key)
        elif a.action == "extract":
            for gi, gname in enumerate(a.groups, start=1):
                raw = F.regexp_extract(F.col(a.key), a.pattern, gi)
                out = out.withColumn(gname, F.when(raw != "", raw))
        elif a.action == "hash":
            out = out.withColumn(a.key, F.sha2(F.col(a.key).cast("string"), 256))
        else:
            raise ValueError(f"unknown action {a.action}")
    return out


def group_by_attrs(
    df: DataFrame, keys: list[str], payload_cols: list[str]
) -> DataFrame:
    """Regroup records under resources keyed by chosen attributes
    (groupbyattrsprocessor): one sorted record-list per key tuple."""
    payload = F.struct(*[F.col(c) for c in payload_cols])
    return df.groupBy(*keys).agg(
        F.sort_array(F.collect_list(payload)).alias("records"),
        F.count("*").alias("n_records"),
    )


def redact(
    df: DataFrame, allowed: list[str], mask_cols: list[str]
) -> DataFrame:
    """Redaction: project to the allowlist; mask digit runs in the
    listed string columns (value masking analog)."""
    out = df.select(*[c for c in df.columns if c in set(allowed)])
    for c in mask_cols:
        if c in out.columns:
            out = out.withColumn(c, F.regexp_replace(F.col(c), r"\d", "*"))
    return out


# ---------------------------------------------------------------------
# remaining OTLP metric types: exponential histogram + summary
# ---------------------------------------------------------------------

def exponential_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    scale: int = 2,
) -> DataFrame:
    """OTLP ExponentialHistogram aggregation (pmetric.Metrics type,
    pkg/processor/timestampprocessor/metric_processor.go:67 iterates
    it): base = 2^(2^-scale); bucket index = ceil(log_base(v)) - 1 for
    positive v, with a separate zero-count.  Output one row per
    (group, bucket) plus per-group zero/total counts — the sparse
    representation OTLP uses.
    """
    base_ln = F.lit(float(2 ** (2**-scale))).cast("double")
    v = F.col(value_col).cast("double")
    idx = F.ceil(F.log(v) / F.log(base_ln)) - 1
    pos = df.filter(v > 0).withColumn("bucket_idx", idx.cast("long"))
    buckets = pos.groupBy(*group_cols, "bucket_idx").agg(
        F.count("*").alias("bucket_count")
    )
    zeros = df.groupBy(*group_cols).agg(
        F.count(F.when(v == 0, 1)).alias("zero_count"),
        F.count(F.when(v > 0, 1)).alias("pos_count"),
    )
    return buckets.join(zeros, list(group_cols))


def exp_histogram_merge(
    df: DataFrame,
    group_cols: list[str],
    scale_col: str = "scale",
    idx_col: str = "bucket_idx",
    count_col: str = "bucket_count",
) -> DataFrame:
    """Merge sparse ExponentialHistogram series whose scales differ —
    the OTLP aggregation rule (the spec's downscale-then-add; the
    collector applies it whenever the batch/cumulative paths combine
    exponential-histogram datapoints, pmetric type iterated at
    metric_processor.go:67): the merge group's target scale is the
    SMALLEST scale present, and a bucket index ``i`` at scale ``s``
    maps to ``floor(i / 2^(s-t))`` at target ``t`` (arithmetic shift,
    so negative indexes round toward -inf), then counts add.

    ONE window pass to learn the group minimum + ONE keyed aggregate
    on (group, downscaled index) — both shuffle on the group key, and
    the input here is already bucket-sized (series x occupied buckets),
    orders of magnitude below datapoint scale, so this never touches
    raw-event volume.  Pure Catalyst; ``floor(i / 2^d)`` on doubles is
    exact for every index a float64 sample can produce.
    """
    w = Window.partitionBy(*group_cols)
    t = F.min(F.col(scale_col)).over(w)
    d = (F.col(scale_col) - t).cast("double")
    j = F.floor(F.col(idx_col) / F.pow(F.lit(2.0), d)).cast("long")
    return (
        df.select(
            *group_cols,
            t.alias("target_scale"),
            j.alias("m_idx"),
            F.col(count_col).alias("_c"),
        )
        .groupBy(*group_cols, "target_scale", "m_idx")
        .agg(F.sum("_c").alias("bucket_count"))
    )


def summary_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """OTLP Summary datapoints (metric_processor.go:77): per-group
    quantile values + count + sum.  Uses EXACT percentiles
    (``percentile``, interpolated) so results are engine-reproducible —
    the approx sketch variant trades that for one-pass memory bounds.
    Output: one row per (group, quantile).
    """
    pcts = F.percentile(
        F.col(value_col), F.array(*[F.lit(q) for q in quantiles])
    )
    g = df.groupBy(*group_cols).agg(
        pcts.alias("_qv"),
        F.count(value_col).alias("n"),
        F.sum(value_col).alias("total"),
    )
    qarr = F.array(*[F.lit(q) for q in quantiles])
    return g.select(
        *group_cols,
        "n",
        "total",
        F.explode(F.arrays_zip(qarr.alias("q"), F.col("_qv").alias("v"))).alias(
            "_z"
        ),
    ).select(
        *group_cols,
        "n",
        "total",
        F.col("_z.q").alias("quantile"),
        F.col("_z.v").alias("value"),
    )


# ---------------------------------------------------------------------
# invalid-value audit (NaN/garbage accounting)
# ---------------------------------------------------------------------

def invalid_value_audit(
    df: DataFrame, raw_col: str, group_cols: list[str]
) -> DataFrame:
    """Skip unparseable numeric values but count them per group.

    Mirrors the PRW receiver: NaN samples are not forwarded but are
    tallied into synthesized error-count metrics
    (prometheus_to_otel.go:129-166, 179-190).  Output per group:
    valid count, invalid count, sum of valid values.
    """
    v = F.col(raw_col).try_cast("double")
    return df.groupBy(*group_cols).agg(
        F.count(F.when(v.isNotNull() & ~F.isnan(v), 1)).alias("n_valid"),
        F.count(F.when(v.isNull() | F.isnan(v), 1)).alias("n_invalid"),
        F.sum(F.when(~F.isnan(v), v)).alias("valid_sum"),
    )


# ---------------------------------------------------------------------
# metricsgeneration processor (contrib processor registered at
# internal/components/components.go:328): derive a new metric from a
# pair of existing metrics sharing a label set, or metric x scale.
# ---------------------------------------------------------------------

def metrics_generation(
    df: DataFrame,
    rules: list[dict],
    name_col: str = "metric",
    value_col: str = "value",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """``calculate`` rules pair two metrics point-wise on their shared
    label set (``group_cols``); ``scale`` rules multiply one metric by
    a constant.  Rule shape::

        {"name": "memory.utilization", "type": "calculate",
         "metric1": "memory.usage", "metric2": "memory.limit",
         "operation": "percent"}          # add|subtract|multiply|divide|percent
        {"name": "disk.kb", "type": "scale",
         "metric1": "disk.bytes", "scale_by": 0.001}

    One hash-aggregation pivots the operand metrics per group (no
    self-join), then each rule is a codegen arithmetic expression;
    derived rows are unioned under the new metric name.  Division by
    zero yields NULL (dropped, like the processor skipping invalid
    datapoints).
    """
    group_cols = group_cols or []
    operands = sorted(
        {r["metric1"] for r in rules} | {r.get("metric2") for r in rules} - {None}
    )
    pivoted = df.groupBy(*group_cols).agg(
        *[
            F.max(
                F.when(F.col(name_col) == m, F.col(value_col))
            ).alias(f"_m{i}")
            for i, m in enumerate(operands)
        ]
    )
    idx = {m: f"_m{i}" for i, m in enumerate(operands)}
    outs = []
    for r in rules:
        m1 = F.col(idx[r["metric1"]])
        if r.get("type", "calculate") == "scale":
            val = m1 * F.lit(float(r["scale_by"]))
        else:
            m2 = F.col(idx[r["metric2"]])
            op = r["operation"]
            val = {
                "add": m1 + m2,
                "subtract": m1 - m2,
                "multiply": m1 * m2,
                "divide": F.when(m2 != 0, m1 / m2),
                "percent": F.when(m2 != 0, m1 * 100.0 / m2),
            }[op]
        outs.append(
            pivoted.select(
                *group_cols,
                F.lit(r["name"]).alias(name_col),
                val.cast("double").alias(value_col),
            ).filter(F.col(value_col).isNotNull())
        )
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), outs)


# ---------------------------------------------------------------------
# trace batching by source IP: the smartagent trace converter batches
# spans per reporting client IP so spans from different sources never
# share a resource (converter/traces.go:34-50), then group-translates
# each batch.  The batch shape is groupBy(ip).applyInPandas — the
# genuine group-UDTF surface (a per-batch translator is imperative
# code, not an aggregation).
# ---------------------------------------------------------------------

def trace_batch_by_ip(
    df: DataFrame,
    ip_col: str = "source_ip",
    span_id_col: str = "span_id",
    name_col: str = "name",
) -> DataFrame:
    """Group spans into per-source-IP batches and translate each batch.

    Output: one row per span with its batch's resource attribution:
    (source_ip, span_id, translated_name, batch_size, batch_index).
    ``translated_name`` mirrors the zipkin translation's normalization
    (lowercase, resource-scoped); ``batch_index`` is the span's stable
    position in its batch (sorted by span id — deterministic under any
    input partitioning).
    """
    import pandas as pd

    def translate(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(span_id_col, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        return pd.DataFrame(
            {
                "source_ip": pdf[ip_col],
                "span_id": pdf[span_id_col],
                "translated_name": (
                    pdf[ip_col].astype(str) + "/" + pdf[name_col].str.lower()
                ),
                "batch_size": n,
                "batch_index": range(n),
            }
        )

    return df.groupBy(ip_col).applyInPandas(
        translate,
        schema=(
            "source_ip string, span_id bigint, translated_name string, "
            "batch_size long, batch_index long"
        ),
    )


def drop_monitor_id_dim(
    df: DataFrame, dims_col: str = "dims", meta_col: str = "meta"
) -> DataFrame:
    """k8s/monitorID cardinality hygiene: delete the ``monitorID``
    dimension when it duplicates the datapoint's meta value
    (smartagentreceiver/converter/metrics.go:77-84 — receiver-creator
    endpoint IDs would otherwise explode dimension cardinality).

    Pure Catalyst ``map_filter``; rows where dims lacks monitorID or
    the values differ are untouched.
    """
    dims, meta = F.col(dims_col), F.col(meta_col)
    cleaned = F.map_filter(
        dims,
        lambda k, v: ~((k == F.lit("monitorID")) & (v == meta["monitorID"])),
    )
    # map_filter's lambda sees NULL meta['monitorID'] as NULL (not
    # true) which would DROP the dim — only apply the filter when the
    # meta key is actually set, per the reference's metaSet guard.
    return df.withColumn(
        dims_col,
        F.when(meta["monitorID"].isNotNull(), cleaned).otherwise(dims),
    )


def latency_percentiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    approx: bool = False,
) -> DataFrame:
    """Per-group latency percentiles — the P50/P95/P99 row of the RED
    dashboard the spanmetrics connector feeds.

    ``approx=False`` computes exact interpolated percentiles
    (``percentile``, the quantile_cont definition — used for the
    oracle-checked entry and anywhere a group's values fit a reducer).
    ``approx=True`` swaps in ``approx_percentile`` (the KLL-style
    mergeable sketch Spark ships): fixed memory per group regardless
    of group size, partials combine map-side — the only viable form
    when one service emits 10^10 spans.  Same output schema either
    way, so the swap is a flag, not a rewrite; the unit test pins the
    sketch to the exact answer's neighborhood.

    One shuffle (the groupBy); both variants partial-aggregate.
    """
    fn = F.approx_percentile if approx else F.percentile
    aggs = [
        F.round(fn(F.col(value_col), F.lit(q)), 4).alias(
            f"p{str(q).replace('0.', '')}"
        )
        for q in qs
    ]
    return df.groupBy(*group_cols).agg(
        F.count("*").alias("calls"), *aggs
    )


def transform_attrs(
    attrs: Column,
    keep_keys: list[str] | None = None,
    truncate_to: int | None = None,
    limit_to: int | None = None,
    replace_pattern: tuple[str, str] | None = None,
) -> Column:
    """OTTL map-function family over an attribute map column —
    ``keep_keys`` / ``truncate_all`` / ``limit`` /
    ``replace_all_patterns``, the transform processor's most-used
    statements (docs/components.md transformprocessor; OTTL func
    registry), applied in OTTL's order: keep -> replace -> truncate ->
    limit.

    All pure Catalyst map HOFs (map_filter / transform_values /
    map_entries+slice) — per-row narrow compute, codegen'd, zero
    shuffle, no UDF.  ``limit`` keeps the ``limit_to``
    lexicographically-smallest keys: OTTL's own tie-break is
    "arbitrary but priority keys first"; sorting makes it
    deterministic across engines and runs (pass priority keys via
    ``keep_keys`` first if needed).
    """
    m = attrs
    if keep_keys is not None:
        ks = F.array(*[F.lit(k) for k in keep_keys])
        m = F.map_filter(m, lambda k, v: F.array_contains(ks, k))
    if replace_pattern is not None:
        pat, repl = replace_pattern
        m = F.transform_values(
            m, lambda k, v: F.regexp_replace(v, pat, repl)
        )
    if truncate_to is not None:
        m = F.transform_values(m, lambda k, v: F.substring(v, 1, truncate_to))
    if limit_to is not None:
        m = F.map_from_entries(
            F.slice(F.array_sort(F.map_entries(m)), 1, limit_to)
        )
    return m


def tail_sampling_policies(
    df: DataFrame,
    trace_col: str,
    policies: list[tuple[str, str, str]],
    prob_percent: int | None = None,
) -> DataFrame:
    """Composite tail sampling: the reference's tail_sampling processor
    evaluates an ORDERED policy list over each complete trace (and/or
    string-attribute/latency policies, plus a probabilistic fallback)
    and the first matching policy claims the trace.

    ``policies`` is ``[(name, predicate_sql, mode)]`` with mode
    ``any``/``all`` over the trace's rows; ``prob_percent`` appends the
    portable-md5 probabilistic policy as the last resort.  ONE shuffle:
    every policy aggregates in the same groupBy (map-side partials),
    then a coalesced when-chain picks the first hit — never one pass
    per policy.  Returns ``(trace_col, sampled_by)`` for sampled
    traces; join back left_semi for the rows (the `tail_sample` shape —
    no broadcast hint, AQE decides).
    """
    aggs = []
    for name, pred, mode in policies:
        # NULL predicate = not matched (min() would otherwise skip the
        # row and let an 'all' policy pass on unevaluable conditions)
        p = F.coalesce(F.expr(pred), F.lit(False)).cast("int")
        agg = F.max(p) if mode == "any" else F.min(p)
        aggs.append(agg.alias(f"_p_{name}"))
    per = df.groupBy(trace_col).agg(*aggs)
    branches = [
        F.when(F.col(f"_p_{name}") == 1, F.lit(name))
        for name, _, _ in policies
    ]
    if prob_percent is not None:
        branches.append(
            F.when(
                sample_bucket(F.col(trace_col)) < prob_percent,
                F.lit("probabilistic"),
            )
        )
    dec = F.coalesce(*branches) if len(branches) > 1 else branches[0]
    return (
        per.select(F.col(trace_col), dec.alias("sampled_by"))
        .filter(F.col("sampled_by").isNotNull())
    )


def duration_histogram(
    df: DataFrame,
    value_col: str,
    bounds: list[float],
    keys: list[str],
) -> DataFrame:
    """Explicit-bounds cumulative histogram (the spanmetrics
    connector's duration histogram / Prometheus classic-histogram
    shape): per group, the count of values ``<= le`` for each bound
    plus the ``+Inf`` total.

    One grouped pass computes EVERY bucket as a conditional aggregate
    (cumulative by construction — no per-bucket scan, no explode);
    ``stack`` unpivots to the long ``(le, n)`` form sinks expect.
    NULL values count only toward ``+Inf``, matching the collector's
    treatment of missing durations.
    """
    aggs = [
        F.sum((F.col(value_col) <= F.lit(float(b))).cast("long")).alias(
            f"_b{i}"
        )
        for i, b in enumerate(bounds)
    ] + [F.count("*").alias("_binf")]
    wide = df.groupBy(*keys).agg(*aggs)
    pairs = ", ".join(
        [f"'{float(b)}', _b{i}" for i, b in enumerate(bounds)]
        + ["'+Inf', _binf"]
    )
    n = len(bounds) + 1
    return wide.select(
        *keys, F.expr(f"stack({n}, {pairs}) as (le, n)")
    ).withColumn("n", F.coalesce("n", F.lit(0)))


def log_templates(
    df: DataFrame,
    text_col: str = "text",
    mask: str = "<*>",
) -> DataFrame:
    """Log-template mining (Drain-style, variable-masking tier):
    collapse every log line to its constant skeleton by masking the
    variable fields — numbers, hex ids, quoted values — then count
    occurrences per template and keep the lexicographically-first raw
    example.  The first step of log clustering / novel-error detection
    over 10^12 lines.

    Pure regexp_replace chain (narrow, codegen'd) + ONE template-keyed
    shuffle with map-side partials; template cardinality is tiny
    relative to line count, so the reduce side is small by
    construction.
    """
    t = F.regexp_replace(F.col(text_col), r"[0-9a-f]{8,}", mask)
    t = F.regexp_replace(t, r"\d+", mask)
    t = F.regexp_replace(t, r"'[^']*'", mask)
    return (
        df.select(t.alias("template"), F.col(text_col))
        .groupBy("template")
        .agg(
            F.count("*").alias("n"),
            F.min(text_col).alias("example"),
        )
    )


def span_from_attributes(
    df: DataFrame,
    keys: list[str],
    name_col: str = "span_name",
    separator: str = "/",
) -> DataFrame:
    """Span processor ``name.from_attributes``
    (internal/components/components.go:334, contrib spanprocessor):
    rebuild the span name from attribute values joined by
    ``separator``; rows missing ANY listed attribute keep their
    original name (the processor's no-op-on-missing rule).
    Narrow map, codegen'd, zero shuffle.
    """
    parts = [F.col(k) for k in keys]
    missing = None
    for k in keys:
        c = F.col(k).isNull()
        missing = c if missing is None else (missing | c)
    new_name = F.concat_ws(separator, *parts)
    return df.withColumn(
        name_col, F.when(missing, F.col(name_col)).otherwise(new_name)
    )


def span_to_attributes(
    df: DataFrame,
    rules: list[tuple[str, str, str]],
    name_col: str = "span_name",
) -> DataFrame:
    """Span processor ``name.to_attributes``: each rule is
    ``(attr_key, pattern, replacement)``.  The pattern's first capture
    group becomes attribute ``attr_key``, and the span name is
    rewritten with ``replacement`` (which keeps the non-captured
    context and substitutes ``{attr_key}`` for the group) — the
    cardinality-reduction rewrite that turns ``GET /user/123`` into
    ``GET /user/{user_id}``.  Non-matching rows pass through with a
    NULL attribute.  Pure regexp chain — narrow, zero shuffle.
    """
    out = df
    for key, pattern, replacement in rules:
        extracted = F.regexp_extract(F.col(name_col), pattern, 1)
        out = out.withColumn(
            key, F.when(extracted != "", extracted)
        ).withColumn(
            name_col,
            F.when(
                extracted != "",
                F.regexp_replace(F.col(name_col), pattern, replacement),
            ).otherwise(F.col(name_col)),
        )
    return out


def _cm_bucket(d: Column, item: Column, width: int) -> Column:
    """Row-seeded portable CM bucket — ONE definition shared by sketch
    build and point query: the two sides must hash bit-identically or
    every estimate is silently wrong."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(d.cast("string"), F.lit("|"), item)), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )


def count_min_sketch(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build a Count-Min sketch of item frequencies: ``depth`` hash
    rows x ``width`` buckets, each cell the count of items hashing
    there.  THE mergeable fixed-memory frequency summary for 10^12-row
    streams — the sketch is ``depth*width`` cells regardless of
    cardinality, cells add across partitions/days, and any item's
    count is over-estimated by at most the collision mass (never
    under).

    One explode (depth rows per item) + ONE (row, bucket) shuffle with
    map-side partials.  Buckets use the portable md5 hash (same value
    on any engine), seeded per row by prefixing the row index.
    """
    item = F.col(item_col).cast("string")
    rows = F.explode(
        F.sequence(F.lit(0).cast("int"), F.lit(depth - 1).cast("int"))
    ).alias("d")
    hashed = df.select(item.alias("_item"), rows).select(
        "d",
        _cm_bucket(F.col("d"), F.col("_item"), width).alias("bucket"),
    )
    return hashed.groupBy("d", "bucket").agg(F.count("*").alias("c"))


def cm_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimate each item's frequency from a Count-Min sketch: hash the
    item into every sketch row, take the MIN cell — the classic CM
    point query (always >= the true count).  ``items`` is the
    candidate set; the join is keyed on (d, bucket) against the
    fixed-size sketch, which AQE broadcasts (depth*width cells —
    bounded by construction, so the hint-free broadcast is safe here,
    unlike fact-table aggregates).
    """
    item = F.col(item_col).cast("string")
    probes = items.select(
        F.col(item_col),
        F.explode(
            F.sequence(F.lit(0).cast("int"), F.lit(depth - 1).cast("int"))
        ).alias("d"),
    ).select(
        F.col(item_col),
        "d",
        _cm_bucket(F.col("d"), item, width).alias("bucket"),
    )
    return (
        probes.join(sketch, ["d", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cm_count"))
    )


def rate_anomaly_scores(
    df: DataFrame,
    ts_col: str = "ts",
    predicate_sql: str = "true",
    trailing_min: int = 60,
    key_col: str | None = None,
) -> DataFrame:
    """Per-minute event-rate z-scores against a trailing baseline — the
    error-burst detector a telemetry backend runs on count-connector
    output: count matching rows per minute, compare each minute to the
    mean/stddev of the previous ``trailing_min`` minutes (current
    minute EXCLUDED), emit the z-score.

    Two stages: the grouped per-minute count (map-side partials — this
    is the stage that sees 10^12 rows) and a rangeBetween window over
    the AGGREGATED minute series, which is tiny (one row per minute
    [per key]: ~525k rows/year), so the global-order window's single
    reducer is honest, not a scale bug; pass ``key_col`` to partition
    the baseline per service/tenant.  Minutes with an undefined
    baseline (fewer than 2 trailing points, or zero variance) emit a
    NULL z.
    """
    minute = (
        F.floor(F.col(ts_col).cast("timestamp_ltz").cast("long") / 60)
    ).alias("minute_idx")
    keys = ([F.col(key_col)] if key_col else []) + [minute]
    counts = df.groupBy(*keys).agg(
        F.sum(F.expr(predicate_sql).cast("long")).alias("n")
    )
    w = (
        Window.partitionBy(*([key_col] if key_col else []))
        .orderBy("minute_idx")
        .rangeBetween(-trailing_min, -1)
    )
    mean = F.avg("n").over(w)
    sd = F.stddev_samp("n").over(w)
    z = F.when(sd > 0, F.round((F.col("n") - mean) / sd, 4))
    return counts.select(
        *([key_col] if key_col else []),
        "minute_idx",
        "n",
        F.round(mean, 4).alias("baseline_mean"),
        z.alias("z"),
    )


def m4_downsample(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = None,
    key_col: str | None = None,
    bucket_sec: int = 3600,
) -> DataFrame:
    """M4 time-series downsampling: per time bucket keep min / max /
    first / last of the value — the error-free downsampling for line
    charts (every pixel column renders exactly as the full series
    would), and the aggregation signalfx rollups apply before plotting
    10^12-point series.

    ONE grouped pass: min/max are plain aggregates; first/last ride as
    ``min_by/max_by(value, order)`` — no window, no sort, map-side
    partials everywhere.  ``order_col`` must be UNIQUE within a bucket
    (a sequence id); plain timestamps tie on truncation and make
    first/last nondeterministic — pass the stream's unique id.
    """
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    bucket = F.floor(epoch / bucket_sec).alias("bucket_idx")
    order = F.col(order_col) if order_col else epoch
    keys = ([F.col(key_col)] if key_col else []) + [bucket]
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.round(F.min(value_col), 4).alias("v_min"),
        F.round(F.max(value_col), 4).alias("v_max"),
        F.round(F.min_by(value_col, order), 4).alias("v_first"),
        F.round(F.max_by(value_col, order), 4).alias("v_last"),
    )


def fill_time_gaps(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "n",
    key_col: str | None = None,
    step_sec: int = 60,
    fill: str = "zero",
) -> DataFrame:
    """Gap filling for regularized series: emit one row per ``step_sec``
    bucket between each key's first and last observation, with missing
    buckets filled by ``zero`` or ``locf`` (last-observation-carried-
    forward) — what a rate chart needs so an empty minute reads 0, not
    "no data".

    The dense time axis comes from ``sequence(min, max)`` exploded per
    key — O(span/step) rows, generated distributed, never a driver
    loop — left-joined against the observed buckets; LOCF is one
    ``last(value, ignorenulls)`` running window.  Input is expected
    pre-aggregated to at most one row per (key, bucket) (e.g.
    count-connector output).
    """
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    obs = df.select(
        *([F.col(key_col)] if key_col else []),
        F.floor(epoch / step_sec).cast("long").alias("bucket_idx"),
        F.col(value_col).alias("_v"),
    )
    gkeys = [key_col] if key_col else []
    span = obs.groupBy(*gkeys).agg(
        F.min("bucket_idx").alias("_lo"), F.max("bucket_idx").alias("_hi")
    )
    axis = span.select(
        *gkeys,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("bucket_idx"),
    )
    dense = axis.join(obs, gkeys + ["bucket_idx"], "left")
    if fill == "zero":
        out = dense.withColumn("_v", F.coalesce("_v", F.lit(0)))
    elif fill == "locf":
        w = (
            Window.partitionBy(*gkeys)
            .orderBy("bucket_idx")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = dense.withColumn(
            "_v", F.last("_v", ignorenulls=True).over(w)
        )
    else:
        raise ValueError(f"unknown fill mode: {fill}")
    return out.select(
        *gkeys, "bucket_idx", F.col("_v").alias(value_col)
    )


def batch_split(
    df: DataFrame,
    key_col: str,
    order_col: str,
    max_batch: int = 1000,
) -> DataFrame:
    """Batch processor ``send_batch_max_size`` semantics: within each
    key, rows are packed in order into consecutive batches of at most
    ``max_batch`` rows; each row gets its (batch_id, position) — the
    deterministic unit a sink flushes.

    One keyed window (row_number), then pure arithmetic: batch_id =
    (rank-1) div max_batch.  On the conv_id-bucketed layout the window
    shuffle disappears and batching is a per-task scan, exactly how
    the collector batches an in-memory queue.
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    rank = F.row_number().over(w) - 1
    return df.withColumn(
        "batch_id", F.floor(rank / max_batch).cast("long")
    ).withColumn("batch_pos", (rank % max_batch).cast("int"))


def schema_expectations(
    df: DataFrame,
    rules: dict[str, str],
) -> DataFrame:
    """Data-quality expectation audit: each rule is a boolean SQL
    predicate (``name -> expectation``); the audit reports, per rule,
    how many rows violate it and the violation rate — the admission
    gate a pipeline runs before committing a snapshot (the collector's
    config-validation analog, applied to data instead of config).

    ONE pass: every rule is a conditional aggregate (map-side
    partials); output is |rules| rows via stack — never one scan per
    rule.  NULL predicate results count as violations (an expectation
    that cannot be evaluated is not met).
    """
    aggs = [F.count("*").alias("_total")] + [
        F.sum(
            (~F.coalesce(F.expr(pred), F.lit(False))).cast("long")
        ).alias(f"_r{i}")
        for i, pred in enumerate(rules.values())
    ]
    wide = df.agg(*aggs)
    names = list(rules.keys())
    pairs = ", ".join(
        f"'{name}', _r{i}" for i, name in enumerate(names)
    )
    return wide.select(
        F.expr(f"stack({len(names)}, {pairs}) as (rule, violations)"),
        F.col("_total").alias("total"),
    ).withColumn(
        "violation_rate", F.round(F.col("violations") / F.col("total"), 6)
    )


def delta_to_cumulative(
    df: DataFrame,
    series_cols: list[str],
    value_col: str,
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """deltatocumulative processor (the contrib inverse of
    cumulativetodelta, components.go:322 family): re-accumulate delta
    points into a cumulative series — per series identity, the running
    sum of deltas in time order.

    One window per series (single keyed shuffle; shuffle-free when the
    input is already clustered by the series key).  The sum is carried
    in ``decimal(28,6)`` so the accumulation is exact and
    engine-portable — a double running sum's low bits depend on the
    fold order and would not hash-stably compare across engines.
    Ties in ``ts`` are broken by ``order_cols`` so the running prefix
    is total-ordered (the collector keys points by start timestamp +
    identity the same way).
    """
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(ts_col, *(order_cols or []))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        "cumulative",
        F.sum(F.col(value_col).cast("decimal(28,6)")).over(w),
    )


def log_dedup(
    df: DataFrame,
    body_col: str,
    ts_col: str = "ts",
    interval: str = "1 minute",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """logdedup processor (contrib logdedupprocessor semantics): within
    each emit interval, collapse records with identical body (+severity
    or other configured keys) into ONE record carrying first/last
    observed timestamps and the suppressed count.

    Single grouped pass over (tumbling window, body, keys) — hash
    aggregation with map-side partials; no sort, no self-join.  At
    100 TB the output cardinality is bounded by distinct bodies per
    interval, which is the point of the operator.
    """
    keys = extra_keys or []
    return (
        df.groupBy(
            F.window(F.col(ts_col), interval).alias("w"),
            F.col(body_col),
            *keys,
        )
        .agg(
            F.count("*").alias("log_count"),
            F.min(ts_col).alias("first_observed"),
            F.max(ts_col).alias("last_observed"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            body_col,
            *keys,
            "log_count",
            "first_observed",
            "last_observed",
        )
    )


def histogram_quantile(
    buckets: DataFrame,
    q: float,
    keys: list[str],
    le_col: str = "le",
    n_col: str = "n",
    round_digits: int = 4,
) -> DataFrame:
    """Prometheus ``histogram_quantile(q, ...)`` over explicit-bounds
    cumulative buckets (the signalfx dashboard / spanmetrics companion
    of :func:`duration_histogram`): per group, find the first bucket
    whose cumulative count reaches ``rank = q * total`` and linearly
    interpolate within it; a quantile landing in the ``+Inf`` bucket
    clamps to the highest finite bound (Prometheus behavior).

    Pure Catalyst: one collect_list per group (bounded: |buckets| rows
    each, a config constant), sorted in-row, then a closed-form fold —
    no explode-back, no second shuffle.
    """
    le_d = F.when(F.col(le_col) == "+Inf", F.lit(float("inf"))).otherwise(
        F.col(le_col).cast("double")
    )
    g = (
        buckets.withColumn("_le", le_d)
        .groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_le").alias("le"), F.col(n_col).alias("n")))
            ).alias("bs")
        )
    )
    bs = F.col("bs")
    total = F.element_at(bs, -1)["n"]
    rank = F.lit(float(q)) * total.cast("double")
    # first bucket index whose cumulative n >= rank
    idx = F.filter(
        F.transform(bs, lambda s, i: F.struct((s["n"].cast("double") >= rank).alias("hit"), i.alias("i"))),
        lambda s: s["hit"],
    )[0]["i"]
    cur = F.element_at(bs, idx + 1)
    prev_n = F.when(idx > 0, F.element_at(bs, idx)["n"]).otherwise(F.lit(0)).cast("double")
    prev_le = F.when(idx > 0, F.element_at(bs, idx)["le"]).otherwise(F.lit(0.0))
    # +Inf bucket: clamp to highest finite bound (Prometheus rule)
    highest_finite = F.element_at(bs, -2)["le"]
    interp = prev_le + (cur["le"] - prev_le) * (rank - prev_n) / (
        cur["n"].cast("double") - prev_n
    )
    val = F.when(~F.isnull(cur["le"]) & (cur["le"] == float("inf")), highest_finite).otherwise(interp)
    return g.select(
        *keys,
        F.lit(float(q)).alias("q"),
        F.round(val, round_digits).alias("quantile"),
    )


def slo_burn_rate(
    df: DataFrame,
    ok_predicate: str,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    short_window: str = "5 minutes",
    long_window: str = "1 hour",
    objective: float = 0.99,
    round_digits: int = 6,
) -> DataFrame:
    """Multi-window SLO burn-rate detector (the Google SRE-workbook
    alert shape signalfx detectors implement): per key and long
    window, the error-budget burn rate over the long window AND the
    max burn rate of the short windows inside it.  An alert fires only
    when BOTH exceed the threshold — the short window confirms the
    burn is still ongoing, the long one that it is material.

    Burn rate = error_rate / (1 - objective).  TWO grouped passes over
    the same scan (short windows roll up into long ones exactly —
    window sizes are chosen aligned), joined on the long-window key:
    no self-join of raw data, no window-function scan of 10^12 rows.
    """
    keys = keys or []
    ok = F.coalesce(F.expr(ok_predicate), F.lit(False))
    budget = 1.0 - objective
    shorts = (
        df.groupBy(*keys, F.window(ts_col, short_window).alias("sw"))
        .agg(
            F.count("*").alias("n"),
            F.sum((~ok).cast("long")).alias("err"),
        )
        .withColumn(
            "lw_start", F.window(F.col("sw.start"), long_window)["start"]
        )
        .withColumn("sbr", F.col("err") / F.col("n") / F.lit(budget))
    )
    longs = shorts.groupBy(*keys, "lw_start").agg(
        (F.sum("err") / F.sum("n") / F.lit(budget)).alias("long_burn"),
        F.max("sbr").alias("max_short_burn"),
        F.sum("n").alias("n"),
        F.sum("err").alias("errors"),
    )
    return longs.select(
        *keys,
        "lw_start",
        "n",
        "errors",
        F.round("long_burn", round_digits).alias("long_burn"),
        F.round("max_short_burn", round_digits).alias("max_short_burn"),
        (
            (F.col("long_burn") > 1.0) & (F.col("max_short_burn") > 1.0)
        ).alias("burning"),
    )


def counter_rate(
    df: DataFrame,
    series_cols: list[str],
    value_col: str,
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
    round_digits: int = 4,
) -> DataFrame:
    """PromQL ``rate()``/``increase()`` semantics over cumulative
    counters, WITH counter-reset handling — the piece
    ``cumulative_to_delta`` alone misses: when a process restarts the
    cumulative value drops, and the increase since the previous sample
    is the new value itself (the counter restarted from 0), never a
    negative delta (prometheus extrapolation aside, this is the
    collector's cumulativetodelta reset rule).

    One keyed window; ``rate`` is NULL for the first point of a series
    and for zero-width intervals (duplicate timestamps) rather than
    dividing by zero.
    """
    w = Window.partitionBy(*series_cols).orderBy(ts_col, *(order_cols or []))
    v = F.col(value_col).cast("double")
    prev = F.lag(v).over(w)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # first sample of a series: no increase (prometheus emits nothing),
    # NOT the raw value — `otherwise(v)` would fire on NULL prev too
    delta = F.when(prev.isNotNull() & (v >= prev), v - prev).when(
        prev.isNotNull(), v
    )
    dt = (
        F.col(ts_col).cast("timestamp_ltz").cast("double")
        - prev_ts.cast("timestamp_ltz").cast("double")
    )
    return (
        df.withColumn("increase", F.round(delta, round_digits))
        .withColumn(
            "rate",
            F.when(dt > 0, F.round(delta / dt, round_digits)),
        )
        .withColumn("reset", v < prev)
    )


def seasonal_baseline_anomaly(
    df: DataFrame,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    season_unit: str = "hour_of_day",
    round_digits: int = 4,
) -> DataFrame:
    """Historical-anomaly detector (the signalfx "same time yesterday /
    last week" baseline): bucket events into windows, then compare each
    window's count against the mean/stddev of all OTHER windows sharing
    the same seasonal slot (hour-of-day by default) and key.

    Two grouped passes (window counts, then seasonal stats via a
    window function over the tiny per-slot series) — the raw table is
    scanned once; the anomaly surface is |keys| x |slots| x |days|,
    never row-scale.  Leave-one-out mean/std so a burst does not mask
    itself.  z is NULL when fewer than 2 peer windows exist or the
    peers have zero variance.
    """
    keys = keys or []
    slot = {
        "hour_of_day": F.hour(F.col(ts_col)),
        "minute_of_hour": F.minute(F.col(ts_col)),
        "day_of_week": F.dayofweek(F.col(ts_col)),
    }[season_unit]
    win = F.date_trunc("hour", F.col(ts_col))
    counts = df.groupBy(*keys, win.alias("w"), slot.alias("slot")).agg(
        F.count("*").alias("n")
    )
    peers = Window.partitionBy(*keys, "slot")
    cnt = F.count("n").over(peers)
    # leave-one-out mean/std from the sufficient statistics
    s1 = F.sum("n").over(peers)
    s2 = F.sum(F.col("n") * F.col("n")).over(peers)
    m = (s1 - F.col("n")) / (cnt - 1)
    var = (
        (s2 - F.col("n") * F.col("n")) - (cnt - 1) * m * m
    ) / (cnt - 2)
    z = F.when(
        (cnt >= 3) & (var > 0),
        (F.col("n") - m) / F.sqrt(var),
    )
    return counts.select(
        *keys,
        "slot",
        F.col("w").alias("window_start"),
        "n",
        F.round(m, round_digits).alias("baseline_mean"),
        F.round(z, round_digits).alias("z"),
    )


def apdex(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    threshold: float,
) -> DataFrame:
    """Apdex score per key group — the industry-standard satisfaction
    ratio the signalfx backend surfaces over spanmetrics latencies
    (satisfied: v <= T; tolerating: T < v <= 4T; frustrated beyond):
    ``apdex = (satisfied + tolerating/2) / n``.

    ONE grouped pass of conditional aggregates (same plan family as
    span_metrics_red / duration_histogram: map-side partials, no
    self-join per band).  The score is computed from the integer band
    counts — ``(2*satisfied + tolerating) / (2*n)`` in double, rounded
    to 4 — so engines agree bit-for-bit; the raw band counts ride
    along for dashboards that re-weight.
    """
    v = F.col(value_col)
    sat = F.sum(F.when(v <= threshold, 1).otherwise(0)).alias("n_satisfied")
    tol = F.sum(
        F.when((v > threshold) & (v <= 4 * threshold), 1).otherwise(0)
    ).alias("n_tolerating")
    out = df.groupBy(*keys).agg(F.count("*").alias("n_calls"), sat, tol)
    score = (
        (2 * F.col("n_satisfied") + F.col("n_tolerating"))
        / (2.0 * F.col("n_calls"))
    )
    return out.withColumn("apdex", F.round(score, 4))


def rate_limit(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    order_col: str | None = None,
    window_sec: int = 60,
    max_per_window: int = 1,
) -> DataFrame:
    """Throttling / rate-limiting: at most ``max_per_window`` rows per
    key per tumbling ``window_sec`` window; the rest are flagged
    suppressed (the ThrottledLogger shape,
    internal/signalfx-agent/pkg/utils/log.go:60-155, and the
    tail-sampling ``rate_limiting`` policy, generalized from 1/duration
    to N/window).

    The reference throttles relative to the *last emission* (a
    sequential per-key chain); the distributed analog is the tumbling
    window — same guarantee class (<= N per key per window, <= 2N per
    any sliding ``window_sec`` span) but embarrassingly parallel: one
    keyed window ranked by (ts, tiebreak), rank <= N keeps.  For the
    exact last-emission replay on bounded-cardinality keys (log
    messages) see :func:`throttle_exact`.

    Adds ``win_start`` (epoch seconds of the window) and boolean
    ``kept``; drops nothing so the caller can count suppressions.
    """
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    win = (F.floor(epoch / window_sec) * window_sec).cast("long")
    out = df.withColumn("win_start", win)
    order = [F.col(ts_col).asc()] + (
        [F.col(order_col).asc()] if order_col else []
    )
    w = Window.partitionBy(key_col, "win_start").orderBy(*order)
    return out.withColumn(
        "kept", F.row_number().over(w) <= max_per_window
    )


def throttle_exact(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    duration_sec: int = 60,
) -> DataFrame:
    """Exact ThrottledLogger replay (utils/log.go:124-136): per key, a
    row is emitted iff its ts is >= the last *emitted* ts + duration —
    the first row always emits.  The decision chain is inherently
    sequential, so this runs as an in-row left fold over the per-key
    ts-sorted array: state O(rows-per-key), which is fine for the
    reference's use (keys are distinct log MESSAGES — bounded
    cardinality, modest per-key volume).  For unbounded keys use
    :func:`rate_limit`.

    Returns one row per key: (key, n_total, n_kept, first/last kept
    epoch seconds).
    """
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("double")
    per_key = df.groupBy(F.col(key_col).alias("key")).agg(
        F.sort_array(F.collect_list(epoch)).alias("_ts")
    )
    # fold state: (last_emit, n_kept, last_kept); emit when
    # t >= last_emit + duration.
    init = F.struct(
        F.element_at("_ts", 1).alias("last_emit"),
        F.lit(1).cast("long").alias("n_kept"),
        F.element_at("_ts", 1).alias("last_kept"),
    )
    folded = F.aggregate(
        F.slice("_ts", 2, F.greatest(F.size("_ts") - 1, F.lit(0))),
        init,
        lambda acc, t: F.when(
            t >= acc["last_emit"] + duration_sec,
            F.struct(
                t.alias("last_emit"),
                (acc["n_kept"] + 1).alias("n_kept"),
                t.alias("last_kept"),
            ),
        ).otherwise(acc),
    )
    return per_key.select(
        "key",
        F.size("_ts").cast("long").alias("n_total"),
        folded["n_kept"].alias("n_kept"),
        F.element_at("_ts", 1).alias("first_kept_s"),
        folded["last_kept"].alias("last_kept_s"),
    )


def hll_registers(
    df: DataFrame,
    item_col: str,
    group_cols: list[str],
    b: int = 8,
) -> DataFrame:
    """HyperLogLog register table: per group, ``m = 2^b`` max-rho
    registers over the portable md5 hash — the mergeable fixed-memory
    DISTINCT sketch (the scale twin of ``count_distinct`` the same way
    ``count_min_sketch`` twins exact counts: at 10^12 rows the exact
    distinct shuffles every key, the sketch shuffles ``m`` cells per
    group and registers merge across partitions/days with ``max``).

    Hash split: the first ``b/4`` hex chars of ``md5(item)`` pick the
    register, the next 13 (52 bits) feed rho = leading-zeros+1 —
    bit-identical on any engine that has md5, so an oracle can replay
    the registers exactly.  ``F.bin`` has no leading zeros, so
    ``rho = 53 - bitlen(w)`` with the all-zero word pinned to 53.
    """
    if b % 4 != 0:
        raise ValueError("b must be a multiple of 4 (hex-digit aligned)")
    h = F.md5(F.col(item_col).cast("string"))
    idx = F.conv(F.substring(h, 1, b // 4), 16, 10).cast("int")
    w = F.conv(F.substring(h, b // 4 + 1, 13), 16, 10).cast("bigint")
    rho = (
        F.when(w == 0, F.lit(53))
        .otherwise(F.lit(53) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        df.select(*group_cols, idx.alias("reg"), rho.alias("_rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("_rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    b: int = 8,
) -> DataFrame:
    """Distinct-count estimate from an HLL register table: the classic
    Flajolet et al. raw estimate ``alpha_m * m^2 / sum(2^-M_j)`` (empty
    registers contribute 2^0 = 1) with the small-range linear-counting
    correction ``m * ln(m / zeros)`` when ``raw <= 2.5m`` and empty
    registers remain.  All terms are exact powers of two except the
    final division/log, so engines agree to well under the rounding.
    """
    m = 1 << b
    alpha_m2 = 0.7213 / (1.0 + 1.079 / m) * m * m
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").alias("_occupied"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_sp"),
    )
    zeros = (F.lit(m) - F.col("_occupied")).cast("int")
    raw = F.lit(alpha_m2) / (F.col("_sp") + zeros.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        zeros.alias("zero_registers"),
        F.round(est, 4).alias("est_distinct"),
    )


def exemplar_attach(
    df: DataFrame,
    group_cols: list[str],
    bounds: tuple[float, ...],
    value_col: str = "value",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_sec: int = 60,
) -> DataFrame:
    """OTLP histogram exemplars (the sampled measurement with trace
    context the signalfx backend uses for APM metric->trace
    correlation): per (group, tumbling window, explicit-bounds
    bucket), keep the bucket count plus ONE exemplar — the max-value
    row, ties broken by min id so the pick is deterministic on any
    engine.

    One ranked window and one grouped aggregate over the SAME
    (group, window, bucket) keys, so the rank's exchange is reused by
    the aggregate — a single shuffle at datapoint volume, and the
    output is bucket-cardinality (bounded), carrying (exemplar_id,
    exemplar_value) as the trace link.
    """
    idx = F.lit(len(bounds))
    for i in reversed(range(len(bounds))):
        idx = F.when(F.col(value_col) <= bounds[i], F.lit(i)).otherwise(idx)
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    win = (F.floor(epoch / window_sec) * window_sec).cast("long")
    bucketed = df.select(
        *group_cols,
        win.alias("win_start"),
        idx.cast("int").alias("bucket_idx"),
        F.col(value_col).alias("_v"),
        F.col(id_col).alias("_id"),
    )
    w = Window.partitionBy(*group_cols, "win_start", "bucket_idx").orderBy(
        F.col("_v").desc(), F.col("_id").asc()
    )
    ranked = bucketed.withColumn("_rn", F.row_number().over(w))
    return ranked.groupBy(*group_cols, "win_start", "bucket_idx").agg(
        F.count("*").alias("n"),
        F.max(F.when(F.col("_rn") == 1, F.col("_id"))).alias(
            "exemplar_id"
        ),
        F.max(F.when(F.col("_rn") == 1, F.col("_v"))).alias(
            "exemplar_value"
        ),
    )


def exp_histogram_quantile(
    buckets: DataFrame,
    group_cols: list[str],
    q: float = 0.95,
    scale: int = 2,
    idx_col: str = "bucket_idx",
    count_col: str = "bucket_count",
    total_col: str = "pos_count",
) -> DataFrame:
    """Quantile estimate from ExponentialHistogram buckets (the
    native-histogram companion of ``histogram_quantile`` over explicit
    bounds): bucket ``i`` at scale ``s`` covers ``(2^(i*2^-s),
    2^((i+1)*2^-s)]``; rank = q * positive count, walk the cumulative
    counts to the covering bucket, interpolate linearly inside it
    (the Prometheus convention).

    Runs on the bucket table (group x occupied buckets — tiny by
    construction): one window cumsum sharing the group key, then pure
    arithmetic.  ``i * 2^-scale`` is a dyadic rational, exact in
    float64, so both the bounds and the rank replay bit-identically
    on any engine; the interpolation is rounded(4) only against
    division drift.
    """
    f = 2.0 ** (-scale)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(count_col).over(w).cast("double")
    df = buckets.withColumn("_cum", cum)
    rank = F.lit(q) * F.col(total_col).cast("double")
    prev = F.col("_cum") - F.col(count_col).cast("double")
    lower = F.pow(F.lit(2.0), F.col(idx_col).cast("double") * f)
    upper = F.pow(F.lit(2.0), (F.col(idx_col) + 1).cast("double") * f)
    est = lower + (upper - lower) * (rank - prev) / F.col(
        count_col
    ).cast("double")
    return (
        df.filter((F.col("_cum") >= rank) & (prev < rank))
        .select(
            *group_cols,
            F.lit(q).alias("q"),
            F.round(est, 4).alias("quantile"),
        )
    )


def semconv_migrate(
    df: DataFrame,
    map_col: str,
    steps: list[tuple[int, dict[str, str]]],
    from_version_col: str | None = None,
) -> DataFrame:
    """Semantic-convention schema migration (the OTel schemaprocessor
    shape: collector configs pin a schema URL and the processor
    upgrades attribute names version by version): fold the ordered
    rename steps over a map column — each step rewrites keys through
    its rename table, values untouched, unknown keys pass through.

    When ``from_version_col`` is given, a row only applies steps
    NEWER than its recorded source version (mixed-version sources
    upgrading to one target — the processor's actual job).  Pure
    Catalyst: one ``map_from_entries(transform(map_entries(...)))``
    chain per step, no shuffle, no UDF.
    """
    def make_renamer(renames):
        # closure factory: F.transform inspects lambda arity, so the
        # callable must take exactly ONE parameter (a default arg would
        # receive the element index instead of the captured dict)
        def rename_entry(e):
            k = e["key"]
            new = k
            for old, nk in sorted(renames.items()):
                new = F.when(k == old, F.lit(nk)).otherwise(new)
            return F.struct(new.alias("key"), e["value"].alias("value"))

        return rename_entry

    out = F.col(map_col)
    for version, renames in steps:
        stepped = F.map_from_entries(
            F.transform(F.map_entries(out), make_renamer(renames))
        )
        if from_version_col is not None:
            out = F.when(
                F.col(from_version_col) < version, stepped
            ).otherwise(out)
        else:
            out = stepped
    return df.withColumn(map_col, out)


def rollup_by_type(
    df: DataFrame,
    group_cols: list[str],
    type_col: str = "mtype",
    value_col: str = "value",
) -> DataFrame:
    """Type-aware rollup selection (the signalfx backend's default
    rollup per metric type, which the signalfx exporter's datapoint
    types feed — components.go:312): gauges average within the
    window, counters sum, cumulative counters roll up as max-min
    (the window's increase).

    ONE grouped pass: every rollup is a conditional aggregate over
    the same keys, so adding types never adds shuffles; the emitted
    ``rollup`` column records which function produced the value.
    """
    v = F.col(value_col).cast("double")
    is_g = F.col(type_col) == "gauge"
    is_c = F.col(type_col) == "counter"
    is_cc = F.col(type_col) == "cumulative"
    agg = df.groupBy(*group_cols, type_col).agg(
        F.count("*").alias("n"),
        F.avg(F.when(is_g, v)).alias("_avg"),
        F.sum(F.when(is_c, v)).alias("_sum"),
        (
            F.max(F.when(is_cc, v)) - F.min(F.when(is_cc, v))
        ).alias("_delta"),
    )
    rollup = (
        F.when(is_g, F.lit("average"))
        .when(is_c, F.lit("sum"))
        .when(is_cc, F.lit("delta"))
        .otherwise(F.lit("latest"))
    )
    value = (
        F.when(is_g, F.col("_avg"))
        .when(is_c, F.col("_sum"))
        .when(is_cc, F.col("_delta"))
    )
    return agg.select(
        *group_cols,
        type_col,
        "n",
        rollup.alias("rollup"),
        F.round(value, 6).alias("value"),
    )


def labels_to_props_tags(
    df: DataFrame, labels_col: str = "labels"
) -> DataFrame:
    """k8s label set -> SignalFx properties and tags (the smart
    agent's PropsAndTagsFromLabels, internal/signalfx-agent/pkg/
    monitors/kubernetes/utils/labels.go:10-36): label keys sanitize
    ``.`` and ``/`` to ``_``; labels WITHOUT a value become TAGS,
    valued labels become PROPERTIES.

    One ``map_entries`` explode — row growth bounded by label count;
    output carries (sanitized_key, kind, value) per label with value
    NULL for tags (matching the reference's props/tags split).
    """
    exploded = df.select(
        "*", F.explode(F.map_entries(F.col(labels_col))).alias("_e")
    )
    key = F.col("_e")["key"]
    val = F.col("_e")["value"]
    sanitized = F.translate(key, "./", "__")
    kind = F.when(val == "", F.lit("tag")).otherwise(F.lit("property"))
    return exploded.select(
        *[c for c in df.columns if c != labels_col],
        sanitized.alias("key"),
        kind.alias("kind"),
        F.when(val != "", val).alias("value"),
    )


def flatten_struct_dotpath(df: DataFrame, sep: str = ".") -> DataFrame:
    """Flatten nested struct columns into dot-path top-level columns
    — the log-body / OTLP-resource flatten a columnar sink schema
    wants (nested bodies become individually prunable, filterable
    parquet columns instead of one opaque blob).

    Schema-driven recursion over ``df.schema``: every leaf becomes
    one aliased column reference, so the whole operator is a single
    Project — zero shuffle, zero UDF, and column pruning still
    reaches the scan for any subset of the flattened output.
    """
    from pyspark.sql.types import StructType

    cols: list = []

    def walk(path: list[str], dtype) -> None:
        if isinstance(dtype, StructType):
            for f in dtype.fields:
                walk(path + [f.name], f.dataType)
        else:
            ref = ".".join(f"`{p}`" for p in path)
            cols.append(F.col(ref).alias(sep.join(path)))

    for field in df.schema.fields:
        walk([field.name], field.dataType)
    return df.select(*cols)


def staleness_segments(
    df: DataFrame,
    series_cols: list[str],
    order_col: str,
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Prometheus staleness-marker segmentation: a NaN sample marks
    the END of a series segment (the scrape protocol's explicit
    "series went away" signal; the PRW receiver counts these as
    NAN_samples).  Non-marker points group into segments split at
    the markers — segment id = running marker count — and each
    segment reports its point count and time span.

    One keyed cumulative window + one grouped aggregate over the same
    series keys (shared exchange); markers themselves are excluded
    from the output, their count is the audit column upstream.
    """
    marker = F.isnan(F.col(value_col)).cast("long")
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seg = F.sum(marker).over(w)
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("double")
    pts = df.withColumn("_seg", seg).filter(~F.isnan(F.col(value_col)))
    return pts.groupBy(*series_cols, F.col("_seg").alias("segment")).agg(
        F.count("*").alias("n_points"),
        F.round(F.max(epoch) - F.min(epoch), 3).alias("duration_s"),
    )


def uptime_percent(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
    expected_interval_s: float = 60.0,
    gap_factor: float = 2.0,
) -> DataFrame:
    """Uptime percentage from heartbeat gaps (the availability number
    a dead-man-switch detector reports): a gap between consecutive
    datapoints longer than ``gap_factor * expected_interval_s``
    counts as downtime of ``gap - expected_interval_s`` (the series
    was up for one interval after its last point, down for the rest).

    One keyed lag window + one grouped aggregate over the same series
    keys (shared exchange); decimal accumulation of gap seconds so
    the downtime sum replays identically on any engine.
    """
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("double")
    order = [F.col(c) for c in (order_cols or [ts_col])]
    w = Window.partitionBy(*series_cols).orderBy(*order)
    gap = epoch - F.lag(epoch).over(w)
    down = F.when(
        gap > gap_factor * expected_interval_s,
        (gap - expected_interval_s).cast("decimal(28,6)"),
    ).otherwise(F.lit(0).cast("decimal(28,6)"))
    pts = df.select(*series_cols, epoch.alias("_e"), down.alias("_d"))
    return pts.groupBy(*series_cols).agg(
        F.count("*").alias("n_points"),
        F.round((F.max("_e") - F.min("_e")), 3).alias("span_s"),
        F.round(F.sum("_d").cast("double"), 3).alias("downtime_s"),
        F.round(
            F.when(
                F.max("_e") > F.min("_e"),
                1.0
                - F.sum("_d").cast("double")
                / (F.max("_e") - F.min("_e")),
            ).otherwise(F.lit(1.0)),
            6,
        ).alias("uptime_pct"),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Winsorize a value column to per-group percentile bounds (the
    robust-scaling clamp before feature extraction / detector
    training — outliers saturate instead of dominating).

    Exact interpolated percentiles (engine-reproducible, same policy
    as ``summary_quantiles``) from ONE grouped aggregate, joined back
    hint-free — group_cols can be unbounded-cardinality, so AQE picks
    broadcast only when the bounds side actually fits; the clamp
    itself is a pure Project.  Output keeps the original value beside
    the clamped one plus which side clipped, so the pass is auditable.
    """
    v = F.col(value_col).cast("double")
    bounds = df.groupBy(*group_cols).agg(
        F.percentile(v, F.lit(lo)).alias("_lo"),
        F.percentile(v, F.lit(hi)).alias("_hi"),
    )
    j = df.join(bounds, group_cols)
    clamped = F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    side = (
        F.when(v < F.col("_lo"), F.lit("lo"))
        .when(v > F.col("_hi"), F.lit("hi"))
    )
    return j.select(
        *df.columns,
        F.round(F.col("_lo"), 6).alias("lo_bound"),
        F.round(F.col("_hi"), 6).alias("hi_bound"),
        F.round(clamped, 6).alias("clamped"),
        side.alias("clipped"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: float = 3.0,
) -> DataFrame:
    """Robust outlier detection via median absolute deviation (the
    detector that survives the outliers it hunts — mean/stddev
    z-scores get dragged by the very anomalies they should flag):
    flag points with ``|x - median| > k * 1.4826 * MAD``.

    Two grouped percentile passes (median, then median of absolute
    deviations) — each a map-side-combining aggregate — and hint-free
    joins back: group_cols can be unbounded-cardinality, so no static
    BroadcastExchange is forced; AQE broadcasts the per-group stats
    only when they fit, and otherwise the join shuffles on the same
    group key the aggregates already hashed on.
    """
    v = F.col(value_col).cast("double")
    med = df.groupBy(*group_cols).agg(
        F.percentile(v, F.lit(0.5)).alias("_med")
    )
    dev = df.join(med, group_cols).withColumn(
        "_ad", F.abs(v - F.col("_med"))
    )
    mad = dev.groupBy(*group_cols).agg(
        F.percentile(F.col("_ad"), F.lit(0.5)).alias("_mad"),
        F.max("_med").alias("_med"),
    )
    scored = df.join(mad, group_cols)
    thresh = F.lit(k * 1.4826) * F.col("_mad")
    return scored.select(
        *df.columns,
        F.round(F.col("_med"), 6).alias("median"),
        F.round(F.col("_mad"), 6).alias("mad"),
        (F.abs(v - F.col("_med")) > thresh).alias("outlier"),
    )


def heatmap_grid(
    df: DataFrame,
    bounds: tuple[float, ...],
    time_col: str = "ts",
    value_col: str = "value",
    window_sec: int = 3600,
) -> DataFrame:
    """Latency-heatmap grid (the time x bucket density a heatmap
    panel renders): per (tumbling window, explicit-bounds bucket),
    the count and its fraction of the window's total — fraction from
    ONE integer division so it replays exactly.

    One grouped pass for cells; the per-window totals come from a
    window sum OVER THE CELL TABLE (windows x buckets rows), sharing
    the window-key exchange — raw points shuffle once.
    """
    idx = F.lit(len(bounds))
    for i in reversed(range(len(bounds))):
        idx = F.when(
            F.col(value_col) <= bounds[i], F.lit(i)
        ).otherwise(idx)
    epoch = F.col(time_col).cast("timestamp_ltz").cast("long")
    win = (F.floor(epoch / window_sec) * window_sec).cast("long")
    cells = df.groupBy(
        win.alias("win_start"), idx.cast("int").alias("bucket_idx")
    ).agg(F.count("*").alias("n"))
    wt = Window.partitionBy("win_start")
    total = F.sum("n").over(wt)
    return cells.select(
        "win_start",
        "bucket_idx",
        "n",
        total.alias("win_total"),
        F.round(F.col("n").cast("double") / total, 6).alias("fraction"),
    )


def interarrival_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Inter-arrival-time statistics per series (the burstiness
    profile: CV ~ 1 is Poisson-like, >> 1 bursty, << 1 metronomic —
    what a capacity planner reads before sizing queues): mean gap,
    population std, coefficient of variation.

    Gaps come from one keyed lag window; moments from decimal gap /
    gap-squared sums (exact at micro precision, fold-order free); the
    final mean/std/cv are single double operations.
    """
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("double")
    order = [F.col(c) for c in (order_cols or [ts_col])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # decimal(18,6): the square must stay inside decimal(38,12) on
    # BOTH engines (28,6 squared overflows duckdb's 38-digit cap)
    gap = (epoch - F.lag(epoch).over(w)).cast("decimal(18,6)")
    pts = df.select(*key_cols, gap.alias("_g")).filter(
        F.col("_g").isNotNull()
    )
    g = pts.groupBy(*key_cols).agg(
        F.count("*").alias("n_gaps"),
        F.sum("_g").alias("_sg"),
        F.sum(F.col("_g") * F.col("_g")).alias("_sgg"),
    )
    n = F.col("n_gaps").cast("double")
    mean = F.col("_sg").cast("double") / n
    var = F.col("_sgg").cast("double") / n - (
        F.col("_sg").cast("double") / n
    ) * (F.col("_sg").cast("double") / n)
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    return g.select(
        *key_cols,
        "n_gaps",
        F.round(mean, 6).alias("mean_gap_s"),
        F.round(std, 6).alias("std_gap_s"),
        F.round(F.when(mean > 0, std / mean), 6).alias("cv"),
    )


def template_drift(
    df: DataFrame,
    period_col: str,
    text_col: str = "text",
    mask: str = "<*>",
) -> DataFrame:
    """Log-template distribution drift between two periods (the
    "did the error mix change after the deploy" question): per
    template, its share of each period's lines and the absolute share
    delta — the per-template terms of the L1 distance between the two
    template distributions.

    Masking is ``log_templates``' regexp chain; counts aggregate in
    ONE grouped pass with per-period conditional sums, shares divide
    by broadcast period totals.  Templates absent from a period count
    0 there (that IS drift).
    """
    t = F.regexp_replace(F.col(text_col), r"[0-9a-f]{8,}", mask)
    t = F.regexp_replace(t, r"\d+", mask)
    t = F.regexp_replace(t, r"'[^']*'", mask)
    p = F.col(period_col)
    per = df.select(t.alias("template"), p.alias("_p"))
    counts = per.groupBy("template").agg(
        F.sum((F.col("_p") == "a").cast("long")).alias("n_a"),
        F.sum((F.col("_p") == "b").cast("long")).alias("n_b"),
    )
    totals = per.agg(
        F.sum((F.col("_p") == "a").cast("long")).alias("_ta"),
        F.sum((F.col("_p") == "b").cast("long")).alias("_tb"),
    )
    j = counts.crossJoin(F.broadcast(totals))
    share_a = F.col("n_a").cast("double") / F.col("_ta")
    share_b = F.col("n_b").cast("double") / F.col("_tb")
    return j.select(
        "template",
        "n_a",
        "n_b",
        F.round(share_a, 6).alias("share_a"),
        F.round(share_b, 6).alias("share_b"),
        F.round(F.abs(share_a - share_b), 6).alias("share_delta"),
    )


def ht_estimate(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    p: float = 0.1,
    buckets: int = 10_000,
) -> DataFrame:
    """Horvitz-Thompson count estimation from the probabilistic
    sampler's output (closing the loop on ``probabilistic_sample``:
    downstream of a p-sampled stream, true per-group volumes are
    recovered as n_sampled / p): per group, the sampled count, the HT
    estimate, the exact count, and the relative error.

    Uses the SAME portable md5 bucket as the sampler, so the
    estimate is reproducible; exact and sampled counts come from ONE
    conditional-aggregate pass.
    """
    bucket = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % buckets
    )
    sampled = (bucket < int(p * buckets)).cast("long")
    g = df.groupBy(*group_cols).agg(
        F.count("*").alias("n_exact"),
        F.sum(sampled).alias("n_sampled"),
    )
    est = F.col("n_sampled").cast("double") / F.lit(p)
    return g.select(
        *group_cols,
        "n_exact",
        "n_sampled",
        F.round(est, 3).alias("n_estimated"),
        F.round(
            F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6
        ).alias("rel_error"),
    )


def cardinality_cap(
    df: DataFrame,
    metric_col: str,
    series_col: str,
    ts_col: str = "ts",
    cap: int = 3,
) -> DataFrame:
    """Per-metric series-cardinality cap (the MTS limit the signalfx
    backend enforces and the agent's dimension-explosion guard
    anticipates): only the first ``cap`` DISTINCT series per metric —
    by first-seen time, ties by series key — keep reporting; later
    series drop, and the drop is COUNTED per metric, never silent.

    First-seen per series is one keyed aggregate; ranking runs over
    the distinct-series table (bounded by true cardinality, not
    datapoint volume); datapoints then semi-join the kept set — at
    scale AQE broadcasts kept/overflow series lists.
    """
    from pyspark.sql.window import Window

    first_seen = df.groupBy(metric_col, series_col).agg(
        F.min(ts_col).alias("_fs"), F.count("*").alias("_n")
    )
    w = Window.partitionBy(metric_col).orderBy("_fs", series_col)
    ranked = first_seen.withColumn("_rk", F.row_number().over(w))
    return ranked.groupBy(metric_col).agg(
        F.count("*").alias("n_series"),
        F.sum((F.col("_rk") <= cap).cast("long")).alias("n_kept"),
        F.sum(
            F.when(F.col("_rk") <= cap, F.col("_n")).otherwise(0)
        ).alias("points_kept"),
        F.sum(
            F.when(F.col("_rk") > cap, F.col("_n")).otherwise(0)
        ).alias("points_dropped"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("_rk") <= cap, F.col(series_col))
            )
        ).alias("kept_series"),
    )


def ingest_lag_percentiles(
    df: DataFrame,
    group_cols: list[str],
    event_ts_col: str = "ts",
    proc_ts_col: str = "proc_ts",
) -> DataFrame:
    """Ingest-freshness audit (event-time vs processing-time lag —
    the dashboard that catches a backlogged forwarder before its
    data goes stale): per group, exact interpolated p50/p95/p99 and
    max of the lag seconds.

    One grouped pass (``percentile`` is a single aggregate taking an
    array of quantiles); lag arithmetic is exact epoch subtraction.
    """
    lag = (
        F.col(proc_ts_col).cast("timestamp_ltz").cast("double")
        - F.col(event_ts_col).cast("timestamp_ltz").cast("double")
    )
    pcts = F.percentile(lag, F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)))
    g = df.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        pcts.alias("_q"),
        F.max(lag).alias("_mx"),
    )
    return g.select(
        *group_cols,
        "n",
        F.round(F.element_at("_q", 1), 6).alias("p50_lag_s"),
        F.round(F.element_at("_q", 2), 6).alias("p95_lag_s"),
        F.round(F.element_at("_q", 3), 6).alias("p99_lag_s"),
        F.round(F.col("_mx"), 6).alias("max_lag_s"),
    )


def late_data_audit(
    df: DataFrame,
    event_ts_col: str = "ts",
    proc_ts_col: str = "proc_ts",
    window_sec: int = 60,
    watermarks: tuple[int, ...] = (0, 60, 300),
) -> DataFrame:
    """Watermark-choice audit (run BEFORE picking a streaming
    watermark: at delay W, how many rows would arrive after their
    window closed and be dropped?): a row is late for watermark W iff
    ``proc_ts > window_end + W``.

    One conditional-aggregate pass over the whole table — every
    candidate watermark is a column, adding candidates never adds
    scans; integer epoch math throughout.
    """
    ev = F.col(event_ts_col).cast("timestamp_ltz").cast("long")
    pr = F.col(proc_ts_col).cast("timestamp_ltz").cast("long")
    win_end = (F.floor(ev / window_sec) + 1) * window_sec
    total = F.count("*")
    aggs = [total.alias("n_total")]
    for w in watermarks:
        aggs.append(
            F.sum((pr > win_end + w).cast("long")).alias(f"late_w{w}")
        )
    g = df.agg(*aggs)
    stacked = []
    for w in watermarks:
        stacked += [F.lit(w), F.col(f"late_w{w}")]
    return g.select(
        "n_total",
        F.stack(F.lit(len(watermarks)), *stacked).alias(
            "watermark_s", "n_late"
        ),
    ).select(
        "watermark_s",
        "n_late",
        "n_total",
        F.round(
            F.col("n_late").cast("double") / F.col("n_total"), 6
        ).alias("late_share"),
    )


def time_weighted_avg(
    df: DataFrame,
    series_cols: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Time-weighted average of an irregularly-sampled gauge (the
    rollup a plain AVG silently gets wrong: a value that held for an
    hour must weigh more than a blip — signalfx gauge rollups over
    uneven samples are time-weighted for exactly this reason):
    ``TWA = sum(v_i * (t_{i+1} - t_i)) / (t_last - t_first)``, each
    sample weighted by how long it was current (last sample carries
    no weight).

    One keyed lead window + one grouped aggregate sharing the series
    exchange; value x duration products accumulate in decimal so the
    sum is fold-order exact.  The plain mean rides along to expose
    the bias.
    """
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("double")
    order = [F.col(c) for c in (order_cols or [ts_col])]
    w = Window.partitionBy(*series_cols).orderBy(*order)
    nxt = F.lead(epoch).over(w)
    dt = (nxt - epoch).cast("decimal(18,6)")
    v = F.col(value_col).cast("decimal(19,6)")
    pts = df.select(
        *series_cols,
        epoch.alias("_e"),
        v.alias("_vd"),
        (v * dt).alias("_vdt"),
    )
    g = pts.groupBy(*series_cols).agg(
        F.count("*").alias("n"),
        F.sum("_vdt").alias("_ws"),
        (F.max("_e") - F.min("_e")).alias("_span"),
        # decimal sum / count, not avg(double): fold-order exact
        (F.sum("_vd").cast("double") / F.count("*")).alias("_plain"),
    )
    return g.select(
        *series_cols,
        "n",
        F.round(F.col("_span"), 3).alias("span_s"),
        F.round(
            F.when(
                F.col("_span") > 0,
                F.col("_ws").cast("double") / F.col("_span"),
            ),
            6,
        ).alias("twa"),
        F.round(F.col("_plain"), 6).alias("plain_avg"),
    )


def hll_merge(
    registers: DataFrame,
    b: int = 8,
) -> DataFrame:
    """Merge HLL register tables into ONE global sketch (the property
    that makes HLL the 10^12-scale distinct structure: registers
    max-combine across groups / days / shards with no rescan):
    drops the group keys, keeps per-register max rho.

    Output feeds :func:`hll_estimate` under a constant scope key —
    merging per-group sketches MUST equal sketching the union
    directly (max is associative/commutative), which the registry
    entry cross-checks against an oracle that builds the global
    sketch from scratch.
    """
    return (
        registers.groupBy("reg")
        .agg(F.max("rho").alias("rho"))
        .withColumn("scope", F.lit("all"))
    )


def hourly_latency_bands(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    qs: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """Latency bands over time (the p50/p95 ribbons every latency
    dashboard draws): exact interpolated percentiles per hour bucket,
    plus count — ONE grouped pass, the percentile aggregate takes all
    quantiles at once.
    """
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    hour = (F.floor(epoch / 3600) * 3600).cast("long")
    v = F.col(value_col).cast("double")
    pcts = F.percentile(v, F.array(*[F.lit(q) for q in qs]))
    g = df.groupBy(hour.alias("hour_start")).agg(
        F.count("*").alias("n"), pcts.alias("_q")
    )
    cols = [
        F.round(F.element_at("_q", i + 1), 6).alias(
            f"p{int(q * 100)}"
        )
        for i, q in enumerate(qs)
    ]
    return g.select("hour_start", "n", *cols)


def forward_fill(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str = "value",
) -> DataFrame:
    """Forward-fill imputation (gap repair for gauge series: a NULL
    sample reads as "still the last value", the standard dashboard
    semantics): per series, the last non-NULL value at or before each
    point, plus flags for filled rows and leading NULLs nothing can
    fill.

    ONE ``last_value(ignorenulls)`` window per series — no self-join,
    no fold; rows before the first observation stay NULL (honest:
    inventing a value there is extrapolation, not fill).
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last(F.col(value_col), ignorenulls=True).over(w)
    return df.select(
        *key_cols,
        order_col,
        F.col(value_col).alias("raw"),
        carried.alias("filled"),
        (F.col(value_col).isNull() & carried.isNotNull()).alias(
            "was_filled"
        ),
        carried.isNull().alias("leading_gap"),
    )


def payload_size_histogram(
    df: DataFrame,
    size_col: "F.Column | str",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Payload-size histogram in power-of-two buckets (the wire/
    storage-sizing view: batch limits and row-group budgets are set
    off this): bucket = next power of two >= size (integer
    bit-length, no float log2 — same policy as
    ``length_bucket_batches``), with counts and byte totals per
    bucket.
    """
    s = F.col(size_col) if isinstance(size_col, str) else size_col
    keys = group_cols or []
    base = df.select(*keys, s.cast("long").alias("_sz"))
    bucket = F.when(F.col("_sz") <= 1, F.lit(1)).otherwise(
        F.expr("shiftleft(1, length(bin(_sz - 1)))")
    )
    base = base.withColumn("bucket", bucket.cast("long"))
    return base.groupBy(*keys, "bucket").agg(
        F.count("*").alias("n"),
        F.sum("_sz").alias("total_bytes"),
    )


def fk_orphan_audit(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    fact_name: str = "facts",
    dim_name: str = "dim",
) -> DataFrame:
    """Referential-integrity audit (FK orphan rates BOTH ways: fact
    rows whose key is missing from the dimension, and dimension
    entries no fact ever references — the former breaks joins, the
    latter is dead weight): one full-outer join of the two collapsed
    key tables.

    Both sides aggregate to (key, count) first, so the join touches
    distinct keys only; output is two rows — one per direction —
    with counts and rates.
    """
    fk = facts.groupBy(F.col(key_col).alias("_k")).agg(
        F.count("*").alias("_nf")
    )
    dk = dim.groupBy(F.col(key_col).alias("_k")).agg(
        F.count("*").alias("_nd")
    )
    j = fk.join(dk, "_k", "full_outer")
    g = j.agg(
        F.sum("_nf").alias("_fact_rows"),
        F.sum(F.when(F.col("_nd").isNull(), F.col("_nf"))).alias(
            "_orphan_fact_rows"
        ),
        F.count(F.when(F.col("_nd").isNotNull(), 1)).alias("_dim_keys_all"),
        F.sum(
            (F.col("_nd").isNotNull() & F.col("_nf").isNull()).cast("long")
        ).alias("_unused_dim_keys"),
    )
    side1 = g.select(
        F.lit(f"{fact_name}_missing_{dim_name}").alias("direction"),
        F.coalesce("_orphan_fact_rows", F.lit(0)).alias("n_orphans"),
        F.col("_fact_rows").alias("n_total"),
        F.round(
            F.coalesce("_orphan_fact_rows", F.lit(0)).cast("double")
            / F.col("_fact_rows"),
            6,
        ).alias("orphan_rate"),
    )
    side2 = g.select(
        F.lit(f"{dim_name}_unreferenced").alias("direction"),
        F.col("_unused_dim_keys").alias("n_orphans"),
        F.col("_dim_keys_all").alias("n_total"),
        F.round(
            F.col("_unused_dim_keys").cast("double")
            / F.col("_dim_keys_all"),
            6,
        ).alias("orphan_rate"),
    )
    return side1.unionByName(side2)


def ingestion_completeness(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Ingestion-calendar completeness (did every expected day land? —
    the data-ops SLA behind "is yesterday's partition there"): per
    source, distinct active days vs the day span between its first
    and last activity, plus the missing-day count.

    Distinct days come from a (source, day) dedup — bounded by
    sources x days, never event volume; everything after is
    arithmetic on that tiny table.
    """
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    day = F.floor(epoch / 86400).cast("long")
    days = df.select(F.col(group_col), day.alias("_d")).distinct()
    g = days.groupBy(group_col).agg(
        F.count("*").alias("active_days"),
        F.min("_d").alias("_lo"),
        F.max("_d").alias("_hi"),
    )
    span = F.col("_hi") - F.col("_lo") + 1
    return g.select(
        group_col,
        "active_days",
        span.alias("span_days"),
        (span - F.col("active_days")).alias("missing_days"),
        F.round(
            F.col("active_days").cast("double") / span, 6
        ).alias("completeness"),
    )


def concurrency_curve(
    df: DataFrame,
    group_cols: list[str],
    start_col: str,
    dur_col: str,
    order_col: str,
) -> DataFrame:
    """Concurrency from interval sweep (how many requests were in
    flight? — Little's-law L measured directly, not inferred):
    each [start, start+dur) interval explodes to a +1 and a -1
    boundary event; the ordered cumulative sum IS the concurrency
    curve, and per group we report its max and its time-weighted
    mean (area under the curve / span).

    The classic sweep-line as a dataflow: one explode (2 rows per
    interval), one keyed window cumsum with a deterministic boundary
    order (time, then -1 before +1 at ties — an interval ending
    exactly when another starts does not overlap it), one grouped
    pass.  Area accumulates in decimal.
    """
    start = F.col(start_col).cast("double")
    end = start + F.col(dur_col).cast("double")
    bounds = df.select(
        *group_cols,
        F.col(order_col).alias("_oid"),
        F.explode(
            F.array(
                F.struct(
                    start.alias("t"), F.lit(1).alias("d")
                ),
                F.struct(end.alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("_b"),
    ).select(
        *group_cols,
        "_oid",
        F.col("_b")["t"].alias("_t"),
        F.col("_b")["d"].alias("_d"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("_t"), F.col("_d"), F.col("_oid"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wl = Window.partitionBy(*group_cols).orderBy(
        F.col("_t"), F.col("_d"), F.col("_oid")
    )
    cur = F.sum("_d").over(w)
    nxt_t = F.lead("_t").over(wl)
    seg = bounds.select(
        *group_cols,
        cur.alias("_c"),
        (
            (F.coalesce(nxt_t, F.col("_t")) - F.col("_t"))
            .cast("decimal(18,6)")
        ).alias("_dt"),
    )
    g = seg.groupBy(*group_cols).agg(
        F.max("_c").alias("max_concurrency"),
        F.sum(
            F.col("_c").cast("decimal(19,6)") * F.col("_dt")
        ).alias("_area"),
        F.sum("_dt").alias("_span"),
    )
    return g.select(
        *group_cols,
        "max_concurrency",
        F.round(
            F.when(
                F.col("_span") > 0,
                F.col("_area").cast("double")
                / F.col("_span").cast("double"),
            ),
            6,
        ).alias("mean_concurrency"),
    )


def p95_trend(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    week_sec: int = 604800,
) -> DataFrame:
    """Weekly p95 trend (is latency regressing? — the percentile
    ribbon's week-over-week derivative): per (group, week), the exact
    p95 plus its delta vs the group's previous week.

    Percentiles aggregate per (group, week); the lag window runs over
    that tiny table and shares the group key.  First weeks report a
    NULL delta (no baseline, not zero).
    """
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    week = F.floor(epoch / week_sec).cast("long")
    per = df.groupBy(*group_cols, week.alias("week")).agg(
        F.count("*").alias("n"),
        F.percentile(F.col(value_col).cast("double"), F.lit(0.95)).alias(
            "_p"
        ),
    )
    w = Window.partitionBy(*group_cols).orderBy("week")
    prev = F.lag("_p").over(w)
    return per.select(
        *group_cols,
        "week",
        "n",
        F.round(F.col("_p"), 6).alias("p95"),
        F.round(F.col("_p") - prev, 6).alias("p95_delta"),
    )


def ddsketch_quantiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
    alpha: float = 0.01,
) -> DataFrame:
    """DDSketch relative-error quantiles (Masson et al., VLDB'19) —
    the bounded, mergeable quantile structure that replaces exact
    ``percentile`` at 10^12 rows: every positive value lands in
    log-gamma bucket ``i = ceil(ln(v)/ln(gamma))`` with
    ``gamma = (1+alpha)/(1-alpha)``, the per-(key, bucket) count table
    is the sketch (size O(log(max/min)/alpha), merge = count add), and
    the q-quantile estimate ``2*gamma^i/(gamma+1)`` is guaranteed
    within relative error ``alpha`` of the true quantile.

    Reference analog: the collector ships latency percentiles through
    fixed-bound histograms (spanmetrics; `docs/components.md`
    connectors table) — DDSketch is the accuracy-guaranteed upgrade
    with the same mergeable-buckets execution shape as
    ``duration_histogram``/``hll_registers``.

    Engine-portability: the bucket index rounds ``ln(v)/ln(gamma)`` to
    9 decimals BEFORE ``ceil`` so a 1-ulp libm divergence between the
    JVM and any oracle engine cannot flip a bucket; estimates round to
    6 decimals after an identical ``pow``.  Non-positive values cannot
    enter a log bucket — they are counted per key (``n_nonpos``), the
    DDSketch "zero bucket" rule.  One keyed shuffle builds the bucket
    table; ranks walk a per-key window over that bounded table only.
    """
    gamma = (1.0 + alpha) / (1.0 - alpha)
    ln_gamma = F.log(F.lit(gamma))
    v = F.col(value_col).cast("double")
    b = df.select(
        *key_cols,
        F.when(
            v > 0, F.ceil(F.round(F.log(v) / ln_gamma, 9))
        ).alias("_i"),
    )
    buckets = b.groupBy(*key_cols, "_i").agg(F.count("*").alias("_c"))
    wall = Window.partitionBy(*key_cols)
    wcum = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_i").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    nonnull_c = F.when(F.col("_i").isNotNull(), F.col("_c"))
    r = buckets.select(
        *key_cols,
        "_i",
        "_c",
        F.sum(nonnull_c).over(wall).alias("_n"),
        F.coalesce(
            F.sum(F.when(F.col("_i").isNull(), F.col("_c"))).over(wall),
            F.lit(0),
        ).alias("_nonpos"),
        F.sum(F.coalesce(nonnull_c, F.lit(0))).over(wcum).alias("_cum"),
    ).filter(F.col("_i").isNotNull())

    def _pick(q: float) -> Column:
        rank = F.floor(F.lit(q) * (F.col("_n") - 1)) + 1
        return F.min(F.when(F.col("_cum") >= rank, F.col("_i")))

    est = lambda i: F.round(  # noqa: E731
        F.lit(2.0) * F.pow(F.lit(gamma), i) / F.lit(gamma + 1.0), 6
    )
    agg = r.groupBy(*key_cols).agg(
        F.max("_n").cast("long").alias("n"),
        F.max("_nonpos").cast("long").alias("n_nonpos"),
        F.count("*").cast("long").alias("n_buckets"),
        _pick(0.5).alias("_i50"),
        _pick(0.95).alias("_i95"),
        _pick(0.99).alias("_i99"),
    )
    return agg.select(
        *key_cols,
        "n",
        "n_nonpos",
        "n_buckets",
        est(F.col("_i50")).alias("p50_est"),
        est(F.col("_i95")).alias("p95_est"),
        est(F.col("_i99")).alias("p99_est"),
    )


def p_chart(
    df: DataFrame,
    defect_col: str,
    ts_col: str = "ts",
    bucket_sec: int = 3600,
) -> DataFrame:
    """Shewhart p-chart over per-bucket defect proportions (the SPC
    control chart behind "is this error rate still in statistical
    control" — a different question than the trailing z-score of
    ``rate_anomaly_scores``: the centerline is the WHOLE series, and
    the limits widen for thin buckets): per time bucket of size
    ``bucket_sec``, the defect share ``p_i = d_i / n_i`` is compared
    against ``pbar +- 3*sqrt(pbar*(1-pbar)/n_i)`` where ``pbar`` is
    the pooled defect share.

    One grouped pass builds the bounded bucket table; the pooled
    centerline reduces to ONE row and joins back as a broadcast.
    Limits clamp to [0, 1] (proportions).  ``out_of_control`` uses
    the rounded p against rounded limits so the flag is engine-stable.
    """
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("double")
    b = df.select(
        (F.floor(epoch / bucket_sec) * bucket_sec)
        .cast("long")
        .alias("bucket_start"),
        F.col(defect_col).cast("int").alias("_d"),
    )
    per = b.groupBy("bucket_start").agg(
        F.count("*").alias("n"), F.sum("_d").alias("d")
    )
    pooled = per.agg(
        (F.sum("d").cast("double") / F.sum("n")).alias("_pbar")
    )
    j = per.crossJoin(F.broadcast(pooled))
    pbar = F.col("_pbar")
    sig = F.sqrt(pbar * (1.0 - pbar) / F.col("n"))
    p = F.round(F.col("d").cast("double") / F.col("n"), 6)
    ucl = F.round(F.least(pbar + 3.0 * sig, F.lit(1.0)), 6)
    lcl = F.round(F.greatest(pbar - 3.0 * sig, F.lit(0.0)), 6)
    return j.select(
        "bucket_start",
        F.col("n").cast("long").alias("n"),
        F.col("d").cast("long").alias("defects"),
        p.alias("p"),
        F.round(pbar, 6).alias("pbar"),
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        ((p > ucl) | (p < lcl)).alias("out_of_control"),
    )


def ddsketch_buckets(
    df: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
    alpha: float = 0.01,
) -> DataFrame:
    """The DDSketch itself: per-key log-gamma bucket counts (NULL
    bucket = the non-positive "zero bucket").  This IS the mergeable
    state — merging shards is adding counts per (key, bucket), which
    ``ddsketch_merge_quantiles`` exercises as a law.
    """
    gamma = (1.0 + alpha) / (1.0 - alpha)
    v = F.col(value_col).cast("double")
    b = df.select(
        *key_cols,
        F.when(
            v > 0, F.ceil(F.round(F.log(v) / F.log(F.lit(gamma)), 9))
        ).alias("bucket"),
    )
    return b.groupBy(*key_cols, "bucket").agg(
        F.count("*").alias("cnt")
    )


def ddsketch_from_buckets(
    buckets: DataFrame,
    key_cols: list[str],
    alpha: float = 0.01,
) -> DataFrame:
    """Quantile estimates from a (possibly merged) DDSketch bucket
    table — the read side of ``ddsketch_buckets``; same rank walk and
    ``2*gamma^i/(gamma+1)`` estimate as ``ddsketch_quantiles``.
    """
    gamma = (1.0 + alpha) / (1.0 - alpha)
    wall = Window.partitionBy(*key_cols)
    wcum = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("bucket").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    nn = F.when(F.col("bucket").isNotNull(), F.col("cnt"))
    r = buckets.select(
        *key_cols,
        "bucket",
        F.sum(nn).over(wall).alias("_n"),
        F.sum(F.coalesce(nn, F.lit(0))).over(wcum).alias("_cum"),
    ).filter(F.col("bucket").isNotNull())

    def _pick(q: float) -> Column:
        rank = F.floor(F.lit(q) * (F.col("_n") - 1)) + 1
        return F.min(F.when(F.col("_cum") >= rank, F.col("bucket")))

    est = lambda i: F.round(  # noqa: E731
        F.lit(2.0) * F.pow(F.lit(gamma), i) / F.lit(gamma + 1.0), 6
    )
    agg = r.groupBy(*key_cols).agg(
        F.max("_n").cast("long").alias("n"),
        _pick(0.5).alias("_i50"),
        _pick(0.95).alias("_i95"),
        _pick(0.99).alias("_i99"),
    )
    return agg.select(
        *key_cols,
        "n",
        est(F.col("_i50")).alias("p50_est"),
        est(F.col("_i95")).alias("p95_est"),
        est(F.col("_i99")).alias("p99_est"),
    )


def ddsketch_merge_quantiles(
    df: DataFrame,
    key_cols: list[str],
    shard_col: str,
    value_col: str = "value",
    alpha: float = 0.01,
) -> DataFrame:
    """DDSketch merge law, exercised end-to-end (the ``hll_merge``
    pattern): build an INDEPENDENT sketch per (key, shard), merge the
    shards by adding bucket counts, and read quantiles off the merged
    sketch side-by-side with the sketch built directly on the unsharded
    data.  Counts are integers, so merge == direct EXACTLY — the
    property that makes the sketch safe for map-side partials and
    cross-cluster rollups at 10^12 rows; ``merge_matches`` audits it.
    """
    sharded = ddsketch_buckets(
        df, [*key_cols, shard_col], value_col, alpha
    )
    merged_buckets = sharded.groupBy(*key_cols, "bucket").agg(
        F.sum("cnt").alias("cnt")
    )
    merged = ddsketch_from_buckets(merged_buckets, key_cols, alpha)
    direct = ddsketch_from_buckets(
        ddsketch_buckets(df, key_cols, value_col, alpha),
        key_cols,
        alpha,
    ).select(
        *key_cols,
        F.col("p50_est").alias("p50_direct"),
        F.col("p95_est").alias("p95_direct"),
        F.col("p99_est").alias("p99_direct"),
    )
    j = merged.join(direct, on=list(key_cols))
    return j.select(
        *key_cols,
        "n",
        F.col("p50_est").alias("p50_merged"),
        F.col("p95_est").alias("p95_merged"),
        F.col("p99_est").alias("p99_merged"),
        "p50_direct",
        "p95_direct",
        "p99_direct",
        (
            (F.col("p50_est") == F.col("p50_direct"))
            & (F.col("p95_est") == F.col("p95_direct"))
            & (F.col("p99_est") == F.col("p99_direct"))
        ).alias("merge_matches"),
    )


def trimmed_means(
    df: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
    trim: float = 0.1,
) -> DataFrame:
    """Trimmed and winsorized means per key — the robust-location pair
    beside ``winsorize`` (which clamps ROWS; this aggregates): the
    ``trim``-trimmed mean drops values strictly outside the exact
    [p_trim, p_(1-trim)] interpolated bounds (boundary values KEPT —
    the pinned convention), the winsorized mean clamps them to the
    bounds, and both sit beside the plain mean so the outlier pull is
    visible.

    Two keyed aggregates: exact percentile bounds, then the
    conditional sums — the bounds table is |keys|-bounded and AQE
    decides the join back (never a forced broadcast, the round-2
    policy).
    """
    v = F.col(value_col).cast("double")
    vals = df.filter(v.isNotNull()).select(
        *key_cols, v.alias("_v")
    )
    bounds = vals.groupBy(*key_cols).agg(
        F.percentile("_v", F.lit(float(trim))).alias("_lo"),
        F.percentile("_v", F.lit(1.0 - trim)).alias("_hi"),
    )
    j = vals.join(bounds, on=list(key_cols))
    inside = (F.col("_v") >= F.col("_lo")) & (F.col("_v") <= F.col("_hi"))
    clamped = F.least(F.greatest(F.col("_v"), F.col("_lo")), F.col("_hi"))
    agg = j.groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("n"),
        F.avg("_v").alias("_mean"),
        F.sum(F.when(inside, F.col("_v"))).alias("_ts"),
        F.sum(inside.cast("long")).alias("_tn"),
        F.avg(clamped).alias("_wmean"),
        F.max("_lo").alias("_lo"),
        F.max("_hi").alias("_hi"),
    )
    return agg.select(
        *key_cols,
        "n",
        F.round("_mean", 6).alias("mean"),
        F.round(F.col("_ts") / F.col("_tn"), 6).alias("trimmed_mean"),
        F.round("_wmean", 6).alias("winsorized_mean"),
        F.round("_lo", 6).alias("lo_bound"),
        F.round("_hi", 6).alias("hi_bound"),
    )


def misra_gries_heavy_hitters(
    df: DataFrame,
    key_col: str,
    shard_col: str,
    m: int = 40,
) -> DataFrame:
    """Distributed heavy hitters with deterministic error bounds — the
    counter-based third of the mergeable-summary family beside
    ``count_min_sketch`` (hash) and ``hll_registers`` (distinct):
    each shard keeps only its top-``m`` counters (Misra-Gries /
    SpaceSaving state: O(m) memory per shard no matter the key
    universe), plus ONE bound — the largest count it dropped.  A
    key's true global count is then sandwiched:
    ``lower = sum of retained counts <= true <= lower + sum of bounds
    of the shards where the key was NOT retained``.

    The audit joins the exact per-key counts back and checks
    ``within_bounds`` — on the driver's data the sandwich must hold
    for every retained key (it is a theorem, not a heuristic).  Ranks
    use (count desc, key asc) so retention is engine-deterministic.
    All integer arithmetic — bit-exact on any engine.
    """
    per = df.groupBy(
        F.col(shard_col).alias("_sh"), F.col(key_col).alias("key")
    ).agg(F.count("*").alias("_c"))
    w = Window.partitionBy("_sh").orderBy(
        F.col("_c").desc(), F.col("key").asc()
    )
    ranked = per.select(
        "_sh", "key", "_c", F.row_number().over(w).alias("_rk")
    )
    retained = ranked.filter(F.col("_rk") <= m)
    bounds = ranked.filter(F.col("_rk") > m).groupBy("_sh").agg(
        F.max("_c").alias("_b")
    )
    total_bound = bounds.agg(
        F.coalesce(F.sum("_b"), F.lit(0)).alias("_bt")
    )
    rb = retained.join(bounds, on="_sh", how="left").select(
        "key",
        "_c",
        F.coalesce(F.col("_b"), F.lit(0)).alias("_pb"),
    )
    per_key = rb.groupBy("key").agg(
        F.sum("_c").alias("_lower"),
        F.sum("_pb").alias("_pbs"),
        F.count("*").alias("_nsh"),
    )
    exact = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("_exact")
    )
    j = (
        per_key.crossJoin(F.broadcast(total_bound))
        .join(exact, on="key")
    )
    upper = F.col("_lower") + (F.col("_bt") - F.col("_pbs"))
    return j.select(
        "key",
        F.col("_nsh").cast("long").alias("n_shards_retained"),
        F.col("_lower").cast("long").alias("count_lower"),
        upper.cast("long").alias("count_upper"),
        F.col("_exact").cast("long").alias("count_exact"),
        (
            (F.col("_lower") <= F.col("_exact"))
            & (F.col("_exact") <= upper)
        ).alias("within_bounds"),
    )


def token_bucket_audit(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("ts",),
    capacity: float = 2.0,
    rate_per_sec: float = 1.0 / 600.0,
) -> DataFrame:
    """Token-bucket rate-limiter simulation per key — the continuous-
    refill algorithm real throttles implement (the reference's
    ThrottledLogger / exporter rate limits), beside the tumbling-
    window ``rate_limit`` and the sequential ``throttle_exact``: a
    bucket starts FULL (pinned convention), refills at
    ``rate_per_sec`` up to ``capacity``, each event spends one token
    or is dropped.

    The recurrence is sequential per key, so it folds in-row over the
    (ts, tiebreak)-sorted event times with a 3-slot state
    ``[tokens, last_ts, dropped]`` — one grouped pass; an oracle
    replays the identical IEEE fold.  Reports per key what a deployed
    limiter WOULD have dropped — the sizing audit run before enabling
    one.
    """
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("double")
    per_key = df.groupBy(F.col(key_col).alias("key")).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    *[F.col(c).alias(f"o{i}") for i, c in
                      enumerate(order_cols)],
                    epoch.alias("e"),
                )
            )
        ).alias("_pts")
    )
    es = F.transform("_pts", lambda p: p["e"])
    zero = F.array(F.lit(float(capacity)), F.lit(0.0), F.lit(0.0))

    def step(acc, x):
        refill = F.least(
            F.lit(float(capacity)),
            F.element_at(acc, 1)
            + (x - F.element_at(acc, 2)) * F.lit(float(rate_per_sec)),
        )
        allowed = refill >= 1.0
        tok = F.when(allowed, refill - 1.0).otherwise(refill)
        dropped = F.when(
            allowed, F.element_at(acc, 3)
        ).otherwise(F.element_at(acc, 3) + 1.0)
        return F.array(tok, x, dropped)

    st = F.aggregate(es, zero, step)
    n = F.size("_pts").cast("long")
    drops = F.element_at(st, 3)
    return per_key.select(
        "key",
        n.alias("n_events"),
        drops.cast("long").alias("n_dropped"),
        F.round(drops / n.cast("double"), 6).alias("drop_rate"),
        F.round(F.element_at(st, 1), 6).alias("final_tokens"),
    )


def interval_last_value(
    df: DataFrame,
    series_cols: list,
    ts_col: str,
    value_col: str,
    tie_col: str,
    interval_s: int = 21600,
) -> DataFrame:
    """`interval` processor semantics (OTel contrib intervalprocessor;
    the gauge/counter companion of the reference's batch-window
    downsamplers): within each series and aligned interval, keep only
    the LAST datapoint (max event time, ``tie_col`` breaking exact-ts
    ties deterministically) plus the interval's point count so the
    compaction is observable.  This is the lossless-for-gauges
    downsampling the collector applies before slow exporters —
    distinct from `m4_downsample` (which keeps 4 points for plots)
    and `stale_series` (which drops whole series).

    One window rank per (series, interval) — a single hash shuffle on
    the series+interval key, no self-join; at 10^12 points the
    partition count follows the series cardinality, and the rank
    never sorts more than one interval's points per series.
    """
    ivl = (
        F.floor(F.col(ts_col).cast("timestamp_ltz").cast("double") / interval_s)
        .cast("long")
        .alias("interval_id")
    )
    base = df.select(*series_cols, ivl, F.col(ts_col).alias("_t"),
                     F.col(value_col).alias("_v"), F.col(tie_col).alias("_k"))
    w = Window.partitionBy(*series_cols, "interval_id").orderBy(
        F.col("_t").desc(), F.col("_k").desc()
    )
    return (
        base.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_n", F.count(F.lit(1)).over(
                Window.partitionBy(*series_cols, "interval_id")
            )
        )
        .filter(F.col("_rn") == 1)
        .select(
            *series_cols,
            "interval_id",
            F.col("_v").alias("last_value"),
            F.date_format("_t", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.col("_n").cast("long").alias("n_points"),
        )
    )


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    nodes: list[str],
) -> Column:
    """Highest-random-weight (rendezvous) owner for each key over a
    bounded node list: argmax over nodes of the portable 32-bit
    md5(key|node) weight — the stateless alternative to a hash ring
    with the same minimal-disruption property, computed entirely
    in-row (a literal array of (node, weight) structs, array_max)."""
    key = F.col(key_col).cast("string")
    pairs = F.array(*[
        F.struct(
            F.conv(
                F.substring(
                    F.md5(F.concat(key, F.lit("|"), F.lit(n))), 1, 8
                ),
                16, 10,
            ).cast("bigint").alias("w"),
            F.lit(n).alias("node"),
        )
        for n in nodes
    ])
    return F.array_max(pairs).getField("node")


def rendezvous_routing(
    df: DataFrame,
    key_col: str,
    nodes: list[str],
    removed: str,
) -> DataFrame:
    """Rendezvous (HRW) routing audit: per-node key counts before and
    after removing one node, plus the disruption count — HRW's
    guarantee is that ONLY keys owned by the removed node move, so
    ``moved`` must equal the removed node's share and every other
    node can only gain.  Reference parity: the loadbalancing
    exporter's consistent routing contract
    (`internal/exporter/loadbalancingexporter`), re-checked here with
    the stateless HRW construction.  One distinct-key aggregate, two
    in-row argmaxes, one bounded group-by — no joins.
    """
    survivors = [n for n in nodes if n != removed]
    keys = df.select(F.col(key_col).alias("k")).distinct()
    owner = keys.select(
        "k",
        rendezvous_assign(keys, "k", nodes).alias("before"),
        rendezvous_assign(keys, "k", survivors).alias("after"),
    )
    return owner.groupBy(F.col("before").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys_before"),
        F.sum(
            (F.col("after") != F.col("before")).cast("long")
        ).cast("bigint").alias("moved_out"),
    ).orderBy("node")


def consistent_hash_ring(
    df: DataFrame,
    key_col: str,
    nodes: list[str],
    vnodes: int = 8,
) -> DataFrame:
    """Consistent-hash-ring assignment with virtual nodes: each node
    owns ``vnodes`` points on the 32-bit md5 ring; a key belongs to
    the first vnode clockwise from its own hash (wrapping to the
    ring's minimum).  Emits per-node distinct-key load and its share
    — the balance check that motivates vnodes in the first place.

    The ring is a bounded literal (len(nodes)*vnodes rows) so the
    successor search is a broadcast range join + min-aggregate; keys
    are hashed once.  No unbounded shuffle.
    """
    spark = df.sparkSession
    # literal vnode ring via range + array indexing (Catalyst-native —
    # createDataFrame would plant a Python RDD scan node in the plan)
    node_arr = F.array(*[F.lit(n) for n in nodes])
    ring = spark.range(len(nodes) * vnodes).select(
        F.element_at(
            node_arr, (F.col("id") / vnodes).cast("int") + 1
        ).alias("node"),
        (F.col("id") % vnodes).cast("int").alias("v"),
    ).select(
        "node",
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col("node"), F.col("v"))), 1, 8
            ),
            16, 10,
        ).cast("bigint").alias("vh"),
    )
    keys = df.select(F.col(key_col).alias("k")).distinct().select(
        "k",
        F.conv(
            F.substring(F.md5(F.col("k").cast("string")), 1, 8), 16, 10
        ).cast("bigint").alias("kh"),
    )
    j = keys.join(F.broadcast(ring), F.col("vh") >= F.col("kh"), "left")
    succ = j.groupBy("k", "kh").agg(
        F.min_by("node", "vh").alias("succ"),
        F.min("vh").alias("svh"),
    )
    wrap = ring.agg(F.min_by("node", "vh").alias("wrap_node"))
    owned = succ.crossJoin(F.broadcast(wrap)).select(
        "k", F.coalesce("succ", "wrap_node").alias("node")
    )
    load = owned.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )
    tot = load.agg(F.sum("n_keys").cast("double").alias("tot"))
    return load.crossJoin(tot).select(
        "node", "n_keys",
        F.round(F.col("n_keys") / F.col("tot"), 6).alias("share"),
    ).orderBy("node")
