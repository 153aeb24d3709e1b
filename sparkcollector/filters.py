"""Filter semantics from the reference, compiled to Column predicates.

Reimplements (from observed behavior, not code translation):

* ``BasicStringFilter`` — a list of items, each a literal, a
  ``/regex/`` literal, or a glob (``*?[]``), optionally ``!``-negated;
  the set matches when any positive matcher hits and semantics of
  negation follow the overridable variant below.
  (reference: internal/signalfx-agent/pkg/utils/filter/filter.go:41-107,
  syntax detection matching.go:12-37)
* ``OverridableStringFilter`` — gitignore-style: a value matches if a
  positive pattern matches AND no negated pattern matches; a negated
  literal match wins outright.
  (reference: internal/signalfx-agent/pkg/utils/filter/overridable.go:29-56)
* ``StringMapFilter`` — ALL key/value specs must match; a ``key?``
  suffix makes a missing key acceptable.
  (reference: utils/filter/filter.go:112-179)
* dpfilter ``FilterSet`` — datapoint dropped if ANY exclude filter
  matches (internal/signalfx-agent/pkg/core/dpfilters/set.go:10-36).

Everything compiles to pure Catalyst expressions (``isin`` for literal
sets, ``rlike`` for regex/glob unions) so the predicates push down and
stay in whole-stage codegen — no Python in the filter path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _is_regex(item: str) -> bool:
    return len(item) > 1 and item.startswith("/") and item.endswith("/")


def _is_glob(item: str) -> bool:
    return any(c in item for c in "*?[]{}!")


def _glob_to_regex(glob: str) -> str:
    """Translate the agent's glob dialect to an anchored Java regex."""
    out = []
    i = 0
    while i < len(glob):
        c = glob[i]
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c == "[":
            j = glob.find("]", i + 1)
            # fail soft on malformed classes (unclosed, empty "[]", or
            # content that isn't a valid class): treat "[" as a literal
            # — filters come from user config and must never produce an
            # uncompilable predicate (property-tested).
            cls = glob[i : j + 1] if j > i + 1 else None
            if cls is not None:
                try:
                    re.compile(cls)
                except re.error:
                    cls = None
            if cls is None:
                out.append(re.escape(c))
            else:
                out.append(cls)
                i = j
        elif c == "{":
            j = glob.find("}", i + 1)
            if j == -1:
                out.append(re.escape(c))
            else:
                alts = glob[i + 1 : j].split(",")
                out.append("(" + "|".join(re.escape(a) for a in alts) + ")")
                i = j
        else:
            out.append(re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"


def _split_negation(items: list[str]) -> tuple[list[str], list[str]]:
    pos, neg = [], []
    for it in items:
        if it.startswith("!"):
            neg.append(it[1:])
        else:
            pos.append(it)
    return pos, neg


def _match_column(col: Column, items: list[str]) -> Column:
    """OR of matchers for a plain (non-negated) item list.

    Literals collapse into one ``isin``; regex/glob items union into
    ``rlike`` alternation — a single JVM regex evaluation per row.
    """
    literals = [i for i in items if not _is_regex(i) and not _is_glob(i)]
    regexes = [i[1:-1] for i in items if _is_regex(i)]
    regexes += [_glob_to_regex(i) for i in items if _is_glob(i) and not _is_regex(i)]
    parts: list[Column] = []
    if literals:
        parts.append(col.isin(literals))
    if regexes:
        alternation = "|".join(f"(?:{r})" for r in regexes)
        parts.append(col.rlike(alternation))
    if not parts:
        return F.lit(False)
    out = parts[0]
    for p in parts[1:]:
        out = out | p
    return out


def overridable_string_filter(col: Column, items: list[str]) -> Column:
    """Gitignore-style: a value matches iff ANY positive pattern
    matches AND NO negated pattern matches — a negated match of any
    kind (literal, regex, or glob) wins outright, even over a positive
    literal match (overridable.go:29-56; cases transcribed from
    overridable_test.go).  A filter of only negated items matches
    nothing."""
    pos, neg = _split_negation(items)
    matched = _match_column(col, pos)
    if neg:
        matched = matched & ~_match_column(col, neg)
    return matched


def basic_string_filter(col: Column, items: list[str]) -> Column:
    """BasicStringFilter semantics (filter.go:41-63) — DIFFERENT from
    the overridable variant: each negated item is itself a matcher that
    hits everything NOT matching it.

    Decision order (mirrors Matches):
      1. value equals a positive literal            -> True
      2. value equals a negated literal             -> False
      3. any negated literal exists in the filter   -> True
         (``!foo`` alone matches every value except foo)
      4. OR over pattern matchers, where a negated regex/glob
         contributes ``NOT matches(pattern)``       -> that OR

    So ``["!app"]`` matches "other" here but nothing in the
    overridable variant.  Still one Catalyst expression per filter.
    """
    pos, neg = _split_negation(items)
    # literals live in ONE map where the LAST occurrence wins (Go
    # staticSet construction): ["app", "!app"] leaves app negated.
    lit_map: dict[str, bool] = {}
    for it in items:
        negated = it.startswith("!")
        stripped = it[1:] if negated else it
        if not _is_regex(stripped) and not _is_glob(stripped):
            lit_map[stripped] = negated
    pos_lit = [k for k, v in lit_map.items() if not v]
    neg_lit = [k for k, v in lit_map.items() if v]
    pos_pat = [i for i in pos if _is_regex(i) or _is_glob(i)]
    neg_pat = [i for i in neg if _is_regex(i) or _is_glob(i)]

    fallthrough = _match_column(col, pos_pat)
    for p in neg_pat:
        fallthrough = fallthrough | ~_match_column(col, [p])

    out = fallthrough
    if neg_lit:
        # any negated literal present: non-listed values match (step 3)
        out = F.lit(True)
        out = F.when(col.isin(neg_lit), F.lit(False)).otherwise(out)
    if pos_lit:
        out = F.when(col.isin(pos_lit), F.lit(True)).otherwise(out)
    return out


def string_map_filter(spec: dict[str, list[str] | str]) -> Column:
    """ALL key specs must match; ``key?`` tolerates a missing key.

    ``spec`` maps a column name (optionally suffixed ``?``) to an item
    list (or single item); per-value matching uses the OVERRIDABLE
    filter — NewStringMapFilter builds OverridableStringFilter values
    (filter.go:112-117).  A missing (NULL) column fails a required key
    and passes an optional one (filter.go:120-131, 157).
    """
    conds: list[Column] = []
    for key, items in spec.items():
        ok_missing = key.endswith("?")
        name = key[:-1] if ok_missing else key
        items_list = [items] if isinstance(items, str) else list(items)
        col = F.col(name)
        m = overridable_string_filter(col, items_list)
        if ok_missing:
            conds.append(F.when(col.isNull(), F.lit(True)).otherwise(m))
        else:
            conds.append(col.isNotNull() & m)
    out = F.lit(True)
    for c in conds:
        out = out & c
    return out


def exclude_filter_set(filters: list[Column]) -> Column:
    """dpfilters.FilterSet: keep a row only if NO exclude filter
    matches (set.go:10-36)."""
    dropped = F.lit(False)
    for f in filters:
        dropped = dropped | f
    return ~dropped


def metric_filter(
    metric_names: list[str] | None = None,
    dimensions: dict[str, list[str] | str] | None = None,
    name_col: str = "metric",
    monitor_type: str | None = None,
    monitor_type_col: str = "monitor_type",
    negated: bool = False,
) -> Column:
    """One ``MetricFilter`` (subtractive, applied right before send) as
    a Column predicate — True where the datapoint MATCHES the filter
    (i.e. would be dropped when used in an exclude set).

    Semantics (core/config/filters.go:12-57, makeNewFilterSet:59-79):
    a datapoint matches when its metric name matches the (overridable)
    name list AND every dimension spec matches; ``negated`` inverts
    that result but does NOT negate the ``monitorType`` scope, which
    always restricts the filter to one monitor's datapoints.  Missing
    pieces default to match-all (a dims-only or names-only filter is
    valid).  Combine several with :func:`exclude_filter_set`.
    """
    matched = F.lit(True)
    if metric_names:
        matched = matched & overridable_string_filter(
            F.col(name_col), list(metric_names)
        )
    if dimensions:
        matched = matched & string_map_filter(dimensions)
    if negated:
        matched = ~matched
    if monitor_type is not None:
        matched = (F.col(monitor_type_col) == monitor_type) & matched
    return matched


def monitor_include_filter(
    col: Column, included: list[str], extra: list[str] | None = None
) -> Column:
    """Monitor metric allowlist: keep a metric iff it is in the
    monitor's default included set OR the user's ``extraMetrics``
    (globs/negation in the overridable dialect).  The packaged form of
    the include-filter the agent builds per monitor."""
    items = list(included) + list(extra or [])
    return overridable_string_filter(col, items)


def bloom_build(df, key_col: str, m_bits: int = 4096, k: int = 4):
    """Bloom filter over a key set, materialized as the DISTINCT set of
    set bit positions (<= ``m_bits`` rows regardless of key count) —
    the bounded-size membership structure that replaces shuffling a
    10^12-row fact table against a suppression/allow list: the
    positions table broadcasts by construction, the probe is a local
    hash-join per partition, and only "maybe" rows (true members +
    the ~(1-e^-kn/m)^k false-positive mass) need the exact follow-up.

    Positions use the same row-seeded portable md5 bucket as the
    Count-Min sketch (one shared definition — build and probe must
    hash bit-identically), so an oracle replays the filter exactly.
    """
    from .operators.telemetry import _cm_bucket

    key = F.col(key_col).cast("string")
    seeds = F.explode(
        F.sequence(F.lit(0).cast("int"), F.lit(k - 1).cast("int"))
    ).alias("_d")
    return (
        df.select(key.alias("_key"), seeds)
        .select(_cm_bucket(F.col("_d"), F.col("_key"), m_bits).alias("pos"))
        .distinct()
    )


def bloom_probe(bits, df, key_col: str, m_bits: int = 4096, k: int = 4):
    """Probe a Bloom filter built by :func:`bloom_build`: a key is
    ``in_filter`` iff ALL ``k`` of its positions are set (count of
    matched probe rows == k; a left join against the bounded positions
    table, which AQE broadcasts).  No false negatives by construction.
    """
    from .operators.telemetry import _cm_bucket

    key = F.col(key_col).cast("string")
    probes = df.select(
        F.col(key_col),
        F.explode(
            F.sequence(F.lit(0).cast("int"), F.lit(k - 1).cast("int"))
        ).alias("_d"),
    ).select(
        F.col(key_col),
        _cm_bucket(F.col("_d"), key, m_bits).alias("pos"),
    )
    hit = bits.withColumn("_hit", F.lit(1))
    return (
        probes.join(hit, "pos", "left")
        .groupBy(key_col)
        .agg((F.count("_hit") == k).alias("in_filter"))
    )


def bloom_join_prune(
    facts,
    dim,
    key_col: str,
    group_col: str,
    m_bits: int = 4096,
    k: int = 4,
):
    """Runtime-filter join pruning audit (the Bloom analog of Spark's
    row-level runtime filters / DPP: prefilter the 10^12-row fact
    stream against a Bloom of the small side's keys so the exact join
    only sees "maybe" rows): per group — total rows, rows passing the
    Bloom, rows actually joining, and the false-pass overhead the
    filter's sizing bought.

    The positions table is <= m_bits rows (broadcasts by
    construction); the per-distinct-key label table joins back on the
    key — the audit's one keyed shuffle.  No false negatives:
    n_joined rows always survive the prefilter.
    """
    bits = bloom_build(dim, key_col, m_bits=m_bits, k=k)
    flags = bloom_probe(
        bits, facts.select(key_col).distinct(), key_col,
        m_bits=m_bits, k=k,
    )
    member = (
        dim.select(F.col(key_col)).distinct().withColumn("_m", F.lit(1))
    )
    lab = flags.join(member, key_col, "left")
    j = facts.join(lab, key_col)
    return j.groupBy(group_col).agg(
        F.count("*").alias("n_total"),
        F.sum(F.col("in_filter").cast("long")).alias("n_bloom_pass"),
        F.sum((F.col("_m") == 1).cast("long")).alias("n_joined"),
        F.sum(
            (F.col("in_filter") & F.col("_m").isNull()).cast("long")
        ).alias("n_false_pass"),
    )
