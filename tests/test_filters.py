"""Filter-semantics compiler: glob / /regex/ / '!' negation / map specs.
Mirrors the observed behavior of the reference's string filters
(internal/signalfx-agent/pkg/utils/filter/filter.go,
overridable.go, matching.go) as Catalyst predicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkcollector.filters import (
    basic_string_filter,
    exclude_filter_set,
    overridable_string_filter,
    string_map_filter,
)


@pytest.fixture(scope="module")
def names(spark):
    vals = [
        "process_", "process_cpu", "asdfdfasdf", "process_mem",
        "small bolt", "small dog", "smallx", "big bolt", "plain",
    ]
    return spark.createDataFrame([(v,) for v in vals], ["name"])


def _keep(df, items):
    # overridable semantics (negation overrides positives) — the
    # variant monitor include/exclude lists use; basic's divergent
    # negation behavior is covered by the transcribed cases below.
    return {
        r["name"]
        for r in df.filter(
            overridable_string_filter(F.col("name"), items)
        ).collect()
    }


def test_literal(names):
    assert _keep(names, ["plain"]) == {"plain"}


def test_glob_star(names):
    assert _keep(names, ["process_*"]) == {"process_", "process_cpu", "process_mem"}


def test_glob_question(names):
    assert _keep(names, ["small?"]) == {"smallx"}


def test_regex_literal(names):
    assert _keep(names, ["/.*bolt.*/"]) == {"small bolt", "big bolt"}


def test_negation(names):
    assert _keep(names, ["small*", "!small b*"]) == {"small dog", "smallx"}


def test_negated_literal_wins(names):
    assert _keep(names, ["process_*", "!process_cpu"]) == {"process_", "process_mem"}


def test_mixed_union(names):
    assert _keep(names, ["plain", "/^big/"]) == {"plain", "big bolt"}


def test_string_map_filter_required_and_optional(spark):
    df = spark.createDataFrame(
        [("web", "prod"), ("web", None), ("db", "prod")], ["svc", "env"]
    )
    # required key: NULL env fails
    got = {tuple(r) for r in df.filter(string_map_filter({"svc": "web", "env": "prod"})).collect()}
    assert got == {("web", "prod")}
    # optional key: NULL env passes
    got = {tuple(r) for r in df.filter(string_map_filter({"svc": "web", "env?": "prod"})).collect()}
    assert got == {("web", "prod"), ("web", None)}


def test_exclude_filter_set(spark):
    df = spark.createDataFrame([("a",), ("b",), ("c",)], ["name"])
    keep = exclude_filter_set(
        [F.col("name") == "a", F.col("name") == "c"]
    )
    assert {r["name"] for r in df.filter(keep).collect()} == {"b"}


# ---------------------------------------------------------------------
# BasicStringFilter vs OverridableStringFilter divergent semantics.
# Cases transcribed from the reference's filter_test.go /
# overridable_test.go tables.
# ---------------------------------------------------------------------

def _matches(spark, fn, items, inputs):
    from sparkcollector.filters import overridable_string_filter  # noqa: F401

    df = spark.createDataFrame([(v,) for v in inputs], ["s"])
    kept = {
        r["s"] for r in df.filter(fn(F.col("s"), items)).collect()
    }
    return [v in kept for v in inputs]


BASIC_CASES = [
    # (filter items, inputs, expected) — filter_test.go:18-107
    ([], ["process_"], [False]),
    (["!app"], ["app", "something"], [False, True]),
    (["other", "!app"], ["something", "app"], [True, False]),
    (["/^process_/", "/^node_/"], ["process_"], [True]),
    (["!/^process_/"], ["process_"], [False]),
    (["!app", "!/^process_/"], ["other"], [True]),
    (["!other", "!/^process_/"], ["other"], [False]),
    (["app", "!/^process_/"], ["other"], [True]),
    (["asdfdfasdf", "!/^node_/"], ["process_"], [True]),
    (["asdfdfasdf", "/^node_/"], ["process_"], [False]),
    # literal map is last-wins (staticSet construction)
    (["app", "!app"], ["app", "other"], [False, True]),
]

OVERRIDABLE_CASES = [
    # overridable_test.go:12-133
    ([], ["process_", "", "asdf"], [False, False, False]),
    (["*"], ["app", "asdf", "", "*"], [True, True, True, True]),
    (["!app"], ["app", "other"], [False, False]),
    (["app", "!app"], ["app", "other"], [False, False]),
    (["other", "!app"], ["other", "something", "app"], [True, False, False]),
    (
        ["/^process_/", "/^node_/"],
        ["process_", "node_", "process_asdf", "other"],
        [True, True, True, False],
    ),
    (["!/^process_/"], ["process_", "other"], [False, False]),
    (
        ["app", "!/^process_/", "process_"],
        ["other", "app", "process_cpu", "process_"],
        [False, True, False, False],
    ),
    (["asdfdfasdf", "/^node_/"], ["node_test"], [True]),
    (
        ["process_*", "!process_cpu"],
        ["process_mem", "process_cpu", "asdf"],
        [True, False, False],
    ),
    (["*", "!process_cpu"], ["process_mem", "process_cpu", "asdf"], [True, False, True]),
    (
        ["metric_?", "!metric_a", "!metric_b", "random"],
        ["metric_a", "metric_b", "metric_c", "asdf", "random"],
        [False, False, True, False, True],
    ),
    (["!process_cpu", "*"], ["process_mem", "process_cpu", "asdf"], [True, False, True]),
    (
        ["/a.*/", "!/.*z/", "b", "alz"],
        ["", "asdf", "asdz", "b", "wrong", "alz"],
        [False, True, False, True, False, False],
    ),
]


def test_basic_string_filter_reference_cases(spark):
    for items, inputs, expected in BASIC_CASES:
        got = _matches(spark, basic_string_filter, items, inputs)
        assert got == expected, f"basic {items} on {inputs}: {got}"


def test_overridable_string_filter_reference_cases(spark):
    from sparkcollector.filters import overridable_string_filter

    for items, inputs, expected in OVERRIDABLE_CASES:
        got = _matches(spark, overridable_string_filter, items, inputs)
        assert got == expected, f"overridable {items} on {inputs}: {got}"


def test_basic_vs_overridable_divergence(spark):
    """The case users silently get wrong: a negated-only filter matches
    everything-but in basic, nothing in overridable."""
    from sparkcollector.filters import overridable_string_filter

    assert _matches(spark, basic_string_filter, ["!app"], ["x"]) == [True]
    assert _matches(spark, overridable_string_filter, ["!app"], ["x"]) == [False]


def test_metric_filter_name_and_dims_conjunction(spark):
    from sparkcollector.filters import exclude_filter_set, metric_filter

    df = spark.createDataFrame(
        [
            (1, "cpu.util", "prod", "cpu"),
            (2, "cpu.util", "dev", "cpu"),
            (3, "disk.io", "prod", "disk"),
            (4, "err_count", "prod", "cpu"),
            (5, "err_count", "prod", "disk"),
        ],
        ["id", "metric", "env", "monitor_type"],
    )
    keep = exclude_filter_set(
        [
            # name AND all dims must match for the datapoint to drop
            metric_filter(metric_names=["cpu.util"], dimensions={"env": "prod"}),
            # monitorType scopes the filter; err_count on disk survives
            metric_filter(metric_names=["err*"], monitor_type="cpu"),
        ]
    )
    got = {r["id"] for r in df.filter(keep).collect()}
    assert got == {2, 3, 5}


def test_metric_filter_negated_does_not_negate_monitor_type(spark):
    from sparkcollector.filters import metric_filter

    df = spark.createDataFrame(
        [(1, "a", "cpu"), (2, "b", "cpu"), (3, "a", "disk")],
        ["id", "metric", "monitor_type"],
    )
    # negated: matches datapoints NOT named 'a' — but still only cpu ones
    m = metric_filter(metric_names=["a"], monitor_type="cpu", negated=True)
    got = {r["id"] for r in df.filter(m).collect()}
    assert got == {2}


def test_monitor_include_filter_allowlist_with_extras(spark):
    from sparkcollector.filters import monitor_include_filter

    df = spark.createDataFrame(
        [("cpu.util",), ("cpu.steal",), ("disk.io",), ("net.rx",)], ["m"]
    )
    keep = monitor_include_filter(
        F.col("m"), included=["cpu.util"], extra=["disk.*", "!cpu.steal"]
    )
    got = {r["m"] for r in df.filter(keep).collect()}
    assert got == {"cpu.util", "disk.io"}


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from pyspark.sql import functions as F

    from sparkcollector.filters import bloom_build, bloom_probe

    members = spark.createDataFrame(
        [(f"m{i}",) for i in range(200)], ["item"]
    )
    others = spark.createDataFrame(
        [(f"o{i}",) for i in range(2000)], ["item"]
    )
    bits = bloom_build(members, "item", m_bits=4096, k=4)
    assert bits.count() <= 4096
    got = {
        r["item"]: r["in_filter"]
        for r in bloom_probe(
            bits, members.unionByName(others), "item", m_bits=4096, k=4
        ).collect()
    }
    # every member passes (no false negatives, the Bloom guarantee)
    assert all(got[f"m{i}"] for i in range(200))
    # false-positive rate near (1-e^{-kn/m})^k ~ 0.24% for n=200,
    # m=4096, k=4 — allow generous slack
    fp = sum(1 for i in range(2000) if got[f"o{i}"]) / 2000
    assert fp < 0.05


def test_bloom_join_prune_no_false_negatives(spark):
    from pyspark.sql import functions as F

    from sparkcollector.filters import bloom_join_prune

    facts = spark.createDataFrame(
        [("g", str(i)) for i in range(200)], "grp string, item string"
    )
    dim = spark.createDataFrame(
        [(str(i),) for i in range(0, 200, 10)], "item string"
    )
    r = bloom_join_prune(facts, dim, "item", "grp", m_bits=512, k=4)
    row = r.collect()[0]
    assert row["n_total"] == 200
    assert row["n_joined"] == 20
    # no false negatives: everything that joins passed the bloom
    assert row["n_bloom_pass"] >= row["n_joined"]
    assert row["n_bloom_pass"] - row["n_joined"] == row["n_false_pass"]
