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
    return {r["name"] for r in df.filter(basic_string_filter(F.col("name"), items)).collect()}


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
