"""Discovery receiver operators: match styles + config embed
(discoveryreceiver/config.go:35,80-82; evaluator.go:131-148)."""

from __future__ import annotations

import base64
import json

import pytest
from pyspark.sql import functions as F

from sparkcollector.operators.discovery import (
    OBSERVER_ID_ATTR,
    RECEIVER_CONFIG_ATTR,
    embed_receiver_config,
    match_predicate,
)


@pytest.fixture(scope="module")
def statuses(spark):
    return spark.createDataFrame(
        [(1, "error", 9.0), (2, "click", 2.0), (3, "purchase", 7.5)],
        ["event_id", "event_type", "value"],
    )


def test_match_strict(statuses):
    got = {
        r["event_id"]
        for r in statuses.filter(
            match_predicate(F.col("event_type"), "strict", "error")
        ).collect()
    }
    assert got == {1}


def test_match_regexp(statuses):
    got = {
        r["event_id"]
        for r in statuses.filter(
            match_predicate(F.col("event_type"), "regexp", "^(click|error)$")
        ).collect()
    }
    assert got == {1, 2}


def test_match_expr(statuses):
    got = {
        r["event_id"]
        for r in statuses.filter(
            match_predicate(
                F.col("value"), "expr", "value > 5 AND event_type = 'purchase'"
            )
        ).collect()
    }
    assert got == {3}


def test_match_unknown_style_raises(statuses):
    with pytest.raises(ValueError, match="unknown match style"):
        match_predicate(F.col("event_type"), "fuzzy", "x")


def test_embed_receiver_config_roundtrip(spark):
    df = spark.createDataFrame(
        [("type == error", "svc-1", 10)], ["rule", "endpoint", "interval"]
    )
    out = embed_receiver_config(
        df, "rule", ["endpoint", "interval"], observer_id="k8s_observer"
    ).collect()[0]
    doc = json.loads(base64.b64decode(out[RECEIVER_CONFIG_ATTR]))
    assert doc == {
        "rule": "type == error",
        "config": {"endpoint": "svc-1", "interval": 10},
    }
    assert out[OBSERVER_ID_ATTR] == "k8s_observer"
