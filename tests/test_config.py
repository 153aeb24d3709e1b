"""Config→plan compiler + multimodal plumbing tests."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sparkcollector.config import compile_pipeline, dry_run


def test_default_config_matches_build_pipeline(spark, turns_df):
    from sparkcollector.job import build_pipeline

    got = compile_pipeline()(turns_df)
    exp = build_pipeline(turns_df)
    a = sorted(tuple(r) for r in got.select("conv_id", "turn_idx", "sink").collect())
    b = sorted(tuple(r) for r in exp.select("conv_id", "turn_idx", "sink").collect())
    assert a == b


def test_exclude_filter_stage(spark, turns_df):
    cfg = {"pipeline": {"exclude": [{"column": "role", "items": ["tool"]}]}}
    out = compile_pipeline(cfg)(turns_df)
    assert out.filter(F.col("role") == "tool").count() == 0
    assert out.count() == turns_df.filter("role != 'tool'").count()


def test_custom_route_rules(spark, turns_df):
    cfg = {
        "pipeline": {
            "parse": {"engine": "off"},
            "enrich": {},
            "route": {"rules": [{"predicate": "role = 'user'", "sink": "metrics"}]},
            "order": None,
        }
    }
    out = compile_pipeline(cfg)(turns_df)
    sinks = dict(
        (r["sink"], r["n"])
        for r in out.groupBy("sink").agg(F.count("*").alias("n")).collect()
    )
    assert sinks["metrics"] == turns_df.filter("role = 'user'").count()
    assert sinks["events"] == turns_df.filter("role != 'user'").count()


def test_transform_statements(spark, turns_df):
    cfg = {
        "pipeline": {
            "parse": {"engine": "off"},
            "enrich": {},
            "transform": [
                {"set": "sourcetype", "expr": "'agent:turn'"},
                {
                    "set": "sourcetype",
                    "expr": "'XmlWinEventLog'",
                    "where": "role = 'system'",
                },
                {"set": "body_len", "expr": "length(text)"},
            ],
            "route": {"rules": [{"predicate": "true", "sink": "events"}]},
            "order": None,
        }
    }
    out = compile_pipeline(cfg)(turns_df)
    rows = out.select("role", "sourcetype", "body_len", "text").collect()
    for r in rows:
        expected = "XmlWinEventLog" if r["role"] == "system" else "agent:turn"
        assert r["sourcetype"] == expected
        assert r["body_len"] == len(r["text"])


def test_dry_run_prints_effective_config():
    cfg = json.loads(dry_run())
    p = cfg["pipeline"]
    assert p["parse"]["engine"] == "pandas"
    assert p["route"]["rules"][0]["sink"] == "traces"


# --- multimodal plumbing ---------------------------------------------

def test_multimodal_feature_extraction(spark):
    from sparkcollector.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
        synth_media,
    )

    media = synth_media(spark, n=30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == FEATURE_DIM
        assert r["n_bytes"] > 0
        assert abs(sum(r["feature"]) - 1.0) < 1e-3  # L1-normalized
    # deterministic across runs
    again = extract_features(synth_media(spark, n=30)).collect()
    assert sorted(r["media_id"] for r in again) == sorted(r["media_id"] for r in feats)


def test_multimodal_resize_and_frames(spark):
    from sparkcollector.operators.multimodal import (
        frame_sample_stub,
        resize_stub,
        synth_media,
    )

    media = synth_media(spark, n=30)
    resized = resize_stub(media, 32, 32).collect()
    assert all(r["width"] == 32 and r["height"] == 32 for r in resized)

    frames = frame_sample_stub(media, every_ms=5000).collect()
    vids = {r["media_id"] for r in media.filter("kind='video'").collect()}
    assert {r["media_id"] for r in frames} <= vids
    assert len(frames) > 0 and all(r["frame_ms"] % 5000 == 0 for r in frames)
