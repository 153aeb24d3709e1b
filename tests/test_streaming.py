"""Structured Streaming pipeline: stream/batch sink interchangeability,
watermarked counts, and the custom stateful session operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkcollector.checkpoint import SnapshotCatalog
from sparkcollector.streaming import (
    conversation_sessions,
    stream_routed,
    stream_transcripts,
    windowed_counts,
    write_stream_sinks,
)


@pytest.fixture(scope="module")
def stream_input(spark, turns_path, tmp_path_factory):
    """A directory the file source watches, seeded with the synth data."""
    import shutil

    d = tmp_path_factory.mktemp("stream_in")
    shutil.copy(turns_path, d / "batch-000.parquet")
    return str(d)


def test_stream_matches_batch_sinks(spark, stream_input, turns_df, tmp_path):
    routed = stream_routed(stream_transcripts(spark, stream_input))
    q = write_stream_sinks(
        routed, str(tmp_path / "out"), str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    cat = SnapshotCatalog(str(tmp_path / "out") + "/routed")
    got = cat.read(spark)
    assert got.count() == turns_df.count()
    sinks = {
        r["sink"]: r["n"]
        for r in got.groupBy("sink").agg(F.count("*").alias("n")).collect()
    }
    # batch pipeline gives identical per-sink counts
    from sparkcollector.job import build_pipeline

    expected = {
        r["sink"]: r["n"]
        for r in build_pipeline(turns_df)
        .groupBy("sink")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sinks == expected


def test_windowed_counts_stream(spark, stream_input, turns_df, tmp_path):
    routed = stream_routed(stream_transcripts(spark, stream_input))
    counts = windowed_counts(routed)
    q = (
        counts.writeStream.format("memory")
        .queryName("wc_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    total = spark.sql("select sum(n) as t from wc_test").collect()[0]["t"]
    assert total == turns_df.count()


def test_conversation_sessions_state(spark, stream_input, turns_pdf, tmp_path):
    turns = stream_transcripts(spark, stream_input)
    sessions = conversation_sessions(turns)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "select conv_id, max(n_turns) as n_turns, max(n_errors) as n_errors "
        "from sess_test group by conv_id"
    ).collect()
    got = {r["conv_id"]: (r["n_turns"], r["n_errors"]) for r in rows}
    exp_turns = turns_pdf.groupby("conv_id").size()
    exp_errors = (
        turns_pdf.assign(e=turns_pdf.text.str.contains("level=ERROR", regex=False))
        .groupby("conv_id")["e"]
        .sum()
    )
    assert len(got) == exp_turns.size
    for conv, (n, ne) in got.items():
        assert n == exp_turns[conv], conv
        assert ne == int(exp_errors[conv]), conv
