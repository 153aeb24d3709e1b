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


def test_stream_dedup_once_drops_cross_batch_duplicates(spark, tmp_path):
    """Re-delivered (conv_id, turn_idx, ts) rows across micro-batches
    are dropped by the stateful dedup (at-least-once upstream -> one
    row downstream)."""
    from datetime import datetime

    from sparkcollector.schema import TRANSCRIPTS_SCHEMA
    from sparkcollector.streaming.pipeline import stream_dedup_once

    rows = [
        ("c1", 0, "user", "hello", "none", datetime(2024, 1, 1, 0, 0, 0)),
        ("c1", 1, "assistant", "hi", "none", datetime(2024, 1, 1, 0, 0, 5)),
    ]
    import glob as _glob
    import shutil as _shutil

    src = tmp_path / "in"
    src.mkdir()

    def _drop_flat(df, name):
        # the file stream source watches FLAT files; extract the part
        # file from the directory a DataFrame write produces
        d = tmp_path / f"_stage_{name}"
        df.coalesce(1).write.parquet(str(d))
        part = _glob.glob(str(d / "part-*.parquet"))[0]
        _shutil.copy(part, src / f"{name}.parquet")

    _drop_flat(spark.createDataFrame(rows, schema=TRANSCRIPTS_SCHEMA), "batch0")
    # second file re-delivers row 0 plus one new row
    dup_rows = [
        rows[0],
        ("c1", 2, "user", "more", "none", datetime(2024, 1, 1, 0, 0, 9)),
    ]
    _drop_flat(
        spark.createDataFrame(dup_rows, schema=TRANSCRIPTS_SCHEMA), "batch1"
    )

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")  # one file per micro-batch
        .parquet(str(src))
    )
    out: list = []
    q = (
        stream_dedup_once(stream)
        .writeStream.foreachBatch(lambda df, _eid: out.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted((r["conv_id"], r["turn_idx"]) for r in out)
    assert got == [("c1", 0), ("c1", 1), ("c1", 2)]


def test_stream_interval_join_matches_batch(spark, tmp_path):
    import datetime as dt

    from sparkcollector.streaming import stream_interval_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    req_rows = [("c1", 1, ts(0)), ("c1", 2, ts(20)), ("c2", 3, ts(0))]
    rsp_rows = [
        ("c1", 10, ts(3)),   # matches req 1 (within 5 min)
        ("c1", 11, ts(21)),  # matches req 2
        ("c1", 12, ts(40)),  # matches nothing
        ("c2", 13, ts(4)),   # matches req 3 (key-scoped)
    ]
    req_schema = "conv_id string, req_id int, req_ts timestamp"
    rsp_schema = "conv_id string, rsp_id int, rsp_ts timestamp"
    req_dir, rsp_dir = tmp_path / "req", tmp_path / "rsp"
    spark.createDataFrame(req_rows, req_schema).coalesce(1).write.parquet(
        str(req_dir)
    )
    spark.createDataFrame(rsp_rows, rsp_schema).coalesce(1).write.parquet(
        str(rsp_dir)
    )
    left = spark.readStream.schema(req_schema).parquet(str(req_dir))
    right = spark.readStream.schema(rsp_schema).parquet(str(rsp_dir))
    joined = stream_interval_join(
        left, right, keys=["conv_id"], left_ts="req_ts",
        right_ts="rsp_ts", lower_sec=0, upper_sec=300,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sij_test")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["req_id"], r["rsp_id"])
        for r in spark.sql("select * from sij_test").collect()
    )
    assert got == [(1, 10), (2, 11), (3, 13)]


def test_stream_tail_sample_emits_only_kept_conversations(spark, tmp_path):
    import time

    from sparkcollector.streaming import stream_tail_sample

    schema = "conv_id string, turn_idx bigint, text string"
    batch1 = [
        ("keep", 0, "hello"),
        ("keep", 1, "boom level=ERROR here"),
        ("drop", 0, "all fine"),
        ("drop", 1, "still fine"),
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        str(in_dir / "b1.parquet")
    )
    turns = spark.readStream.schema(schema).parquet(str(in_dir / "*"))
    out = stream_tail_sample(turns, decision_wait_ms=1500)
    q = (
        out.writeStream.format("memory")
        .queryName("tail_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    # let batch 1 buffer, wait past decision_wait, then push a dummy
    # conversation so the next micro-batch fires the timeouts
    time.sleep(6)
    spark.createDataFrame(
        [("late", 0, "nothing")], schema
    ).coalesce(1).write.parquet(str(in_dir / "b2.parquet"))
    deadline = time.time() + 60
    rows = []
    while time.time() < deadline:
        rows = spark.sql("select * from tail_test").collect()
        if rows:
            break
        time.sleep(2)
    q.stop()
    got = sorted((r["conv_id"], r["turn_idx"]) for r in rows)
    # the matching conversation is emitted COMPLETE; the clean one never
    assert got == [("keep", 0), ("keep", 1)], got


def test_stream_tail_sample_tombstone_drops_late_rows(spark, tmp_path):
    import time

    from sparkcollector.streaming import stream_tail_sample

    schema = "conv_id string, turn_idx bigint, text string"
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    spark.createDataFrame(
        [("keep", 0, "boom level=ERROR")], schema
    ).coalesce(1).write.parquet(str(in_dir / "b1.parquet"))
    turns = spark.readStream.schema(schema).parquet(str(in_dir / "*"))
    out = stream_tail_sample(turns, decision_wait_ms=1500)
    q = (
        out.writeStream.format("memory")
        .queryName("tomb_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    time.sleep(5)
    # fire the decision
    spark.createDataFrame([("x", 0, "n")], schema).coalesce(1).write.parquet(
        str(in_dir / "b2.parquet")
    )
    deadline = time.time() + 120
    fired = False
    while time.time() < deadline:
        if spark.sql(
            "select * from tomb_test where conv_id = 'keep'"
        ).count():
            fired = True
            break
        time.sleep(2)
    assert fired, "decision never fired (host overloaded?)"
    # LATE row for the already-decided conversation — would previously
    # rebuild state and re-emit a partial duplicate at its timeout
    spark.createDataFrame(
        [("keep", 9, "late level=ERROR")], schema
    ).coalesce(1).write.parquet(str(in_dir / "b3.parquet"))
    time.sleep(6)
    spark.createDataFrame([("y", 0, "n")], schema).coalesce(1).write.parquet(
        str(in_dir / "b4.parquet")
    )
    # Drain-based wait instead of a fixed sleep: under host load the
    # 1s micro-batches lag arbitrarily.  Wait until the query reports
    # two empty batches after b3/b4 (input fully consumed AND the
    # late row's own 1.5s decision timeout has had a chance to fire —
    # if the tombstone were broken, the duplicate would be emitted by
    # then, so waiting longer only strengthens the assertion).
    deadline = time.time() + 90
    empty_batches, last_batch = 0, -1
    while time.time() < deadline and empty_batches < 2:
        time.sleep(2)
        lp = q.lastProgress
        if not lp or lp["batchId"] == last_batch:
            continue
        last_batch = lp["batchId"]
        if lp["numInputRows"] == 0:
            empty_batches += 1
        else:
            empty_batches = 0
    rows = spark.sql("select * from tomb_test where conv_id = 'keep'").collect()
    q.stop()
    got = sorted(r["turn_idx"] for r in rows)
    assert got == [0], got  # the late turn 9 was dropped by the tombstone
