"""Snapshot catalog: Iceberg-style append/incremental-read/resume
semantics (the file_storage checkpoint analog,
splunk_logs_config_linux.yaml:21-27,50)."""

from __future__ import annotations

import pytest

from sparkcollector.checkpoint import ResumeState, SnapshotCatalog


def test_append_and_incremental_read(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "tbl"))
    df1 = spark.range(0, 100).withColumnRenamed("id", "v")
    df2 = spark.range(100, 150).withColumnRenamed("id", "v")

    s1 = cat.append(df1)
    s2 = cat.append(df2)
    assert s1.snapshot_id == 1 and s2.snapshot_id == 2
    assert s1.metrics["rows"] == 100 and s2.metrics["rows"] == 50

    assert cat.read(spark).count() == 150
    inc = cat.read_since(spark, since_snapshot_id=1)
    vals = {r["v"] for r in inc.collect()}
    assert vals == set(range(100, 150))


def test_read_since_empty_raises(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "tbl"))
    cat.append(spark.range(3))
    with pytest.raises(ValueError):
        cat.read_since(spark, since_snapshot_id=1)


def test_lineage_rows_sum(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "tbl"))
    cat.append(spark.range(10))
    cat.append(spark.range(20))
    assert sum(f["rows"] for f in cat.lineage()) == 30


def test_resume_state_roundtrip(tmp_path):
    rs = ResumeState(str(tmp_path / "state.json"))
    assert rs.get("t") == 0
    rs.set("t", 7)
    rs.set("u", 3)
    assert rs.get("t") == 7 and rs.get("u") == 3
