"""Pluggable catalog: factory routing, protocol conformance, and the
Iceberg integration test (skipped when the runtime jar is absent —
this sandbox has no network; on a real cluster submit with
--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:...)."""

from __future__ import annotations

import pytest

from sparkcollector.catalog import (
    IcebergCatalog,
    TableCatalog,
    iceberg_available,
    make_catalog,
    table_uri,
)
from sparkcollector.checkpoint import SnapshotCatalog


def test_factory_routes_by_scheme(tmp_path):
    c = make_catalog(str(tmp_path / "t"))
    assert isinstance(c, SnapshotCatalog)
    c2 = make_catalog("iceberg:local.db.routed")
    assert isinstance(c2, IcebergCatalog)
    assert c2.ident == "local.db.routed"


def test_table_uri_joins_per_scheme():
    assert table_uri("/data/out", "routed") == "/data/out/routed"
    assert table_uri("iceberg:local.db", "routed") == "iceberg:local.db.routed"


def test_both_backends_satisfy_protocol(tmp_path):
    assert isinstance(SnapshotCatalog(str(tmp_path / "t")), TableCatalog)
    assert isinstance(IcebergCatalog("local.db.t"), TableCatalog)


def test_snapshot_backend_via_factory_roundtrip(spark, tmp_path):
    """job.py's exact call pattern, through the factory."""
    cat = make_catalog(table_uri(str(tmp_path), "routed"))
    pre = cat.current_snapshot_id() or 0
    snap = cat.append(spark.range(5).withColumnRenamed("id", "v"))
    assert snap.metrics["rows"] == 5
    assert cat.read_since(spark, pre).count() == 5


def test_iceberg_append_requires_runtime(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present; covered by integration test")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        IcebergCatalog("local.db.t").append(spark.range(1))


@pytest.mark.skipif(
    "not config.getoption('--run-iceberg', default=False)",
    reason="needs iceberg-spark-runtime on the classpath "
    "(pass --run-iceberg on a configured cluster)",
)
def test_iceberg_roundtrip_unmodified_job_path(spark, tmp_path):
    """On a session configured with the Iceberg runtime + a `local`
    hadoop catalog, run_pipeline writes/reads through IcebergCatalog
    with NO job.py changes — only the out_dir URI differs."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg classes not on classpath")
    cat = make_catalog("iceberg:local.db.t_roundtrip")
    pre = cat.current_snapshot_id() or 0
    snap = cat.append(spark.range(7).withColumnRenamed("id", "v"))
    assert snap.metrics["rows"] == 7
    assert cat.read_since(spark, pre).count() == 7
