"""Snapshot catalog: Iceberg-style checkpointed resume over parquet.

The reference's filelog receiver checkpoints per-file offsets in the
``file_storage`` extension so a restart resumes where it left off
(cmd/otelcol/config/collector/splunk_logs_config_linux.yaml:21-27,50).
The north rule maps that to Iceberg snapshot-based resume with
per-partition lineage + throughput metrics.

This container ships no Iceberg runtime jar, so we implement the same
*semantics* as a small, append-only JSON snapshot log over parquet
directories — deliberately shaped like Iceberg's metadata model
(snapshots → manifests → data files) so swapping in a real Iceberg
catalog on a cluster is a one-line change in job.py:

* :meth:`SnapshotCatalog.append` writes a data directory and commits a
  snapshot entry recording every file (path, rows) — the per-partition
  lineage manifest — plus phase metrics (rows/sec).
* :meth:`SnapshotCatalog.read_since` reads only files committed after a
  given snapshot id — incremental consumption, the ``start_at:
  beginning`` vs resume distinction (yaml:49).
* Commits are atomic (write-temp + ``os.replace``), so a failed job
  never corrupts the log — mirroring Iceberg's optimistic commit.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    snapshot_id: int
    ts: float
    files: list[dict]  # [{path, rows}]
    metrics: dict = field(default_factory=dict)


class SnapshotCatalog:
    """A minimal snapshot log for one logical table."""

    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        self.meta_path = os.path.join(table_dir, "_snapshots.json")
        os.makedirs(table_dir, exist_ok=True)

    # -- log IO --------------------------------------------------------
    def snapshots(self) -> list[Snapshot]:
        if not os.path.exists(self.meta_path):
            return []
        with open(self.meta_path) as f:
            raw = json.load(f)
        return [Snapshot(**s) for s in raw]

    def _commit(self, snaps: list[Snapshot]) -> None:
        tmp = self.meta_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump([s.__dict__ for s in snaps], f, indent=1)
        os.replace(tmp, self.meta_path)

    def current_snapshot_id(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1].snapshot_id if snaps else None

    # -- write path ----------------------------------------------------
    def append(self, df: DataFrame, metrics: dict | None = None) -> Snapshot:
        """Write ``df`` as a new data directory + snapshot commit.

        Records per-file row counts (lineage) by reading back parquet
        footers — metadata-only, no data scan.
        """
        t0 = time.time()
        snap_id = (self.current_snapshot_id() or 0) + 1
        data_dir = os.path.join(self.table_dir, f"data-{snap_id:06d}")
        df.write.mode("overwrite").parquet(data_dir)

        import pyarrow.parquet as pq

        files = []
        total_rows = 0
        for name in sorted(os.listdir(data_dir)):
            if name.endswith(".parquet"):
                p = os.path.join(data_dir, name)
                rows = pq.ParquetFile(p).metadata.num_rows
                files.append({"path": p, "rows": rows})
                total_rows += rows

        elapsed = time.time() - t0
        m = {
            "rows": total_rows,
            "files": len(files),
            "write_sec": round(elapsed, 3),
            "rows_per_sec": round(total_rows / elapsed, 1) if elapsed else None,
        }
        if metrics:
            m.update(metrics)
        snap = Snapshot(snapshot_id=snap_id, ts=time.time(), files=files, metrics=m)
        snaps = self.snapshots()
        snaps.append(snap)
        self._commit(snaps)
        return snap

    # -- read path -----------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        """Full-table scan of all committed snapshots."""
        return self.read_since(spark, since_snapshot_id=0)

    def read_since(
        self, spark: SparkSession, since_snapshot_id: int
    ) -> DataFrame:
        """Incremental read: files committed strictly after a snapshot.

        This is the resume primitive: a consumer persists the last
        snapshot id it processed and passes it here on restart.
        """
        paths = [
            f["path"]
            for s in self.snapshots()
            if s.snapshot_id > since_snapshot_id
            for f in s.files
        ]
        if not paths:
            raise ValueError(
                f"no data after snapshot {since_snapshot_id} in {self.table_dir}"
            )
        return spark.read.parquet(*paths)

    def lineage(self) -> list[dict]:
        """Flattened per-partition lineage: snapshot → file → rows."""
        return [
            {"snapshot_id": s.snapshot_id, **f}
            for s in self.snapshots()
            for f in s.files
        ]


class ResumeState:
    """Consumer-side watermark: last processed snapshot per table
    (the file_storage offset-store analog)."""

    def __init__(self, path: str):
        self.path = path

    def get(self, table: str) -> int:
        if not os.path.exists(self.path):
            return 0
        with open(self.path) as f:
            return json.load(f).get(table, 0)

    def set(self, table: str, snapshot_id: int) -> None:
        state = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                state = json.load(f)
        state[table] = snapshot_id
        tmp = self.path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)
