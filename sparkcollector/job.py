"""End-to-end pipeline: scan → parse → enrich → route → aggregate → sinks.

The dataflow template is the reference's monitor datapoint path
(SURVEY.md §3.2: filter → enrich → translate → route → sink,
pkg/receiver/smartagentreceiver/output.go:248-315) re-expressed as one
declarative Spark plan.  Designed as a ``spark-submit --py-files``
entrypoint:

    spark-submit --master <cluster> --py-files sparkcollector.zip \
        -m sparkcollector.job --input <transcripts> --out <dir>

Phases (each timed; metrics land in the output snapshot log):
  1. scan       parquet/snapshot-catalog read of transcripts
  2. parse      vectorized regex extraction (parse.py)
  3. enrich     broadcast role/tool lookups (enrich.py)
  4. route      first-match-wins sink tagging (route.py)
  5. order      repartition(conv_id) + sortWithinPartitions(conv_id,
                turn_idx) — stable turn ordering before writes
  6. write      fan-out sink writes + agg_counts table
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .aggregate import count_connector
from .checkpoint import SnapshotCatalog
from .enrich import enrich_turns
from .parse import parse_turns, parse_turns_builtin
from .route import RoutingRule, SINK_PROJECTIONS, route
from .session import get_spark
from .skew import repartition_sorted


def build_pipeline(
    turns: DataFrame,
    rules: list[RoutingRule] | None = None,
    use_pandas_udf: bool = True,
    order_partitions: int | None = None,
) -> DataFrame:
    """The logical plan: parsed, enriched, routed, deterministically
    ordered turns (one DataFrame; Catalyst owns the physical plan)."""
    parser = parse_turns if use_pandas_udf else parse_turns_builtin
    parsed = parser(turns)
    enriched = enrich_turns(parsed)
    routed = route(enriched, rules)
    return repartition_sorted(
        routed, "conv_id", "turn_idx", num_partitions=order_partitions
    )


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    rules: list[RoutingRule] | None = None,
    use_pandas_udf: bool = True,
    write: bool = True,
) -> dict:
    """Execute the full job; returns phase metrics (turns/sec etc.)."""
    t0 = time.time()
    turns = spark.read.parquet(input_path)
    routed = build_pipeline(turns, rules, use_pandas_udf=use_pandas_udf)

    metrics: dict = {}
    if write:
        routed.persist()
    try:
        n_turns = routed.count()
        t_routed = time.time()

        counts = count_connector(routed)
        if write:
            sink_catalogs: dict[str, SnapshotCatalog] = {}
            for s, (proj, _) in SINK_PROJECTIONS.items():
                cat = SnapshotCatalog(f"{out_dir}/sink_{s}")
                snap = cat.append(proj(routed.filter(F.col("sink") == s)))
                sink_catalogs[s] = cat
                metrics[f"sink_{s}_rows"] = snap.metrics["rows"]
            agg_cat = SnapshotCatalog(f"{out_dir}/agg_counts")
            agg_cat.append(counts)
        else:
            counts.count()
    finally:
        if write:
            routed.unpersist()

    elapsed = time.time() - t0
    metrics.update(
        {
            "turns": n_turns,
            "route_sec": round(t_routed - t0, 3),
            "total_sec": round(elapsed, 3),
            "turns_per_sec": round(n_turns / elapsed, 1),
        }
    )
    return metrics


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--master", default=None)
    p.add_argument("--builtin-parse", action="store_true")
    p.add_argument("--no-write", action="store_true")
    args = p.parse_args()

    spark = get_spark(master=args.master, app_name="sparkcollector-job")
    metrics = run_pipeline(
        spark,
        args.input,
        args.out,
        use_pandas_udf=not args.builtin_parse,
        write=not args.no_write,
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
