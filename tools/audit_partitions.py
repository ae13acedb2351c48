"""Shuffle-balance audit (round 5): measure, per shuffle-output partition,
row and byte load for the two shuffles the engine leans on hardest — the
MERGE full-outer join and the packed_sequences sequence-index aggregation —
turning the "no straggler" scale claim into a recorded measurement.

``spark_partition_id()`` is evaluated on the audited frame BEFORE the
audit's own aggregation shuffle, so the stats describe the frame's real
post-shuffle layout (with AQE coalescing applied, i.e. what actually runs).
Approx bytes = octet_length of the JSON rendering per row — a uniform
proxy good for BALANCE comparisons, not absolute sizes.

Usage: python tools/audit_partitions.py [sf_dir]
Prints one JSON line per scenario + a human table.
"""

from __future__ import annotations

import json
import statistics
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_stats(df: DataFrame) -> dict:
    """Per-partition (rows, approx_bytes) + balance summary for ``df``."""
    per = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(
                F.octet_length(F.to_json(F.struct(*df.columns)))
            ).alias("approx_bytes"),
        )
        .collect()
    )
    rows = sorted(int(r["rows"]) for r in per)
    byts = sorted(int(r["approx_bytes"]) for r in per)
    if not rows:
        return {"n_partitions": 0}

    def _s(v):
        return {
            "min": v[0],
            "median": int(statistics.median(v)),
            "max": v[-1],
            "total": sum(v),
            "max_over_mean": round(v[-1] / (sum(v) / len(v)), 3),
        }

    return {"n_partitions": len(rows), "rows": _s(rows), "bytes": _s(byts)}


def _scenarios(spark, sf_dir: str) -> dict[str, DataFrame]:
    from etl_file_loader_spark.operators import publish as publish_ops
    from etl_file_loader_spark.operators import sampling as sampling_ops
    from etl_file_loader_spark.suite import _t
    from etl_file_loader_spark.suite.pipeline import _merge_frames, _ORDERS_BUSINESS

    target, stage = _merge_frames(spark, sf_dir)
    merged = publish_ops.merge_upsert(
        target, stage, ["o_orderkey"], _ORDERS_BUSINESS,
        now=F.lit("2024-06-01 00:00:00").cast("timestamp"),
    )
    target2, stage2 = _merge_frames(spark, sf_dir)
    merged_salted = publish_ops.merge_upsert(
        target2, stage2, ["o_orderkey"], _ORDERS_BUSINESS,
        now=F.lit("2024-06-01 00:00:00").cast("timestamp"),
        salt_buckets=16,
    )
    docs = _t(spark, sf_dir, "documents")
    packed = sampling_ops.packed_sequences(
        docs, "doc_id", "text", seq_len=64, partition_cols=["lang"]
    )
    # the documented mitigation for per-stream mass skew: a finer stream key
    # multiplies window parallelism while keeping streams contiguous
    packed_fine = sampling_ops.packed_sequences(
        docs, "doc_id", "text", seq_len=64, partition_cols=["lang", "source"]
    )
    return {
        "merge_upsert_join": merged,
        "merge_upsert_join_salted": merged_salted,
        "packed_sequences_seq_shuffle": packed,
        "packed_sequences_fine_streams": packed_fine,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from etl_file_loader_spark.session import get_spark

    spark = get_spark("audit-partitions")
    print(f"{'scenario':<32} {'parts':>5} {'rows max/mean':>13} {'bytes max/mean':>14}")
    for name, df in _scenarios(spark, sf_dir).items():
        s = partition_stats(df)
        print(
            f"{name:<32} {s['n_partitions']:>5} "
            f"{s['rows']['max_over_mean']:>13} {s['bytes']['max_over_mean']:>14}"
        )
        print(json.dumps({"scenario": name, "sf_dir": sf_dir, **s}))
    spark.stop()


if __name__ == "__main__":
    main()
