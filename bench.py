"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is forced end-to-end with the
noop sink (computes every column; count() would let Catalyst prune the plan).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_file_loader_spark import suite  # noqa: E402
from etl_file_loader_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    # OLAP surface
    "q1_pricing_summary",
    "q3_top_orders",
    "customer_order_stats",
    "events_hourly",
    "top_events_per_user",
    "sessionization",
    # ingestion pipeline operators (the reference's benchmark shape:
    # read + validate + hash over the full lineitem)
    "validate_split",
    "row_hash_customer",
    "grain_audit",
    "merge_upsert",
    "publish_counts",
    # advanced joins
    "asof_join",
    "range_join_count",
    "pivot_returnflag",
    "rollup_orders",
    # training-data extensions (documents-table ops + scale-path variants
    # over sf-growing tables)
    "dedup_exact",
    "dedup_minhash_signature",
    "dedup_lsh_candidates",
    "dedup_simhash",
    "dedup_exact_lineitem",
    "dedup_minhash_orders",
    "similarity_topk",
    "text_stats",
    "text_quality_lang",
]


def run_one(spark, name: str, sf_dir: str) -> float:
    df = suite.QUERIES[name](spark, sf_dir)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warmup outside timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        times[name] = round(run_one(spark, name, sf_dir), 3)
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_total_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
