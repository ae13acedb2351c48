"""Long-stream evidence for the round-13 absorb checkpoint release.

Round 12's probe established that localCheckpoint ENTRIES are
strong-referenced by SparkContext until an explicit RDD unpersist; the
round-13 fix releases each superseded checkpoint inside absorb. This
tool shows the block-manager consequence over a LONG stream: K absorbs
into a NearDupIndex + an HLLIndex while sampling the persistent-RDD
count and the block-manager memory used after every absorb. Fixed
behavior: both series are FLAT (one live checkpoint per index);
pre-fix both grew linearly with K — evictable memory pressure, then
unbounded local-disk growth over a stream's lifetime.

Usage: python tools/measure_absorb_release.py [sf_dir] [k_absorbs]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_file_loader_spark.operators import sketches  # noqa: E402
from etl_file_loader_spark.operators.dedup import NearDupIndex  # noqa: E402
from etl_file_loader_spark.session import get_spark  # noqa: E402


def _mem_used(spark) -> int:
    """Bytes of storage memory in use across the block manager (driver =
    the only executor on local mode)."""
    status = spark.sparkContext._jsc.sc().getExecutorMemoryStatus()
    it = status.iterator()
    used = 0
    while it.hasNext():
        kv = it.next()
        total, free = kv._2()._1(), kv._2()._2()
        used += total - free
    return used


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = get_spark("absorb-release")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ndi = NearDupIndex(docs.filter(F.col("doc_id") % (k + 1) == 0), "doc_id", "text")
    hll = sketches.HLLIndex(
        orders.filter(F.col("o_orderkey") % (k + 1) == 0),
        ["o_orderstatus"], "o_custkey",
    )

    samples = []
    for i in range(1, k + 1):
        ndi.absorb(docs.filter(F.col("doc_id") % (k + 1) == i))
        hll.absorb(orders.filter(F.col("o_orderkey") % (k + 1) == i))
        samples.append(
            {
                "absorb": i,
                "persistent_rdds": sc._jsc.sc().getPersistentRDDs().size(),
                "storage_mem_used": _mem_used(spark),
            }
        )
    flat_rdds = len({s["persistent_rdds"] for s in samples}) == 1
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "k_absorbs": k,
                "persistent_rdds_series": [s["persistent_rdds"] for s in samples],
                "storage_mem_first_last": [
                    samples[0]["storage_mem_used"],
                    samples[-1]["storage_mem_used"],
                ],
                "flat_persistent_rdds": flat_rdds,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
