"""sf1+ measurement for the round-13 bucketed persisted-index variant.

persist.py's old prose said a bucketed saveAsTable "would additionally
co-locate the probe join"; round 13 made it code. This tool quantifies
it on the sf1 documents corpus: build one NearDupIndex, save it twice
(plain parquet vs bucketed on BOTH probe-join keys), restore each, and
run the same flag() probe. Reported per variant: the Exchange count on
the index side of the probe join (the plan-shape claim) and the probe
wall time (same-session restore, same batch, broadcast disabled so the
join shape is the comparable one).

Usage: python tools/measure_bucketed_restore.py [sf_dir] [n_buckets]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_file_loader_spark.operators import dedup as dedup_ops  # noqa: E402
from etl_file_loader_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("bucketed-restore")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seed = docs.filter(F.col("doc_id") % 4 != 3)
    batch = docs.filter(F.col("doc_id") % 4 == 3).localCheckpoint(eager=True)
    n_batch = batch.count()

    idx = dedup_ops.NearDupIndex(seed, "doc_id", "text")
    ppath = tempfile.mkdtemp(prefix="ndi_plain_")
    bpath = tempfile.mkdtemp(prefix="ndi_bucket_")
    idx.save(ppath)
    t0 = time.perf_counter()
    idx.save(bpath, bucket_by=["band_idx", "band_hash"], n_buckets=n_buckets)
    t_bucketed_save = time.perf_counter() - t0

    out = {"sf_dir": sf_dir, "n_buckets": n_buckets, "batch_rows": n_batch,
           "bucketed_save_sec": round(t_bucketed_save, 2)}
    flags = {}
    for name, path in (("plain", ppath), ("bucketed", bpath)):
        back = dedup_ops.NearDupIndex.load(spark, path)
        probe = back.flag(batch)
        plan = probe._jdf.queryExecution().executedPlan().toString()
        t1 = time.perf_counter()
        flagged = probe.filter(F.col("is_near_dup") == 1).count()
        wall = time.perf_counter() - t1
        flags[name] = flagged
        out[name] = {
            "exchanges": plan.count("Exchange hashpartitioning"),
            "bucketed_scan": "Bucketed: true" in plan,
            "flag_wall_sec": round(wall, 2),
            "flagged": flagged,
        }
    assert flags["plain"] == flags["bucketed"], flags
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
