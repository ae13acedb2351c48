"""sf10 measurement for the round-12 LinkageIndex durability path.

The class docstring's 100 TB story says the lowered master base "would
be written once (bucketed parquet)" — round 12 made that code
(save/load); this tool measures the claim on the 2M-row sf10 part
master: per-session cost of (a) rebuilding the base from the master
scan vs (b) loading the saved base, each followed by the same
link_best feed resolution. The build is once-per-master-version; every
later session pays only (b).

Usage: python tools/measure_linkage_persist.py [sf_dir] (default /tmp/sf10)
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
from etl_file_loader_spark.operators.cache import (  # noqa: E402
    release_operator_caches,
)
from etl_file_loader_spark.session import get_spark  # noqa: E402


def _feed(part):
    """One-deletion dirty feed from the %256==1 slice (the
    fuzzy_link_incremental recipe, thinned for sf10 — the quantity under
    test is base reuse across sessions, not tier-1 throughput, which
    NOTES_r11 sections 4/7b already measure)."""
    src = part.filter(F.col("p_partkey") % 256 == 1).select(
        "p_partkey", "p_name", F.length("p_name").alias("_l")
    )
    pos = (F.col("p_partkey") % (F.col("_l") - 4)) + 3
    name = F.col("p_name")
    return src.select(
        (F.col("p_partkey") + F.lit(5_000_000)).alias("rid"),
        F.concat(
            name.substr(F.lit(1), pos - 1), name.substr(pos + 1, F.col("_l") - pos)
        ).alias("s"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    spark = get_spark("linkage-persist")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    master = part.select(
        F.col("p_partkey").alias("pid"), F.col("p_name").alias("name")
    )
    n_master = master.count()
    feed = _feed(part).localCheckpoint(eager=True)
    n_feed = feed.count()
    path = tempfile.mkdtemp(prefix="linkage_idx_")

    # (a) build-from-master session: lower + pin + write once
    t0 = time.perf_counter()
    idx = dedup_ops.LinkageIndex(master, "pid", "name", max_distance=2)
    t_build = time.perf_counter() - t0
    t1 = time.perf_counter()
    idx.save(path)
    t_save = time.perf_counter() - t1
    t2 = time.perf_counter()
    r_build = idx.link_best(feed, "rid", "s").count()
    t_link_build = time.perf_counter() - t2
    idx.release()
    release_operator_caches()

    # (b) restore session: read the saved base, same link
    t3 = time.perf_counter()
    back = dedup_ops.LinkageIndex.load(spark, path)
    t_load = time.perf_counter() - t3
    t4 = time.perf_counter()
    r_load = back.link_best(feed, "rid", "s").count()
    t_link_load = time.perf_counter() - t4
    assert r_load == r_build

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "master_rows": n_master,
                "feed_rows": n_feed,
                "resolved": r_load,
                "build_sec": round(t_build, 2),
                "save_sec": round(t_save, 2),
                "link_after_build_sec": round(t_link_build, 2),
                "load_sec": round(t_load, 2),
                "link_after_load_sec": round(t_link_load, 2),
                "per_session_cost_rebuild": round(t_build + t_link_build, 2),
                "per_session_cost_restore": round(t_load + t_link_load, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
