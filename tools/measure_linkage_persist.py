"""sf10 measurement for the LinkageIndex durability path — round 13:
PROCESS-ISOLATED legs.

The class docstring's 100 TB story says the lowered master base "would
be written once (bucketed parquet)"; round 12 made that code (save/
load) and measured restore+link 72.9 s vs rebuild+link 106.5 s — but
both legs ran in ONE JVM, so the restore leg was warmer (NOTES_r12 §12's
own caveat). This version runs each leg in a FRESH python+JVM process
(`--leg=...` child mode), so neither leg inherits the other's JIT/page
cache/broadcast state; the save leg runs first and is the
once-per-master-version cost the index amortizes.

Usage: python tools/measure_linkage_persist.py [sf_dir]   (orchestrator)
       python tools/measure_linkage_persist.py --leg={save,rebuild,restore} sf_dir path
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _feed(part):
    """One-deletion dirty feed from the %256==1 slice (the
    fuzzy_link_incremental recipe, thinned for sf10 — the quantity under
    test is base reuse across sessions, not tier-1 throughput, which
    NOTES_r11 sections 4/7b already measure)."""
    from pyspark.sql import functions as F

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


def _leg(which: str, sf_dir: str, path: str) -> None:
    from pyspark.sql import functions as F

    from etl_file_loader_spark.operators import dedup as dedup_ops
    from etl_file_loader_spark.session import get_spark

    spark = get_spark(f"linkage-persist-{which}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm floor

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    master = part.select(
        F.col("p_partkey").alias("pid"), F.col("p_name").alias("name")
    )
    feed = _feed(part).localCheckpoint(eager=True)
    out: dict = {"leg": which, "feed_rows": feed.count()}

    if which == "save":
        t0 = time.perf_counter()
        idx = dedup_ops.LinkageIndex(master, "pid", "name", max_distance=2)
        out["build_sec"] = round(time.perf_counter() - t0, 2)
        t1 = time.perf_counter()
        idx.save(path)
        out["save_sec"] = round(time.perf_counter() - t1, 2)
        out["master_rows"] = master.count()
    elif which == "rebuild":
        t0 = time.perf_counter()
        idx = dedup_ops.LinkageIndex(master, "pid", "name", max_distance=2)
        out["resolved"] = idx.link_best(feed, "rid", "s").count()
        out["per_session_cost_sec"] = round(time.perf_counter() - t0, 2)
    elif which == "restore":
        t0 = time.perf_counter()
        idx = dedup_ops.LinkageIndex.load(spark, path)
        out["resolved"] = idx.link_best(feed, "rid", "s").count()
        out["per_session_cost_sec"] = round(time.perf_counter() - t0, 2)
    else:
        raise SystemExit(f"unknown leg {which}")
    print("LEG_JSON " + json.dumps(out))
    spark.stop()


def _run_leg(which: str, sf_dir: str, path: str) -> dict:
    proc = subprocess.run(
        [sys.executable, __file__, f"--leg={which}", sf_dir, path],
        capture_output=True, text=True, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("LEG_JSON "):
            return json.loads(line[len("LEG_JSON "):])
    raise SystemExit(
        f"leg {which} produced no result:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1].startswith("--leg="):
        _leg(sys.argv[1].split("=", 1)[1], sys.argv[2], sys.argv[3])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    path = tempfile.mkdtemp(prefix="linkage_idx_")
    save = _run_leg("save", sf_dir, path)
    rebuild = _run_leg("rebuild", sf_dir, path)
    restore = _run_leg("restore", sf_dir, path)
    assert rebuild["resolved"] == restore["resolved"], (rebuild, restore)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "isolation": "fresh process per leg",
                "master_rows": save["master_rows"],
                "feed_rows": rebuild["feed_rows"],
                "resolved": restore["resolved"],
                "one_time_build_sec": save["build_sec"],
                "one_time_save_sec": save["save_sec"],
                "per_session_cost_rebuild": rebuild["per_session_cost_sec"],
                "per_session_cost_restore": restore["per_session_cost_sec"],
                "restore_speedup": round(
                    rebuild["per_session_cost_sec"] / restore["per_session_cost_sec"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
