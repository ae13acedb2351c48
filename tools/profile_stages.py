"""Attribute a query's wall time to jobs/stages via the Spark REST API.

Usage: python tools/profile_stages.py [--reps=N] [--sf=DIR] q1 q2 ...

Runs each named suite query in one warm session with the bench's timed
region (builder + noop sink), labelling every rep with
setJobDescription("<name>#<rep>"), then pulls /api/v1/applications/.../jobs
and .../stages and prints, per query:

- wall seconds per rep (same convention as tools/profile_queries.py)
- job count and summed job wall time for the LAST rep (fixed scheduling
  overhead shows up as many small jobs; compute shows up as few long ones)
- per-stage executorRunTime / shuffle read+write bytes / task count for
  the heaviest stages of the last rep

This is the guide-§1 "empirical" loop without a browser: decide whether a
slow query is shuffle-bound, compute-bound, or overhead-bound before
touching it.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_file_loader_spark import suite  # noqa: E402
from etl_file_loader_spark.operators.cache import release_operator_caches  # noqa: E402
from etl_file_loader_spark.session import get_spark  # noqa: E402


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.loads(r.read())


def main() -> None:
    reps = 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        else:
            names.append(a)

    spark = get_spark("profile-stages")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import col, pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(64).repartition(32).select(_warm(col("id"))).collect()
    from etl_file_loader_spark import fixtures

    fixtures.clustered_embeddings(spark, n=8000)
    suite._derived_partsupp(spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in names:
        times = []
        for r in range(reps):
            label = f"{name}#{r}"
            spark.sparkContext.setJobDescription(label)
            t0 = time.perf_counter()
            df = suite.QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            release_operator_caches()
            import gc

            gc.collect()
        spark.sparkContext.setJobDescription(None)

        last = f"{name}#{reps - 1}"
        jobs = [j for j in _api(base, "/jobs") if j.get("description") == last]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        job_ms = 0
        for j in jobs:
            t0 = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            t1 = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            job_ms += max(0, time.mktime(t1) - time.mktime(t0))
        stages = []
        for sid in stage_ids:
            try:
                for att in _api(base, f"/stages/{sid}"):
                    stages.append(att)
            except Exception:
                pass
        stages.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(json.dumps({
            "query": name,
            "wall_reps": times,
            "last_rep_jobs": len(jobs),
            "last_rep_job_wall_sec_approx": job_ms,
            "top_stages": [
                {
                    "stage": s["stageId"],
                    "name": s.get("name", "")[:70],
                    "tasks": s.get("numCompleteTasks"),
                    "run_ms": s.get("executorRunTime"),
                    "cpu_ms": (s.get("executorCpuTime") or 0) // 1_000_000,
                    "shuf_r_mb": round((s.get("shuffleReadBytes") or 0) / 1e6, 1),
                    "shuf_w_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6, 1),
                    "fetch_wait_ms": s.get("shuffleFetchWaitTime"),
                    "input_mb": round((s.get("inputBytes") or 0) / 1e6, 1),
                }
                for s in stages[:8]
            ],
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
