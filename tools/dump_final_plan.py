"""Dump the POST-EXECUTION adaptive plan of named suite queries.

Usage: python tools/dump_final_plan.py <suffix> q1 q2 ...

Runs each named query end-to-end through the bench's noop sink, then
pulls the executed SQL plan (AdaptiveSparkPlan isFinalPlan=true — the
plan the SQL tab shows, including AQEShuffleRead coalescing and
ReusedExchange dedup that a static `.explain()` cannot show) from the
Spark UI REST API, and writes plans/r15/<query>_<suffix>.txt.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_file_loader_spark import suite  # noqa: E402
from etl_file_loader_spark.operators.cache import release_operator_caches  # noqa: E402
from etl_file_loader_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-final-plan")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    for name in names:
        df = suite.QUERIES[name](spark, sf_dir)
        spark.sparkContext.setJobDescription(f"final-plan:{name}")
        df.write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(None)
        url = f"{base}/sql?details=true&planDescription=true&length=1000"
        with urllib.request.urlopen(url) as r:
            execs = json.loads(r.read())
        # the noop save is the most recent completed execution
        last = max(execs, key=lambda e: e["id"])
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(last["planDescription"])
        n_reused = last["planDescription"].count("ReusedExchange")
        print(
            f"wrote {path} "
            f"({len(last['planDescription'].splitlines())} lines, "
            f"{n_reused} ReusedExchange)"
        )
        release_operator_caches()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
