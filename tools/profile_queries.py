"""Isolate named suite queries for optimization work (guide §1).

Usage: python tools/profile_queries.py [--reps=N] [--plans=DIR] [--sf=DIR] q1 q2 ...

Runs each named query through the SAME timed region as bench.py (builder
call + noop sink, operator-cache release after), ``reps`` times, in one
warm session; prints per-rep seconds and the median. With --plans=DIR it
also writes ``DIR/<name>.txt`` with the .explain("formatted") output of
the query's final frame (plan capture is driver-only, untimed).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_file_loader_spark import suite  # noqa: E402
from etl_file_loader_spark.operators.cache import release_operator_caches  # noqa: E402
from etl_file_loader_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = 3
    plans_dir = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--plans="):
            plans_dir = a.split("=", 1)[1]
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        else:
            names.append(a)

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import col, pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(64).repartition(32).select(_warm(col("id"))).collect()
    from etl_file_loader_spark import fixtures

    fixtures.clustered_embeddings(spark, n=8000)
    # partsupp cache warm like the bench does before the query list
    suite._derived_partsupp(spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in names:
        times = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name}#{r}")
            t0 = time.perf_counter()
            df = suite.QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            if plans_dir and r == 0:
                Path(plans_dir).mkdir(parents=True, exist_ok=True)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                (Path(plans_dir) / f"{name}.txt").write_text(plan)
            release_operator_caches()
            import gc

            gc.collect()
        med = sorted(times)[len(times) // 2]
        out[name] = {"reps": times, "median": med}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": {k: v["median"] for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
