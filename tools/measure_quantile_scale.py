"""sf10 measurement for the round-12 portable quantile sketch.

Claims to verify at 60M rows (lineitem l_extendedprice per returnflag):
1. The histogram build is ONE map-side-combinable aggregation — scan
   speed, register-bounded shuffle (state rows, not data rows).
2. The estimate runs over REGISTERS only (window over ~thousands of
   rows) — effectively free once the state exists.
3. The premium vs the engine-native percentile_approx is bounded and
   buys persistable/mergeable/cross-engine state (the HLL-vs-native
   trade, same framing as NOTES_r11's 2.6s-vs-1.1s).
4. The error guarantee holds against the exact rank value at 60M rows.

Usage: python tools/measure_quantile_scale.py [sf_dir]  (default /tmp/sf10)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_file_loader_spark.operators import sketches  # noqa: E402
from etl_file_loader_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    spark = get_spark("quantile-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_rows = li.count()
    keys = ["l_returnflag"]

    t0 = time.perf_counter()
    hist = sketches.quantile_histogram(li, keys, "l_extendedprice")
    regs = hist.collect()  # register-bounded: safe to collect at ANY scale
    t_build = time.perf_counter() - t0

    reg_df = spark.createDataFrame(regs, hist.schema)
    t1 = time.perf_counter()
    ests = sketches.quantile_estimate(reg_df, keys, [500, 900, 990]).collect()
    t_est = time.perf_counter() - t1

    t2 = time.perf_counter()
    native = li.groupBy(*keys).agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99]).alias("pa")
    ).collect()
    t_native = time.perf_counter() - t2

    # exact truth at p99 for one group, via the same rank definition
    g = sorted({r.l_returnflag for r in regs})[0]
    n_g = sum(r.cnt for r in regs if r.l_returnflag == g)
    r99 = (990 * n_g + 999) // 1000
    t3 = time.perf_counter()
    true99 = (
        li.filter(F.col("l_returnflag") == g)
        .select("l_extendedprice")
        .orderBy("l_extendedprice")
        .limit(r99)
        .orderBy(F.col("l_extendedprice").desc())
        .limit(1)
        .collect()[0][0]
    )
    t_exact = time.perf_counter() - t3
    est99 = next(
        r.est for r in ests if r.l_returnflag == g and r.q_milli == 990
    )

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "rows": n_rows,
                "n_registers": len(regs),
                "build_sec": round(t_build, 2),
                "estimate_sec": round(t_est, 2),
                "native_percentile_approx_sec": round(t_native, 2),
                "exact_rank_query_sec": round(t_exact, 2),
                "p99_group": g,
                "p99_est": est99,
                "p99_true": float(true99),
                "p99_rel_err": round(abs(est99 - float(true99)) / float(true99), 5),
                "bound": 0.011,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
