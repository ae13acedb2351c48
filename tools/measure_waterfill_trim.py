"""Scale probe for the round-13 operators: quantile_trim vs the native
percentile_approx alternative, and mixture_waterfill wall time.

Usage: python tools/measure_waterfill_trim.py [sf_dir]   (default /tmp/sf10)

quantile_trim's competitor is the obvious two-pass recipe a user would
write by hand: approxQuantile-per-group via percentile_approx, join, band
filter. Same pass count, so parity is the bar — the sketch path buys
engine-portable, mergeable, persistable registers (and the SQL-replayable
oracle) and must not pay materially for them.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_file_loader_spark.operators.sampling import mixture_waterfill  # noqa: E402
from etl_file_loader_spark.operators.sketches import quantile_trim  # noqa: E402
from etl_file_loader_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    spark = get_spark("measure-waterfill-trim")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = li.count()
    print(f"lineitem rows: {n:,}")

    t0 = time.time()
    kept = quantile_trim(
        li, ["l_returnflag"], "l_extendedprice", 100, 900
    ).count()
    t_sketch = time.time() - t0
    print(f"quantile_trim [p10,p90]: kept {kept:,} in {t_sketch:.1f}s")

    # native alternative: percentile_approx bounds -> broadcast join -> band
    t0 = time.time()
    bounds = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.1).alias("_q_lo"),
        F.percentile_approx("l_extendedprice", 0.9).alias("_q_hi"),
    )
    v = F.col("l_extendedprice")
    kept_native = (
        li.join(F.broadcast(bounds), "l_returnflag")
        .filter(v.isNotNull() & ~F.isnan(v) & (v >= F.col("_q_lo")) & (v <= F.col("_q_hi")))
        .count()
    )
    t_native = time.time() - t0
    print(
        f"percentile_approx twin:  kept {kept_native:,} in {t_native:.1f}s "
        f"(ratio sketch/native {t_sketch / t_native:.2f})"
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select("lang", F.col("n_chars").alias("n"))
    total = toks.agg(F.sum("n")).collect()[0][0]
    t0 = time.time()
    rows = mixture_waterfill(
        toks, "lang", "n", {"en": 100, "de": 400, "zh": 300, "fr": 200}, int(total) // 2
    ).collect()
    t_wf = time.time() - t0
    print(f"mixture_waterfill over {docs.count():,} docs: {t_wf:.1f}s")
    for r in sorted(rows, key=lambda r: r["lang"]):
        print(
            f"  {r['lang']}: avail={r['avail']:,} w={r['w_milli']} "
            f"capped={r['capped']} alloc={r['alloc']:,} rate={r['rate']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
