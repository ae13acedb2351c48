"""sf10 measurements for the round-11 web/URL and portable-HLL operators.

The §13 house pattern: per-stage timing and row accounting at the largest
locally-generatable scale, so every scale claim in the docstrings is a
measured number. Three workloads:

1. URL canonicalization throughput — url_normalize + url_parse +
   registrable_domain as a narrow projection over a synthetic URL per
   lineitem row (60M at sf10): the claim is scan-speed, no shuffle.
2. domain_stats vs domain_cap — one combinable agg vs one window over the
   bounded domain key: the claim is that the cap's shuffle is bounded by
   domain cardinality, not corpus size, and survivors are capped.
3. Portable HLL vs native approx_count_distinct over l_partkey (x groups)
   — the HONEST comparison: the md5-hash portable registers cost more
   than HLL++'s internal xxhash; what they buy is a persistable,
   mergeable, engine-portable register table. Also measures the
   incremental-maintenance shape: per-slice sketches + hll_merge vs
   recount of the union.

Usage: python tools/measure_web_hll_scale.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_file_loader_spark.operators import sketches  # noqa: E402
from etl_file_loader_spark.operators import web as web_ops  # noqa: E402
from etl_file_loader_spark.session import get_spark  # noqa: E402


def _noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def synth_urls(li):
    k = F.col("l_orderkey")
    base = F.substring(F.md5((k % 100_000).cast("string")), 1, 8)
    tld = (
        F.when(k % 4 == 0, ".com").when(k % 4 == 1, ".co.uk")
        .when(k % 4 == 2, ".org").otherwise(".com.au")
    )
    return li.select(
        k.alias("id"),
        F.concat(
            F.when(k % 3 == 0, "HTTPS").otherwise("https"),
            F.lit("://"),
            F.when(k % 2 == 0, "WWW.").otherwise("sub."),
            base, tld,
            F.when(k % 5 == 0, ":8080").when(k % 5 == 1, ":443").otherwise(""),
            F.lit("/p/"), k.cast("string"),
            F.lit("?utm_source=x&id="), k.cast("string"),
        ).alias("url"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    spark = get_spark()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = li.count()
    print(f"lineitem rows: {n:,}")

    urls = synth_urls(li)
    t_base = _noop(urls)
    print(f"baseline: synth-url projection scan {t_base:.1f}s")

    parsed = urls.select(
        "id",
        web_ops.url_normalize(F.col("url")).alias("u"),
        web_ops.registrable_domain(
            web_ops.url_parse(F.col("url")).getField("host")
        ).alias("domain"),
    )
    t_norm = _noop(parsed)
    print(f"url_normalize + parse + registrable_domain: {t_norm:.1f}s "
          f"({n / t_norm / 1e6:.1f}M rows/s; overhead vs scan "
          f"{t_norm / t_base:.2f}x)")

    t0 = time.perf_counter()
    stats = web_ops.domain_stats(urls, "url")
    n_domains = stats.count()
    t_stats = time.perf_counter() - t0
    print(f"domain_stats: {n_domains:,} domains in {t_stats:.1f}s")

    t0 = time.perf_counter()
    capped = web_ops.domain_cap(urls, "url", 100, "id")
    n_kept = capped.count()
    t_cap = time.perf_counter() - t0
    print(f"domain_cap(100): kept {n_kept:,}/{n:,} in {t_cap:.1f}s")

    # --- HLL vs native ---
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t0 = time.perf_counter()
    native = orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("acd")
    ).collect()
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    regs = sketches.hll_registers(orders, ["o_orderstatus"], "o_custkey", p=12)
    est = sketches.hll_estimate(regs, ["o_orderstatus"], p=12).collect()
    t_hll = time.perf_counter() - t0

    t0 = time.perf_counter()
    exact = orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n")
    ).collect()
    t_exact = time.perf_counter() - t0
    ex = {r["o_orderstatus"]: r["n"] for r in exact}
    print(f"\ndistinct o_custkey per o_orderstatus ({orders.count():,} rows):")
    print(f"  native approx_count_distinct: {t_native:.1f}s")
    print(f"  portable HLL (p=12):          {t_hll:.1f}s")
    print(f"  exact countDistinct:          {t_exact:.1f}s")
    for r in est:
        g = r["o_orderstatus"]
        err = abs(r["hll_est"] - ex[g]) / ex[g] * 100
        print(f"  grp {g}: exact {ex[g]:,} hll {r['hll_est']:,.0f} ({err:.2f}% err)")

    # incremental maintenance: 4 slices sketched separately, then merged
    t0 = time.perf_counter()
    slices = [
        sketches.hll_registers(
            orders.filter(F.col("o_orderkey") % 4 == i),
            ["o_orderstatus"], "o_custkey", p=12,
        )
        for i in range(4)
    ]
    merged = sketches.hll_merge(slices, ["o_orderstatus"])
    est_m = sketches.hll_estimate(merged, ["o_orderstatus"], p=12).collect()
    t_merged = time.perf_counter() - t0
    agree = sorted((r["o_orderstatus"], r["hll_est"]) for r in est_m) == sorted(
        (r["o_orderstatus"], r["hll_est"]) for r in est
    )
    print(f"  4-slice sketch+merge: {t_merged:.1f}s; merged est == direct: {agree}")


if __name__ == "__main__":
    main()
