"""Per-stage accounting for the R-S record-linkage joins at scale.

The §13 house pattern (NOTES_r10): decompose the operator into its
physical stages and count rows at each, so superlinear growth is visible
as a number, not a hunch. Covers BOTH R-S families:

- ``edit_distance_join`` (PassJoin): base -> segments (master) /
  substrings (feed) -> (seg, La, i) candidate join -> banded-levenshtein
  verify -> distinct answer;
- ``jaccard_join`` (PPJoin): shingle sets -> UNION-wide frequency table
  (the one shuffle shape self-joins don't have) -> canonical order ->
  prefix candidates -> positional filter -> verified answer.

Usage: python tools/account_rs_linkage.py [sf_dir] [feed_modulus] [d]
  feed_modulus M plants one feed record per master with p_partkey % M == 1
  (the tier mix: 60% exact / 20% 1-edit / 10% 2-edit / 10% junk).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_file_loader_spark.operators import dedup as dedup_ops  # noqa: E402
from etl_file_loader_spark.operators.cache import release_operator_caches  # noqa: E402
from etl_file_loader_spark.session import get_spark  # noqa: E402


def planted_feed(part, modulus: int):
    src = part.filter(F.col("p_partkey") % modulus == 1).select(
        "p_partkey",
        "p_name",
        F.length("p_name").alias("_l"),
        (F.floor(F.col("p_partkey") / modulus) % 10).alias("_cls"),
    )
    pos = (F.col("p_partkey") % (F.col("_l") - 4)) + 3
    name = F.col("p_name")
    rid = (F.col("p_partkey") + F.lit(4_000_000_000)).alias("rid")
    exact = src.filter(F.col("_cls") < 6).select(rid, name.alias("s"))
    one = src.filter(F.col("_cls").isin(6, 7)).select(
        rid,
        F.concat(
            name.substr(F.lit(1), pos - 1), name.substr(pos + 1, F.col("_l") - pos)
        ).alias("s"),
    )
    two = src.filter(F.col("_cls") == 8).select(
        rid,
        F.concat(
            name.substr(F.lit(1), pos - 1),
            F.lit("z"),
            name.substr(pos + 1, F.col("_l") - pos),
            F.lit("x"),
        ).alias("s"),
    )
    junk = src.filter(F.col("_cls") == 9).select(
        rid, F.concat(F.lit("qq"), F.reverse(name), F.lit("qq")).alias("s")
    )
    return exact.unionByName(one).unionByName(two).unionByName(junk)


def stage(label: str, fn):
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"  {label:<42s} {n:>14,}  ({dt:6.1f}s)")
    return n


def account_edit_distance(spark, left, feed, d: int):
    print(f"edit_distance_join stages (d={d}):")
    k = d + 1
    lbase = dedup_ops.pin(dedup_ops._pj_base(left, "pid", "name"))
    rbase = dedup_ops.pin(dedup_ops._pj_base(feed, "rid", "s"))
    stage("master rows", lbase.count)
    stage("feed rows", rbase.count)
    print(f"  partitions: master={lbase.rdd.getNumPartitions()} feed={rbase.rdd.getNumPartitions()}")
    segs = dedup_ops._pj_segments(lbase, k, "_lid", "_sl")
    subs = dedup_ops._pj_substrings(
        rbase, d, include_longer=True, id_alias="_rid", str_alias="_sr"
    )
    n_segs = stage("master segment rows", segs.count)
    n_subs = stage("feed substring rows", subs.count)
    cand = segs.join(subs, ["_la", "_i", "_seg"])
    n_cand = stage("candidate rows (pre-verify)", cand.count)
    verified = cand.withColumn(
        "_dist", F.levenshtein(F.col("_sl"), F.col("_sr"), d)
    ).filter(F.col("_dist") >= 0)
    n_ver = stage("verified rows (pre-distinct)", verified.count)
    answer = dedup_ops.edit_distance_join(left, feed, "pid", "rid", "name", "s", d)
    n_ans = stage("distinct answer pairs", answer.count)
    resolved = dedup_ops.link_best_match(
        left, feed, "pid", "rid", "name", "s", max_distance=d, tiered=True
    )
    stage("tiered best-match resolutions", resolved.count)
    release_operator_caches()
    print(
        f"  ratios: cand/subs={n_cand / max(n_subs, 1):.1f}"
        f"  verified/cand={n_ver / max(n_cand, 1):.3f}"
        f"  answer/verified={n_ans / max(n_ver, 1):.3f}"
    )


def account_jaccard(spark, left, feed, n: int = 5, threshold: float = 0.5):
    print(f"jaccard_join stages (n={n}, t={threshold}):")
    la = dedup_ops._ppjoin_sets(left, "pid", "name", n)
    rb = dedup_ops._ppjoin_sets(feed, "rid", "s", n)
    n_l = stage("master shingle rows", la.count)
    n_r = stage("feed shingle rows", rb.count)
    union_freq = (
        la.select("_sh").unionAll(rb.select("_sh")).groupBy("_sh")
        .agg(F.count(F.lit(1)).alias("_f"))
    )
    stage("UNION-wide distinct shingles (freq table)", union_freq.count)
    answer = dedup_ops.jaccard_join(
        left, feed, "pid", "rid", "name", "s", n=n, threshold=threshold
    )
    stage("verified answer pairs", answer.count)
    release_operator_caches()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    modulus = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("account-rs-linkage")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    left = part.select(
        F.col("p_partkey").alias("pid"), F.col("p_name").alias("name")
    ).localCheckpoint(eager=True)
    feed = planted_feed(part, modulus).localCheckpoint(eager=True)
    print(f"sf_dir={sf_dir} master={left.count():,} feed={feed.count():,}")
    t0 = time.perf_counter()
    account_edit_distance(spark, left, feed, d)
    print(f"edit-distance family total: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    account_jaccard(spark, left, feed)
    print(f"jaccard family total: {time.perf_counter() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
