"""KMV (K-minimum-values) distinct-count sketch: deterministic, mergeable,
cross-engine replayable.

The complement to the HLL++ gate (suite ``sketch_distinct_check``): HLL
is engine-internal, so only its ERROR is checkable; KMV's state is a
pure function of the data (the k smallest md5-derived 60-bit hashes of
the distinct values), so the sketch itself, its merge, and its estimate
are all EXACTLY replayable in SQL — the 100 TB distinct-count path when
you also need auditability or cross-system agreement (two engines
hashing the same keys produce the same sketch bit-for-bit).

Estimator (Bar-Yossef et al.): with hashes uniform on [0, M), if the
k-th smallest distinct hash is h_k, the distinct count ≈ (k-1) * M /
h_k; groups with fewer than k distinct values are EXACT (the sketch
holds all their hashes). Union-merge: union the hash sets, keep the k
smallest — the same estimator then covers the union (set semantics make
re-merging idempotent and order-free).

Plan shape: dedup to (group, hash) — one hash agg with map-side
partials — then a per-group k-smallest via row_number, which Spark's
WindowGroupLimit pushes BELOW the exchange (each map task pre-keeps only
its local k smallest), then one group agg packing the array. No
collect_set of a whole group's values anywhere; per-group state is k
longs regardless of cardinality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 15 hex digits = 60 bits: fits signed int64, dense enough that hash
# collisions are ~n^2 / 2^60 — negligible at any verification scale
_HEX_DIGITS = 15
KMV_M = 1 << (4 * _HEX_DIGITS)


def kmv_hash(col: Column) -> Column:
    """60-bit md5-prefix hash (the house portable idiom: DuckDB twin is
    ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, _HEX_DIGITS), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame, keys: list[str], col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV state: ``kmv`` = sorted array of the k smallest
    distinct hashes of ``col``, ``n_kept`` = its length (< k means the
    group's distinct count is exact)."""
    d = (
        df.select(*keys, kmv_hash(F.col(col)).alias("_h"))
        .groupBy(*keys, "_h")
        .agg(F.count(F.lit(1)).alias("_"))
        .drop("_")
    )
    w = Window.partitionBy(*keys).orderBy("_h")
    top = d.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= k)
    return top.groupBy(*keys).agg(
        F.sort_array(F.collect_list("_h")).alias("kmv"),
        F.count(F.lit(1)).alias("n_kept"),
    )


def kmv_merge(states: list[DataFrame], keys: list[str], k: int = 64) -> DataFrame:
    """Union-merge KMV states built with the same hash: explode, set-union
    per group, keep the k smallest. Same WindowGroupLimit shape as the
    build — merge cost ∝ groups * k, never data size."""
    from functools import reduce

    u = reduce(
        lambda a, b: a.unionByName(b),
        [s.select(*keys, F.explode("kmv").alias("_h")) for s in states],
    )
    d = u.groupBy(*keys, "_h").agg(F.count(F.lit(1)).alias("_")).drop("_")
    w = Window.partitionBy(*keys).orderBy("_h")
    top = d.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= k)
    return top.groupBy(*keys).agg(
        F.sort_array(F.collect_list("_h")).alias("kmv"),
        F.count(F.lit(1)).alias("n_kept"),
    )


def kmv_estimate(state: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate per group: exact ``n_kept`` below k, else
    ``(k-1) * M / h_k`` (one IEEE division — replayable). Adds
    ``distinct_est`` (double) and ``is_exact``."""
    h_k = F.element_at(F.col("kmv"), k)
    return state.withColumn(
        "is_exact", (F.col("n_kept") < k).cast("int")
    ).withColumn(
        "distinct_est",
        F.when(
            F.col("n_kept") < k, F.col("n_kept").cast("double")
        ).otherwise(F.lit(float(k - 1)) * F.lit(float(KMV_M)) / h_k.cast("double")),
    )
