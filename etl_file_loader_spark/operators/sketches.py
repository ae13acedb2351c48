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


def cms_hash(col: Column, row: int, width: int) -> Column:
    """CMS cell index for hash row ``row``: md5-prefix of 'r|value' mod
    width — deterministic, engine-portable (DuckDB twin:
    ``CAST('0x' || substr(md5(r || '|' || x), 1, 15) AS BIGINT) % w``)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(str(row)), col.cast("string"))),
                1,
                _HEX_DIGITS,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_sketch(df: DataFrame, col: str, depth: int = 4, width: int = 256) -> DataFrame:
    """Count-min sketch of ``col``'s frequency distribution: a
    depth x width counter matrix as rows (r, c, cnt) — the heavy-hitter
    complement to KMV's distinct counting. Deterministic md5 row hashes,
    so the sketch is cross-engine replayable; mergeable by cell-wise
    addition (``cms_merge``); point estimates never undercount
    (``cms_query`` = min over rows, classic CMS upper-bound guarantee).

    Plan shape: explode each record into ``depth`` (r, c) cells — still
    scan-shaped — then ONE hash agg whose map-side partials collapse to
    at most depth*width cells per task: shuffle is O(depth*width)
    regardless of data size. The sketch fits in a broadcast at any scale.
    """
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        cms_hash(F.col(col), r, width).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_cell")
    ).select("_cell.r", "_cell.c")
    return cells.groupBy("r", "c").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge CMS sketches built with the same (depth, width): cell-wise
    addition — one group-sized agg."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    sketch: DataFrame, items: DataFrame, item_col: str, depth: int, width: int
) -> DataFrame:
    """Point-estimate the frequency of each row of ``items``: min over
    the depth cells the item hashes to (>= the true count always; equal
    when the item's cells saw no collisions). The sketch side is
    depth*width rows — Catalyst broadcasts it; the probe is a narrow
    join per hash row, no shuffle of the item side beyond the final agg."""
    probes = items.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        cms_hash(F.col(item_col), r, width).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_cell"),
    ).select(item_col, "_cell.r", "_cell.c")
    j = probes.join(F.broadcast(sketch), ["r", "c"], "left").select(
        item_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return j.groupBy(item_col).agg(F.min("cnt").alias("est_count"))


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
