"""Z-order (Morton curve) data layout for multi-dimensional scan pruning.

The layout tool behind ``OPTIMIZE ... ZORDER BY`` in lakehouse engines:
rows are sorted along a space-filling curve over several columns so that
parquet row-group min/max stats stay tight on EVERY participating column
at once — a range predicate on any of them prunes row groups, not just a
predicate on the lead sort key.

Three pieces, smallest-to-largest:

- ``interleave_bits(cols, bits)``: the pure Morton interleave — bit k of
  column c lands at curve position ``k * n_cols + c``. Plain integer
  arithmetic (shift/and/sum), JVM-side, exactly replayable in SQL.
- ``exact_buckets(df, col, bits)``: EXACT equi-depth bucketing via a
  global rank window — ``floor((rank-1) * 2^bits / n)``, deterministic
  under ties (rank, not row_number), bit-reproducible cross-engine (the
  quotient's distance to the next-lower integer is >= 1/n, far above a
  double ulp, so floor agrees between engines). The global window is a
  single-partition sort: the verification-scale path, NOT 100 TB.
- ``quantile_buckets(df, col, bits, ...)``: the 100 TB path — bucket
  boundaries come from ``approxQuantile`` over a sketch (the same
  machinery ``repartitionByRange`` uses), then bucketing is a NARROW
  comparison-count against ~2^bits literal boundaries: no window, no
  shuffle. Sample-dependent, so verified behaviorally (monotone,
  bounded, covers the range) rather than by value oracle.

``zorder_layout`` composes: bucket each column, interleave, then
``repartitionByRange(z).sortWithinPartitions(z)`` — ONE range shuffle,
the same cost as any global sort, after which file-level min/max stats
prune on all z-ordered columns.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave ``bits`` low bits of each column (already-bucketed
    non-negative ints): bit k of col c -> output bit ``k * len(cols) + c``.

    ``len(cols) * bits`` must stay <= 63: higher bits would land in/past
    the int64 sign bit, silently producing negative zval (and breaking
    the repo's <=63-bit packed-integer rule — DuckDB errors on BIGINT
    overflow where Java wraps)."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"interleave_bits: {n} cols x {bits} bits = {n * bits} curve "
            "bits > 63 (int64 sign bit); lower bits to "
            f"{63 // n} or fewer per column"
        )
    terms: list[Column] = []
    for c_idx, c in enumerate(cols):
        lc = c.cast("long")
        for k in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(lc, k).bitwiseAND(F.lit(1)), k * n + c_idx
                )
            )
    return reduce(lambda a, b: a + b, terms)


def exact_buckets(
    df: DataFrame, col: str, bits: int = 16, out: str | None = None
) -> DataFrame:
    """Exact equi-depth bucket id in [0, 2^bits): deterministic, oracle-
    replayable; global-window cost (verification scale only)."""
    b = 1 << bits
    out = out or f"_zb_{col}"
    w = Window.orderBy(col)
    nw = Window.partitionBy()
    return df.withColumn(
        out,
        F.least(
            F.floor(
                ((F.rank().over(w) - F.lit(1)) * F.lit(b))
                / F.count(F.lit(1)).over(nw)
            ),
            F.lit(b - 1).cast("long"),
        ).cast("long"),
    )


def quantile_buckets(
    df: DataFrame,
    col: str,
    bits: int = 16,
    out: str | None = None,
    relative_error: float = 0.001,
) -> DataFrame:
    """The 100 TB bucketing path: boundaries from ``approxQuantile`` (one
    sketch pass), then a narrow comparison-count against the literal
    boundary array — no window, no shuffle, whole-stage codegen."""
    b = 1 << bits
    out = out or f"_zb_{col}"
    probs = [i / b for i in range(1, b)]
    bounds = df.stat.approxQuantile(col, probs, relative_error)
    # heavy ties collapse boundaries; bucket = #boundaries strictly below
    uniq = sorted(set(bounds))
    arr = F.array(*[F.lit(float(x)) for x in uniq])
    idx = F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, bound: acc
        + F.when(F.col(col).cast("double") > bound, 1).otherwise(0).cast("long"),
    )
    return df.withColumn(out, F.least(idx, F.lit(b - 1).cast("long")))


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    n_partitions: int | None = None,
    exact: bool = False,
) -> DataFrame:
    """Z-order ``df`` by ``cols``: bucket each column (``exact`` rank
    buckets for small/oracle corpora, sampled quantile buckets at scale),
    Morton-interleave into ``zval``, then range-partition + sort along
    the curve. Keeps the original columns plus ``zval``."""
    if len(cols) * bits > 63:
        raise ValueError(
            f"zorder_layout: {len(cols)} cols x {bits} bits exceeds the "
            f"63-bit int64 budget; use bits <= {63 // len(cols)}"
        )
    bucketed = df
    for c in cols:
        name = f"_zb_{c}"
        if exact:
            bucketed = exact_buckets(bucketed, c, bits, out=name)
        else:
            bucketed = quantile_buckets(bucketed, c, bits, out=name)
    z = bucketed.withColumn(
        "zval", interleave_bits([F.col(f"_zb_{c}") for c in cols], bits)
    ).drop(*[f"_zb_{c}" for c in cols])
    if n_partitions:
        z = z.repartitionByRange(n_partitions, "zval").sortWithinPartitions("zval")
    return z
