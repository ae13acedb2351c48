"""Incremental aggregate maintenance (materialized-view delta merge).

The warehouse pattern that keeps a 100 TB fact table's rollups fresh
without rescanning it: maintain the aggregate as MERGEABLE per-group
state, aggregate only the delta batch, and merge the two state tables —
``agg(base ∪ delta) == merge(agg(base), agg(delta))`` for the standard
commutative-monoid kinds (sum, count, min, max; avg derives as
sum/count at read time).

- ``agg_state(df, keys, metrics)``: ONE hash aggregation (map-side
  partials) producing the state table.
- ``merge_agg_states(states, keys, metrics)``: union + ONE hash
  re-aggregation with each kind's merge function (sum->sum,
  count->SUM — counts add, min->min, max->max). Shuffle ∝ state rows
  (group count), not fact rows: the delta path costs agg(delta) + a
  group-sized merge, never a base rescan.

Validity: exact for INSERT-ONLY feeds. Deletes/updates break min/max
mergeability (sum/count would need retractions) — route those through a
full group recompute of the touched keys instead.

Exactness discipline: floating sums are fold-order-dependent, so a
merged sum would differ from a from-scratch sum in the last ulps. Keep
money/measure columns DECIMAL in the state (exact, order-independent —
the suite's ``_dec`` idiom); cast to double only at read time. The
oracle (suite ``incremental_agg_check``) exploits this: it recomputes
from scratch in DuckDB and the merged Spark state must match EXACTLY.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AGG_KINDS = ("sum", "count", "min", "max")


def agg_state(
    df: DataFrame, keys: list[str], metrics: dict[str, tuple[str, str]]
) -> DataFrame:
    """Build the mergeable state table: ``metrics`` maps output name ->
    (kind, col); kind 'count' with col '*' counts rows, otherwise
    non-null values of col."""
    aggs = []
    for name, (kind, col) in metrics.items():
        if kind not in AGG_KINDS:
            raise ValueError(f"unknown agg kind: {kind}")
        if kind == "count":
            expr = F.count(F.lit(1)) if col == "*" else F.count(F.col(col))
        else:
            expr = getattr(F, kind)(F.col(col))
        aggs.append(expr.alias(name))
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_states(
    states: list[DataFrame], keys: list[str], metrics: dict[str, tuple[str, str]]
) -> DataFrame:
    """Merge state tables built by ``agg_state`` with the same spec:
    union + one group-sized hash agg using each kind's merge function."""
    u = reduce(lambda a, b: a.unionByName(b), states)
    aggs = []
    for name, (kind, _) in metrics.items():
        merge_fn = "sum" if kind in ("sum", "count") else kind
        aggs.append(getattr(F, merge_fn)(F.col(name)).alias(name))
    return u.groupBy(*keys).agg(*aggs)
