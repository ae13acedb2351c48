"""Skew-aware aggregation.

AQE's skew-join splitting handles joins; for *aggregations* over hot keys
(e.g. counting by event_type when one type is 90% of a 100 TB stream) the
classic fix is salting: two-phase aggregate with a synthetic salt key so the
hot key's partial aggregation spreads over ``salt`` reducers before the tiny
final combine. Correct for any algebraic aggregate (sum/count/min/max);
averages decompose into sum+count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: output_name -> (combine_fn_name, partial Column expr), where
    combine_fn is the algebraic merge ("sum", "min", "max"). Example::

        salted_agg(ev, ["event_type"], {
            "n_events": ("sum", F.count(F.lit(1))),
            "sum_value": ("sum", F.sum("value")),
            "max_value": ("max", F.max("value")),
        })

    Phase 1 shuffles on (keys + salt) — the hot key fans out over ``salt``
    partitions; phase 2 combines ``salt`` rows per key (trivial).
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, (_, expr) in aggs.items()]
    )
    combines = []
    for name, (fn, _) in aggs.items():
        combine = getattr(F, fn)(F.col(f"_p_{name}"))
        combines.append(combine.alias(name))
    return partial.groupBy(*keys).agg(*combines)
