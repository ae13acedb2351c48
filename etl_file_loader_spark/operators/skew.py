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

# (semanticHash of analyzed plan, target) -> needs fan-out. See
# fan_out_scan: caches only the partitioning decision, never data.
_FAN_OUT_MEMO: dict[tuple[int, int], bool] = {}


def fan_out_scan(
    df: DataFrame,
    key_cols: list[str] | None = None,
    min_partitions: int | None = None,
) -> DataFrame:
    """Repartition a scan whose split count cannot fill the cluster —
    the guide-§2.5 "input skew" fix (one small or unsplittable file ->
    one task) applied adaptively at the entry of derivation-heavy
    operators.

    Parquet scans split at ROW-GROUP granularity: a file written as a
    single row group yields exactly one scan task no matter how small
    ``spark.sql.files.maxPartitionBytes`` / ``openCostInBytes`` are set,
    so every downstream scan-side derivation (token explodes, n-gram
    generation, signature hashing, per-pair distance math) — and every
    Arrow/pandas UDF, which otherwise runs in ONE Python worker — uses
    one core while the rest of the cluster idles. Measured at sf0.1:
    the shared gram-table build spent 6.3 s of pure CPU in a single
    task (stage-level profile, tools/profile_stages.py) against a
    ~0.3 s shuffle of the 0.6 MB input.

    ``key_cols`` (recommended): hash-repartition on a high-cardinality
    id — deterministic under retry BY VALUE, no extra work. Keyless
    round-robin pays a LOCAL SORT of every column per input partition
    (``spark.sql.execution.sortBeforeRepartition``, the SPARK-23207
    retry guard) — measured 1.6 s vs 0.6 s scan-only on the
    single-split sf0.1 lineitem. Use round-robin only when no
    high-cardinality key exists (guide §2.5: a hash key needs many more
    distinct values than partitions to spread).

    Adaptive, not blanket: when the scan already has at least
    ``min_partitions`` (default ``sparkContext.defaultParallelism``)
    splits — every real multi-row-group / multi-file table, i.e. any
    100 TB input — this is a no-op and no exchange is added. Only for
    order-independent consumers: every suite operator keys on explicit
    columns; the file-row-number sources (sources/csv.py) must NOT
    route through this.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    # The split-count probe (df.rdd.getNumPartitions) runs FULL query
    # planning — measured ~0.4 s of driver time per call (optimization
    # round 14). Memoize the decision by the analyzed plan's semantic
    # hash: re-built identical plans (every bench/driver re-run of a
    # query) skip the probe. A hash collision could only flip the
    # PARTITIONING decision, never any value — every consumer is
    # order-independent by this function's contract.
    key = None
    try:
        key = (df._jdf.queryExecution().analyzed().semanticHash(), target)
        need = _FAN_OUT_MEMO.get(key)
    except Exception:
        need = None
    if need is None:
        need = df.rdd.getNumPartitions() < target
        if key is not None:
            if len(_FAN_OUT_MEMO) > 512:
                _FAN_OUT_MEMO.clear()
            _FAN_OUT_MEMO[key] = need
    if not need:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)


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
