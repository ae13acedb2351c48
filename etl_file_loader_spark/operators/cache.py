"""Operator-scoped cache registry.

Several operators persist an intermediate frame that is re-read multiple
times inside one logical operation (a PassJoin base table, a PPJoin
per-doc shingle-set table). Spark persists are session-global, so in a
long-lived session composing many operators those caches would otherwise
accumulate until the session dies. Operators route such persists through
:func:`pin`, and a batch driver calls :func:`release_operator_caches`
between workloads — one explicit, deterministic release point instead of
relying on JVM GC to reap forgotten caches.

Contract: the pinned frame stays cached until released, so the operator's
RESULT must be materialized (collected / written / checkpointed) before
``release_operator_caches()`` is called; releasing earlier is safe but
recomputes the pinned lineage on next use (Spark unpersist never breaks
correctness, only reuse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []
_PINNED_CKPTS: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for :func:`release_operator_caches`."""
    out = df.persist()
    _PINNED.append(out)
    return out


def pin_checkpoint(df: DataFrame) -> DataFrame:
    """Register an already-built ``localCheckpoint`` frame for release.

    Checkpoint entries are strong-referenced by SparkContext until an
    explicit RDD unpersist (``DataFrame.unpersist`` only touches the
    CacheManager, measured round 12/13), so a lazy return value built on
    per-tier checkpoints would otherwise hold its blocks for the session
    lifetime. Same contract as :func:`pin`: the consumer must materialize
    the result before ``release_operator_caches()`` — with the sharper
    edge that a RELEASED checkpoint frame cannot recompute (lineage is
    truncated), so re-use after release raises instead of re-running.
    """
    _PINNED_CKPTS.append(df)
    return df


def release_local_checkpoint(df: DataFrame) -> bool:
    """Free the block-manager state behind a superseded localCheckpoint.

    ``DataFrame.unpersist()`` cannot release a checkpoint: the persisted
    RDD lives inside the plan's ``LogicalRDD``, not the CacheManager, and
    SparkContext strong-references the entry until ``RDD.unpersist()``
    (probed: getPersistentRDDs stays constant across df/rdd-level
    unpersist). This reaches the LogicalRDD's backing RDD through the
    analyzed plan and unpersists it directly.

    ONLY call on a frame wholly superseded by an already-materialized
    successor: the checkpoint truncated the lineage, so once its blocks
    are dropped the frame CANNOT be recomputed — any later action on it
    raises. Returns False (and frees nothing) for non-checkpoint frames
    or non-classic sessions, so callers may pass e.g. a parquet-restored
    index state unconditionally.
    """
    try:
        jplan = df._jdf.queryExecution().analyzed()
        if jplan.getClass().getSimpleName() != "LogicalRDD":
            return False
        jplan.rdd().unpersist(False)
        return True
    except Exception:
        return False


def release_operator_caches() -> int:
    """Unpersist every operator-pinned frame; returns the count released."""
    n = 0
    while _PINNED:
        df = _PINNED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped: nothing to release
            pass
    while _PINNED_CKPTS:
        if release_local_checkpoint(_PINNED_CKPTS.pop()):
            n += 1
    return n
