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


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for :func:`release_operator_caches`."""
    out = df.persist()
    _PINNED.append(out)
    return out


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
    return n
