"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY §2.8 extension — the reference has no
streaming engine; this is the Spark-native way to express operators whose
state outlives a microbatch).

State per user: the currently-open session (start_us, end_us, n_events).
Each batch folds its events into the open session, emits every session that
a gap closed, and keeps the still-open one in state with a processing-time
timeout — on timeout the open session flushes. Arrow-batched per group; the
shuffle key is the session key (user), so state is partition-local and the
operator scales with distinct users, not events.

Sink note: cross-restart state recovery needs a checkpoint-recoverable sink
(parquet / foreachBatch); the memory sink rejects checkpoint recovery, so use
it only for single-run tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def make_session_fn(gap_seconds: int = 1800, timeout_ms: int = 30000):
    gap_us = gap_seconds * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                state.remove()
                yield pd.DataFrame(
                    [(user_id, s, e, n)],
                    columns=["user_id", "session_start_us", "session_end_us", "n_events"],
                )
            return
        times: list[int] = []
        for pdf in pdfs:
            times.extend(int(t) for t in pdf["ts_us"])
        times.sort()
        if state.exists:
            s, e, n = state.get
        else:
            s = e = None
            n = 0
        closed: list[tuple] = []
        for t in times:
            if s is None:
                s = e = t
                n = 1
            elif t - e > gap_us:
                closed.append((user_id, s, e, n))
                s = e = t
                n = 1
            else:
                e = max(e, t)
                n += 1
        if s is not None:
            state.update((s, e, n))
            state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start_us", "session_end_us", "n_events"],
            )

    return update


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 1800, timeout_ms: int = 30000
) -> DataFrame:
    """events(user_id, ts) stream -> closed sessions stream.

    Works on a streaming DataFrame; emits a session once a later event (or a
    processing-time timeout) closes it.
    """
    prepared = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_seconds, timeout_ms),
        SESSION_OUTPUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
