"""Structured Streaming analog with a batch oracle.

Split from the monolithic suite.py (round 4); unit text unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from etl_file_loader_spark.suite._shared import ORACLES, QUERIES, _ensure_session_confs


# ---------------------------------------------------------------------------
# driver-checked structured streaming
# ---------------------------------------------------------------------------


def q_streaming_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming run, driver-checked against the batch oracle.

    readStream over the events parquet -> the same hour x event_type rollup
    as ``events_hourly`` (minus the distinct-user count, which streaming
    aggregation doesn't support exactly) -> complete-mode memory sink,
    driven to completion with availableNow. Proves the streaming engine
    computes the batch-equivalent answer on identical input — the
    correctness contract continuous ingestion relies on. (n_events stays
    BIGINT; sums go through decimal like the batch twin.)
    """
    import tempfile
    import uuid

    import os

    _ensure_session_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file stream source wants a directory. Driver testdata ships events
    # as a single FILE directly in sf_dir, so stream sf_dir narrowed by a
    # leaf-name glob; generated scale dirs (tools/gen_scale_data.py) ship a
    # parquet DIRECTORY, which streams as-is (the glob would match no part
    # files and silently yield zero rows).
    ev_path = f"{sf_dir}/events.parquet"
    if os.path.isdir(ev_path):
        ev = spark.readStream.schema(schema).parquet(ev_path)
    else:
        ev = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif dict(ev.dtypes).get("ts") == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("_sv"),
        )
        .select(
            "hour",
            "event_type",
            "n_events",
            F.col("_sv").cast("double").alias("sum_value"),
        )
    )
    name = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="efls_stream_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def q_streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming dedup run (streaming/ingest.py:dedup_stream):
    the events file is streamed TWICE and unioned (every event arrives
    duplicated), watermarked on event time, and
    ``dropDuplicatesWithinWatermark`` keeps exactly one row per
    event_id with bounded state (keys expire past the watermark — the
    semantics plain dropDuplicates can't give a stream). availableNow
    drives it to completion into an append memory sink; the rollup of
    the sink must equal the batch rollup of the ORIGINAL events — the
    duplicates must have vanished."""
    import tempfile
    import uuid

    import os

    from etl_file_loader_spark.streaming.ingest import dedup_stream

    _ensure_session_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def _read():
        ev_path = f"{sf_dir}/events.parquet"
        if os.path.isdir(ev_path):
            s = spark.readStream.schema(schema).parquet(ev_path)
        else:
            s = (
                spark.readStream.schema(schema)
                .option("pathGlobFilter", "events.parquet")
                .parquet(sf_dir)
            )
        if dict(s.dtypes).get("ts") == "bigint":
            s = s.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif dict(s.dtypes).get("ts") == "timestamp_ntz":
            s = s.withColumn("ts", F.col("ts").cast("timestamp"))
        return s

    # ONE scan (optimization round 14): duplicating every event via an
    # exploded 2-element array replaces the second file-stream source
    # reading the identical file — same doubled multiset, half the scan
    doubled = (
        _read()
        .withColumn("_copy", F.explode(F.array(F.lit(0), F.lit(1))))
        .drop("_copy")
    )
    deduped = dedup_stream(doubled, ["event_id"], ts_col="ts", watermark="1 hour")
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="efls_stream_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sink = spark.table(name)
    return (
        sink.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_id").alias("n_ids"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("_sv"),
        )
        .select(
            "event_type",
            "n_events",
            "n_ids",
            F.col("_sv").cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
    )


# far-future sentinel (2100-01-01 UTC in microseconds): closes every real
# session inside the stateful operator without waiting for a timeout
_SESSION_SENTINEL_US = 4102444800 * 1_000_000
_SESSION_GAP_S = 1800


def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSTOM stateful operator (streaming/stateful.py:
    sessionize_stream, applyInPandasWithState) driver-checked against a
    batch gap-sessionization oracle: the event stream is unioned with a
    far-future sentinel copy of itself, so every user's real sessions are
    gap-closed and EMITTED within the run (no reliance on processing-time
    timeouts firing before availableNow terminates); sentinel sessions
    are filtered by their start time. The emitted (start, end, n_events)
    rows must equal the batch lag-window sessionization exactly."""
    import tempfile
    import uuid

    import os

    from etl_file_loader_spark.streaming.stateful import sessionize_stream

    _ensure_session_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def _read():
        ev_path = f"{sf_dir}/events.parquet"
        if os.path.isdir(ev_path):
            s = spark.readStream.schema(schema).parquet(ev_path)
        else:
            s = (
                spark.readStream.schema(schema)
                .option("pathGlobFilter", "events.parquet")
                .parquet(sf_dir)
            )
        if dict(s.dtypes).get("ts") == "bigint":
            s = s.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif dict(s.dtypes).get("ts") == "timestamp_ntz":
            s = s.withColumn("ts", F.col("ts").cast("timestamp"))
        return s.select("user_id", "ts")

    # ONE scan (optimization round 14, guide §2.4/§6): the old
    # real.unionByName(sentinel-copy) read the events file through TWO
    # file-stream sources; exploding a 2-element array emits the same
    # (real ts, sentinel ts) row pair per event from a single scan.
    doubled = _read().select(
        "user_id",
        F.explode(
            F.array(
                F.col("ts"), F.timestamp_micros(F.lit(_SESSION_SENTINEL_US))
            )
        ).alias("ts"),
    )
    # timeout_ms=None -> GroupStateTimeout.NoTimeout (optimization round
    # 14): the sentinel closes every REAL session inside the data batch,
    # so the timeout flush was never needed here — and with NO timeout
    # registered the availableNow trigger TERMINATES once the files are
    # drained (with ProcessingTimeTimeout it never does: the engine keeps
    # scheduling batches to service the sentinel sessions' outstanding
    # timers — measured q.isActive 120 s after the sink was complete,
    # which is what the former sink-polling loop worked around). One
    # awaitTermination replaces the poll; sentinel sessions stay open in
    # state and are discarded by the start-time filter as before.
    sessions = sessionize_stream(
        doubled,
        gap_seconds=_SESSION_GAP_S,
        timeout_ms=None,
    )
    name = f"stream_sess_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="efls_stream_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .filter(F.col("session_start_us") < _SESSION_SENTINEL_US)
        .orderBy("user_id", "session_start_us")
    )


Q_STREAMING_SESSIONIZE_SQL = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
o AS (
  SELECT user_id, t,
         CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                   OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                      > {_SESSION_GAP_S * 1_000_000}
              THEN 1 ELSE 0 END AS brk
  FROM e
),
s AS (
  SELECT user_id, t,
         sum(brk) OVER (PARTITION BY user_id ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, min(t) AS session_start_us, max(t) AS session_end_us,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_start_us
"""


Q_STREAMING_DEDUP_EVENTS_SQL = """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT event_id) AS n_ids,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


Q_STREAMING_EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


QUERIES.update(
    {
        "streaming_events_hourly": q_streaming_events_hourly,
        "streaming_dedup_events": q_streaming_dedup_events,
        "streaming_sessionize": q_streaming_sessionize,
    }
)


ORACLES.update(
    {
        "streaming_events_hourly": Q_STREAMING_EVENTS_HOURLY_SQL,
        "streaming_dedup_events": Q_STREAMING_DEDUP_EVENTS_SQL,
        "streaming_sessionize": Q_STREAMING_SESSIONIZE_SQL,
    }
)


def q_streaming_quantile_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming quantile maintenance (streaming/ingest.py:
    quantile_stream): the orders table is split into two parquet files
    (the arriving micro-batch files), streamed with availableNow, and
    each micro-batch's decimal log-histogram folds into the epoch-named
    register snapshot chain — the exactly-once discipline sum-merge
    needs (epoch-named publish + replay guard; see the operator
    docstring). The final registers must equal the ONE-SHOT histogram
    over all orders regardless of how the engine batched the files
    (disjoint batches + exact folds), so the oracle is the plain batch
    replay: per-group register md5 + p50/p90/p99."""
    import tempfile

    from etl_file_loader_spark.operators import sketches
    from etl_file_loader_spark.streaming.ingest import (
        latest_quantile_state,
        quantile_stream,
    )
    from etl_file_loader_spark.suite.analytics import _quantile_reg_md5

    _ensure_session_confs(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="efls_stream_q_")
    for k in range(2):
        orders.filter(F.col("o_orderkey") % 2 == k).write.parquet(
            f"{work}/src/b{k}"
        )
    schema = spark.read.parquet(f"{work}/src/b0").schema
    stream = spark.readStream.schema(schema).option(
        "pathGlobFilter", "*.parquet"
    ).parquet(f"{work}/src/*")
    q = quantile_stream(
        stream, f"{work}/state", f"{work}/ckpt", ["o_orderstatus"], "o_totalprice"
    )
    q.awaitTermination()
    state = latest_quantile_state(spark, f"{work}/state")
    est = sketches.quantile_estimate(state, ["o_orderstatus"], [500, 900, 990])
    md5 = _quantile_reg_md5(state, ["o_orderstatus"])
    return (
        est.join(md5, "o_orderstatus")
        .select(
            F.col("o_orderstatus").alias("grp"),
            "q_milli",
            "est",
            "n",
            "reg_md5",
        )
        .orderBy("grp", "q_milli")
    )


def _streaming_quantile_sql() -> str:
    from etl_file_loader_spark.suite.analytics import _quantile_est_sql

    return f"""
WITH src AS (SELECT o_orderstatus AS g, o_totalprice AS v FROM orders),
{_quantile_est_sql("src", [500, 900, 990])}
SELECT e.g AS grp, e.q_milli, e.est, e.n, m.reg_md5
FROM ests e JOIN md5s m ON m.g = e.g
ORDER BY grp, q_milli
"""


Q_STREAMING_QUANTILE_SQL = _streaming_quantile_sql()

QUERIES.update({"streaming_quantile_state": q_streaming_quantile_state})
ORACLES.update({"streaming_quantile_state": Q_STREAMING_QUANTILE_SQL})
