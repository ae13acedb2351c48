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

    doubled = _read().unionByName(_read())
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
    }
)


ORACLES.update(
    {
        "streaming_events_hourly": Q_STREAMING_EVENTS_HOURLY_SQL,
        "streaming_dedup_events": Q_STREAMING_DEDUP_EVENTS_SQL,
    }
)
