"""JDBC sink round-trip against the Derby embedded driver in Spark's JVM
(no external database in the sandbox; any JDBC4 target works identically)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_file_loader_spark.plans.jdbc import JdbcSink

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture
def sink(tmp_path):
    return JdbcSink(
        url=f"jdbc:derby:{tmp_path}/db;create=true",
        driver=DERBY,
        batch_size=500,
        num_partitions=2,
    )


def test_stage_insert_roundtrip(spark, sink):
    df = spark.range(1000).select(
        F.col("id"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("price"),
    )
    sink.write_stage(df, "stage_customers")
    back = sink.read_table(spark, "stage_customers")
    assert back.count() == 1000
    assert set(c.lower() for c in back.columns) == {"id", "name", "price"}
    total = back.agg(F.sum("price")).collect()[0][0]
    assert total == sum(i * 1.5 for i in range(1000))
    # append semantics: a second stage batch accumulates
    sink.write_stage(df.limit(10), "stage_customers")
    assert sink.read_table(spark, "stage_customers").count() == 1010


def test_dlq_insert(spark, sink):
    dlq = spark.createDataFrame(
        [(3, '{"price": "asdf"}', "cust.csv", 1)],
        "file_row_number long, errors string, source_filename string, log_id long",
    )
    sink.write_dlq(dlq)
    back = sink.read_table(spark, "file_load_dlq")
    assert back.count() == 1
    assert back.collect()[0]["source_filename"] == "cust.csv"


def test_overwrite_refresh(spark, sink):
    df = spark.range(100).select(F.col("id"))
    sink.write_stage(df, "tgt")
    sink.overwrite(spark.range(5).select(F.col("id")), "tgt", truncate=True)
    assert sink.read_table(spark, "tgt").count() == 5
