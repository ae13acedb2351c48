"""fan_out_scan + the suite._t scan fan-out (optimization round 14).

The testdata tables are single-row-group parquet files, so their scans
plan as ONE task and every scan-side derivation runs on one core
(guide §2.5 input skew). These tests pin the adaptive fix:

- fan_out_scan widens an under-split frame to defaultParallelism and
  NO-OPS on a frame that already fills the cluster;
- _t's fan-out changes no values (same rows before/after, the property
  the 194-query oracle sweep checks end-to-end);
- the round-robin repartition is the keyless form (no hash-collision
  skew on a synthetic key).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_file_loader_spark.operators.skew import fan_out_scan


@pytest.fixture(scope="module")
def small_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("fan") / "t.parquet")
    spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).coalesce(1).write.parquet(p)
    return p


def test_widens_single_split_scan(spark, small_parquet):
    df = spark.read.parquet(small_parquet)
    assert df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = fan_out_scan(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_noop_when_already_parallel(spark):
    wide = spark.range(0, 1000, 1, spark.sparkContext.defaultParallelism)
    out = fan_out_scan(wide)
    assert out is wide  # no exchange added


def test_values_unchanged(spark, small_parquet):
    df = spark.read.parquet(small_parquet)
    out = fan_out_scan(df)
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in out.collect())
    assert a == b


def test_explicit_min_partitions(spark, small_parquet):
    df = spark.read.parquet(small_parquet)
    assert fan_out_scan(df, min_partitions=4).rdd.getNumPartitions() == 4
