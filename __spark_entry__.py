"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Queries live in ``etl_file_loader_spark.suite``; each exercises one or
more operators from SURVEY.md §2 (or a training-data-pipeline extension)
through the engine's own operator modules.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_file_loader_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-shaped pricing summary."""
    return suite.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The curated driver window (suite.CHECKED_QUERIES, <=50 entries): every
    distinct operator individually, plus four digest queries that fold the
    TPC-H sweep / analytics variants / scale-variant dedup demos / long-green
    ingestion-pipeline rows into one value-verified row per member (see
    digest.py; window rotated rounds 5, 6, 8, 9, 10, 11 and 12 — the
    round-12 rotation (#7) promoted the 9 round-11 digest-born rows
    (linkage tiers/incremental, maintained indexes, URL ops, HLL family,
    SemDeDup replay, weighted sampling) to direct rows, demoting 9 rows
    green since round 9 into their family digests). The full per-query
    registry stays in suite.QUERIES for bench
    and interactive use. Since round 11 EVERY window entry carries a full
    DuckDB value oracle — suite._ROWS_ONLY is empty (the md5-derived
    hyperplanes, the deterministic KMeansDF quantizer and the md5-derived
    clustered fixture gave the former approximate-demo rows exact
    replays); the oracle-checked ``*_recall``/``*_check`` twins remain in
    the window as semantic-behavior redundancy, not as substitutes."""
    return {k: suite.QUERIES[k] for k in suite.CHECKED_QUERIES}


def oracle_sql() -> dict[str, str]:
    return {k: suite.ORACLES[k] for k in suite.CHECKED_QUERIES if k in suite.ORACLES}
