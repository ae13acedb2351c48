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
    """All registered queries except the approximate result-set demos, whose
    graded contract is their oracle-checked ``*_recall`` twin (same code
    path run against the exact operator's result)."""
    return {k: v for k, v in suite.QUERIES.items() if k not in suite.UNCHECKED_DEMOS}


def oracle_sql() -> dict[str, str]:
    return dict(suite.ORACLES)
