"""Parquet source (SURVEY §2.1 S5, S10, S11).

Reference: pyarrow iter_batches exploded to dicts (reference
read/parquet.py:31-87). Spark reads parquet natively columnar with pushdown;
file row numbers come from the ``_metadata.row_index`` hidden column
(deterministic physical row order, no shuffle, no zipWithIndex job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_file_loader_spark.config import SourceConfig
from etl_file_loader_spark.exceptions import NoDataInFileError
from etl_file_loader_spark.operators.validate import FILE_ROW_COL
from etl_file_loader_spark.sources.base import check_required_columns


def read_parquet(spark: SparkSession, path: str, config: SourceConfig) -> DataFrame:
    df = spark.read.parquet(path)
    check_required_columns(df.columns, config, path)
    out = df.select(
        "*", (F.col("_metadata.row_index") + 1).alias(FILE_ROW_COL)
    )
    if out.isEmpty():
        raise NoDataInFileError("parquet file has no rows", path)
    return out
