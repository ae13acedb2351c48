"""Row-hash operator (SURVEY §2.3 P9).

Reference: 16-byte xxh128 digest over business columns only, sorted column
name order, '|'-joined stringified values, None -> "" (reference
db_utils.py:278-289, model_utils.py:125-126, validator.py:110-112). We keep
those semantics with an md5 hex digest (documented divergence, SURVEY §7.3 —
MERGE change-detection only needs self-consistency).

Scale: pure narrow projection — no shuffle, fully inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etl_file_loader_spark.config import SourceConfig
from etl_file_loader_spark.functions import row_hash

HASH_COL = "etl_row_hash"


def with_row_hash(df: DataFrame, config: SourceConfig) -> DataFrame:
    """Add ``etl_row_hash`` over the source's business columns."""
    fields = {f.name: f.dtype for f in config.fields}
    return df.withColumn(HASH_COL, row_hash(fields))
