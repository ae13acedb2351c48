"""JSON source (SURVEY §2.1 S3, S4, S10).

Reference: ijson streams objects under a dotted ``array_path`` (e.g.
``entries.item``), then eagerly flattens nested dicts to ``parent_child``
lowercase scalar columns; scalar lists are stringified (reference
read/json.py:35-126).

Spark-first: infer the document schema with ``spark.read.json`` (distributed),
then re-read the file as ``wholeText`` + ``from_json`` + ``posexplode`` of the
array at ``array_path`` — the explode position gives exact, deterministic
1-based file row numbers (JSON rows start at 1, reference json.py:30-33).
Struct flattening is a recursive projection (pure Catalyst, no UDF).

Scale: a whole-file JSON document is inherently single-stream (same as the
reference's ijson pass); many files parallelize across tasks. For
data-at-scale prefer NDJSON (``array_path=None`` files with one object per
line), which Spark splits by byte range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from etl_file_loader_spark.config import SourceConfig
from etl_file_loader_spark.exceptions import NoDataInFileError
from etl_file_loader_spark.operators.validate import FILE_ROW_COL
from etl_file_loader_spark.sources.base import check_required_columns


def flatten_struct_columns(df: DataFrame) -> DataFrame:
    """Recursively flatten struct columns to ``parent_child`` lowercase names.

    Arrays (scalar or struct) are stringified with ``to_json`` — the reference
    stringifies scalar lists and index-flattens struct lists (json.py:41-71);
    index-flattening needs a known max length, so we stringify both
    (documented divergence).
    """

    def expand(col: Column, name: str, dtype: T.DataType) -> list[Column]:
        if isinstance(dtype, T.StructType):
            out: list[Column] = []
            for f in dtype.fields:
                out.extend(expand(col[f.name], f"{name}_{f.name.lower()}", f.dataType))
            return out
        if isinstance(dtype, T.ArrayType):
            return [F.to_json(col).alias(name)]
        return [col.alias(name)]

    cols: list[Column] = []
    for f in df.schema.fields:
        if f.name == FILE_ROW_COL:
            cols.append(F.col(FILE_ROW_COL))
        else:
            cols.extend(expand(F.col(f"`{f.name}`"), f.name.lower(), f.dataType))
    return df.select(*cols)


def _navigate(col: Column, dtype: T.DataType, path: str) -> tuple[Column, T.DataType]:
    for part in path.split("."):
        if not isinstance(dtype, T.StructType) or part not in dtype.fieldNames():
            raise NoDataInFileError(f"array_path segment '{part}' not found")
        col = col[part]
        dtype = dtype[part].dataType
    return col, dtype


def read_json(spark: SparkSession, path: str, config: SourceConfig) -> DataFrame:
    inferred = spark.read.option("multiLine", "true").json(path)
    doc_schema = inferred.schema
    if config.array_path is None:
        # top-level array (or NDJSON): one row per element already
        w = Window.orderBy(F.monotonically_increasing_id())
        rows = inferred.withColumn(FILE_ROW_COL, F.row_number().over(w).cast("long"))
    else:
        arr_col, arr_type = _navigate(F.col("_doc"), doc_schema, config.array_path)
        if not isinstance(arr_type, T.ArrayType) or not isinstance(
            arr_type.elementType, T.StructType
        ):
            raise NoDataInFileError(
                f"array_path '{config.array_path}' is not an array of records", path
            )
        whole = spark.read.text(path, wholetext=True)
        parsed = whole.select(F.from_json(F.col("value"), doc_schema).alias("_doc"))
        rows = parsed.select(F.posexplode(arr_col).alias("_pos", "_rec")).select(
            F.col("_rec.*"), (F.col("_pos") + 1).cast("long").alias(FILE_ROW_COL)
        )
    flat = flatten_struct_columns(rows)
    check_required_columns([c for c in flat.columns if c != FILE_ROW_COL], config, path)
    if flat.isEmpty():
        raise NoDataInFileError("no records in file", path)
    return flat
