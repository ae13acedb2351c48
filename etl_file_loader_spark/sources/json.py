"""JSON source (SURVEY §2.1 S3, S4, S10).

Reference: ijson streams objects under a dotted ``array_path`` (e.g.
``entries.item``), then eagerly flattens nested dicts to ``parent_child``
lowercase scalar columns, lists of dicts to indexed ``parent_0_child``
columns, and scalar lists to strings (reference read/json.py:35-126).

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
    """Recursively flatten nested records to ``parent_child`` lowercase names.

    Parity with reference read/json.py:41-71:
    - nested dicts  -> ``parent_child`` columns (recursive);
    - lists of dicts -> index-flattened ``parent_0_child``, ``parent_1_child``
      columns (reference json.py:51-59); the column count is the file-wide max
      list length, shorter rows get nulls (reference rows simply lack the key,
      which validates to null the same way);
    - scalar lists   -> one stringified column (reference json.py:67-68 uses
      Python ``str(list)``; we use ``to_json`` — same information, documented
      divergence in quoting style).

    Spark-first: structs flatten as pure projections. Index-flattening needs
    the max list length, which is data-dependent under Spark's static schemas:
    each nesting level costs ONE extra aggregation job (``max(size(col))`` for
    every array-of-struct column at that level), then a static
    ``element_at`` projection. Nesting depth is small in practice, so this is
    a handful of cheap scans; the projections themselves stay in whole-stage
    codegen.
    """
    df = _flatten_one_level(df)
    while True:
        arr_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.ArrayType)
            and isinstance(f.dataType.elementType, T.StructType)
        ]
        if not arr_cols:
            return df
        sizes = df.agg(
            *[F.max(F.size(F.col(f"`{c}`"))).alias(c) for c in arr_cols]
        ).first()
        proj: list[Column] = []
        for f in df.schema.fields:
            if f.name in arr_cols:
                n = max(sizes[f.name] or 0, 0)
                for i in range(n):
                    # try_element_at: ragged rows null-fill (ANSI-safe)
                    proj.append(
                        F.try_element_at(F.col(f"`{f.name}`"), F.lit(i + 1)).alias(
                            f"{f.name}_{i}"
                        )
                    )
            else:
                proj.append(F.col(f"`{f.name}`"))
        df = _flatten_one_level(df.select(*proj))


def _flatten_one_level(df: DataFrame) -> DataFrame:
    """Flatten structs / stringify scalar arrays; keep arrays-of-structs."""

    def expand(col: Column, name: str, dtype: T.DataType) -> list[Column]:
        if isinstance(dtype, T.StructType):
            out: list[Column] = []
            for f in dtype.fields:
                out.extend(expand(col[f.name], f"{name}_{f.name.lower()}", f.dataType))
            return out
        if isinstance(dtype, T.ArrayType):
            if isinstance(dtype.elementType, T.StructType):
                return [col.alias(name)]
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
    """Resolve an ijson-style dotted path to (array column, element type).

    ijson semantics (reference read/json.py:81): a segment is a dict key;
    ``item`` under an array means "each element". ``entries.item`` therefore
    matches both ``{"entries": [...]}`` (array elements) and
    ``{"entries": {"item": [...]}}`` (literal key) — ijson accepts either, so
    both are supported: ``item`` is an element marker only when the current
    type is an array, otherwise it is a plain field name.

    Spark-first: field access on an ``array<struct>`` column maps over
    elements (``col["b"]`` -> ``array<b>``), so mid-path ``item`` segments
    navigate without exploding; nested array levels are ``flatten``-ed so the
    caller gets ONE array column to ``posexplode`` — row numbers then count
    leaf items in stream order, same as the reference's ``rows_read``.
    """
    depth = 0  # array levels currently wrapping `col` beyond tracked dtype
    for part in path.split("."):
        if isinstance(dtype, T.ArrayType) and part == "item":
            dtype = dtype.elementType
            depth += 1
        elif isinstance(dtype, T.StructType) and part in dtype.fieldNames():
            col = col[part]
            dtype = dtype[part].dataType
        else:
            raise NoDataInFileError(f"array_path segment '{part}' not found")
    if isinstance(dtype, T.ArrayType):
        # path pointed at the array itself (no trailing .item) — reference
        # json.py:91-99 unwraps the list the same way
        dtype = dtype.elementType
        depth += 1
    for _ in range(max(depth - 1, 0)):
        col = F.flatten(col)
    if depth == 0:
        raise NoDataInFileError(f"array_path '{path}' does not address an array")
    return col, dtype


def read_json(spark: SparkSession, path: str, config: SourceConfig) -> DataFrame:
    inferred = spark.read.option("multiLine", "true").json(path)
    doc_schema = inferred.schema
    if config.array_path is None:
        # top-level array (or NDJSON): one row per element already
        w = Window.orderBy(F.monotonically_increasing_id())
        rows = inferred.withColumn(FILE_ROW_COL, F.row_number().over(w).cast("long"))
    else:
        arr_col, elem_type = _navigate(F.col("_doc"), doc_schema, config.array_path)
        if not isinstance(elem_type, T.StructType):
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
