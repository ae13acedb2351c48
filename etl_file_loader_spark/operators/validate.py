"""Projection / rename / cast-validate / split (SURVEY §2.3 P1-P8).

The reference validates row-at-a-time with pydantic try/except
(reference validator.py:97-148, model_utils.py:36-122). Here the same
semantics are compiled once per source into Column expressions:

 - rename/prune: case-insensitive alias -> name projection, unmapped columns
   dropped (reference model_utils.py:26-33)
 - clean: config-declared Column cleaners on the raw value
 - cast: ``try_cast`` to the target type; a non-null raw that casts to null is
   a captured *error*, never a silent null (divergence from Spark's default
   PERMISSIVE behavior, by design)
 - constraints: nullability, max_length, email-regex, min/max range
 - split: one cached plan, two filters (valid -> stage, invalid -> DLQ)

Errors are an ``array<struct<column_name,column_value,error_type,error_msg>>``
per row — same granularity as pydantic's per-field error list (multiple
errors per row, input value retained). Everything stays in whole-stage
codegen; at 100 TB this is a single scan-project-filter pipeline with no
shuffle and full parquet pushdown of any preceding filters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_file_loader_spark.config import EMAIL_REGEX, FieldSpec, SourceConfig
from etl_file_loader_spark.exceptions import MissingColumnsError
from etl_file_loader_spark.functions import (
    excel_serial_to_date,
    excel_serial_to_timestamp,
    render_value,
)

ERRORS_COL = "_validation_errors"
VALID_COL = "_is_valid"
FILE_ROW_COL = "_file_row_number"

_ERROR_STRUCT = "struct<column_name:string,column_value:string,error_type:string,error_msg:string>"


def rename_and_prune(
    df: DataFrame, config: SourceConfig, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Alias->name projection + column pruning (reference model_utils.py:26-33).

    Case-insensitive header match; unmapped file columns are dropped
    (``passthrough`` names survive verbatim — e.g. file lineage in batch
    mode); missing required (non-nullable) columns raise
    ``MissingColumnsError`` (reference read/base.py:42-64); missing optional
    columns become typed nulls.
    """
    actual = {c.lower(): c for c in df.columns}
    missing = [
        f.file_alias
        for f in config.fields
        if not f.nullable and f.file_alias not in actual
    ]
    if missing:
        raise MissingColumnsError(missing)
    cols: list[Column] = []
    for f in config.fields:
        if f.file_alias in actual:
            cols.append(F.col(f"`{actual[f.file_alias]}`").alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dtype).alias(f.name))
    if FILE_ROW_COL in df.columns:
        cols.append(F.col(FILE_ROW_COL))
    for extra in passthrough:
        if extra in df.columns:
            cols.append(F.col(f"`{extra}`"))
    return df.select(*cols)


def _error(field: FieldSpec, raw: Column, error_type: str, msg: str) -> Column:
    return F.struct(
        F.lit(field.alias or field.name).alias("column_name"),
        raw.cast("string").alias("column_value"),
        F.lit(error_type).alias("error_type"),
        F.lit(msg).alias("error_msg"),
    )


def _cast_expr(
    field: FieldSpec,
    raw: Column,
    raw_type: T.DataType,
    excel_source: bool = False,
) -> Column:
    """try_cast raw -> target type, honoring cleaners and Excel serials.

    Serial handling is per-VALUE, matching reference excel.py:62-84: a
    numeric value on a Date/Timestamp field is an Excel serial; anything
    else falls through to the normal date/timestamp parse (the reference
    hands non-numerics to pydantic the same way). Applies to every
    Date/Timestamp field of an Excel source — the reference needs no flag —
    and to any field explicitly marked ``excel_serial``.
    """
    cleaned = field.cleaner(raw) if field.cleaner else raw
    serial = field.excel_serial or excel_source
    if serial and isinstance(field.dtype, (T.DateType, T.TimestampType)):
        num = cleaned.try_cast("double")
        conv = (
            excel_serial_to_date(num)
            if isinstance(field.dtype, T.DateType)
            else excel_serial_to_timestamp(num)
        )
        return F.when(num.isNotNull(), conv).otherwise(cleaned.try_cast(field.dtype))
    if raw_type == field.dtype:
        return cleaned
    return cleaned.try_cast(field.dtype)


def validate(
    df: DataFrame, config: SourceConfig, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Add casted columns + ``_validation_errors`` + ``_is_valid``.

    Input: post-``rename_and_prune`` DataFrame (columns = field names, raw
    types — all-string for CSV/Excel, native for Parquet/JSON).
    ``passthrough`` columns are carried unchanged.
    """
    raw_types = dict(df.dtypes)
    excel_source = config.file_format == "excel"
    out_cols: list[Column] = []
    err_cols: list[tuple[Column, Column]] = []
    for f in config.fields:
        raw = F.col(f.name)
        raw_type = df.schema[f.name].dataType
        casted = _cast_expr(f, raw, raw_type, excel_source=excel_source)
        out_cols.append(casted.alias(f.name))

        # (condition, error-struct) pairs — kept separate so the error
        # array below can be built codegen-friendly (see note there)
        errs: list[tuple[Column, Column]] = []
        if not f.nullable:
            errs.append((raw.isNull(), _error(f, raw, "missing", "field required")))
        # non-null raw that fails the cast => captured cast error
        errs.append(
            (
                raw.isNotNull() & casted.isNull(),
                _error(f, raw, "cast_error", f"could not parse as {f.dtype.simpleString()}"),
            )
        )
        if f.max_length is not None:
            errs.append(
                (
                    F.length(casted.cast("string")) > f.max_length,
                    _error(f, raw, "max_length", f"length exceeds {f.max_length}"),
                )
            )
        if f.email:
            errs.append(
                (
                    casted.isNotNull() & ~casted.rlike(EMAIL_REGEX),
                    _error(f, raw, "email", "value is not a valid email address"),
                )
            )
        if f.min_value is not None:
            errs.append(
                (
                    casted.cast("double") < F.lit(float(f.min_value)),
                    _error(f, raw, "min_value", f"value below {f.min_value}"),
                )
            )
        if f.max_value is not None:
            errs.append(
                (
                    casted.cast("double") > F.lit(float(f.max_value)),
                    _error(f, raw, "max_value", f"value above {f.max_value}"),
                )
            )
        err_cols.extend(errs)
    _ = raw_types

    # concat of per-check conditional arrays instead of
    # array_compact(array(when...)): array_compact rewrites to a
    # higher-order filter, which blocks whole-stage codegen and leaves the
    # hot validation projection interpreted; Concat generates code, so the
    # whole scan->validate->split pipeline stays in one codegen stage.
    # Error order (field order, check order) is identical.
    _empty = F.array().cast(f"array<{_ERROR_STRUCT}>")
    errors = (
        F.concat(
            *[
                F.when(cond, F.array(e.cast(_ERROR_STRUCT))).otherwise(_empty)
                for cond, e in err_cols
            ]
        )
        if err_cols
        else _empty
    )
    extra_cols = [F.col(FILE_ROW_COL)] if FILE_ROW_COL in df.columns else []
    extra_cols += [F.col(f"`{c}`") for c in passthrough if c in df.columns]
    return df.select(
        *out_cols,
        *extra_cols,
        errors.alias(ERRORS_COL),
    ).withColumn(VALID_COL, F.size(F.col(ERRORS_COL)) == 0)


def split(validated: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Valid/invalid stream split (reference validator.py:115/128, write/base.py:50-75).

    Two filters off one plan; caller should ``.cache()`` the validated frame
    when both sides are consumed (the pipeline runner does).
    """
    valid = validated.filter(F.col(VALID_COL)).drop(ERRORS_COL, VALID_COL)
    invalid = validated.filter(~F.col(VALID_COL)).drop(VALID_COL)
    return valid, invalid


def alias_value_map(config: SourceConfig) -> Column:
    """Map of file-alias -> rendered current value, for DLQ payloads."""
    keys, vals = [], []
    for f in config.fields:
        keys.append(F.lit(f.alias or f.name))
        vals.append(F.coalesce(render_value(F.col(f.name), f.dtype), F.lit("")))
    return F.map_from_arrays(F.array(*keys), F.array(*vals))
