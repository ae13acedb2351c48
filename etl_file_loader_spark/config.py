"""Declarative source configuration.

The reference's "table definition" is a pydantic ``DataSource`` + ``TableModel``
(reference src/sources/base.py:7-29): file pattern, per-field type/alias/
constraints, grain, audit SQL, validation threshold. Here that becomes a plain
dataclass pair that compiles to Spark ``StructType`` + Column expressions —
the config IS the logical plan; no imperative per-row hooks.
"""

from __future__ import annotations

import fnmatch
import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import types as T

# case-insensitive permissive email shape ~ pydantic EmailStr's practical subset
EMAIL_REGEX = r"^[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)+$"


@dataclass
class FieldSpec:
    """One target column (reference TableModel field, src/sources/base.py:7-8).

    ``alias`` is the file-header name when it differs from the target column
    name; matching is case-insensitive (reference model_utils.py:6-23).
    ``cleaner`` is a Column->Column expression applied to the *raw* value
    before casting (reference @field_validator cleaners, customer.py:25-41).
    """

    name: str
    dtype: T.DataType = field(default_factory=T.StringType)
    alias: str | None = None
    nullable: bool = True
    max_length: int | None = None
    email: bool = False
    min_value: float | None = None
    max_value: float | None = None
    excel_serial: bool = False  # Excel serial-number date/datetime (reference excel.py:44-84)
    cleaner: Callable[[Column], Column] | None = None

    def __post_init__(self):
        # normalize bounds to float so error messages render consistently
        # ("value above 45.0") regardless of int/float config input
        if self.min_value is not None:
            self.min_value = float(self.min_value)
        if self.max_value is not None:
            self.max_value = float(self.max_value)

    @property
    def file_alias(self) -> str:
        return (self.alias or self.name).lower()


@dataclass
class SourceConfig:
    """One source (reference DataSource, src/sources/base.py:11-29)."""

    name: str
    file_pattern: str
    file_format: str  # csv | json | parquet | excel
    fields: list[FieldSpec]
    grain: list[str]
    audit_query: str | None = None  # single-row SELECT over {table}; 0-valued column => failed audit
    validation_error_threshold: float = 0.0
    # format options (reference src/sources/base.py:41-53)
    delimiter: str = ","
    encoding: str = "utf-8"
    skip_rows: int = 0
    multiline: bool = False  # CSV fields with quoted embedded newlines
    sheet_name: str | None = None
    array_path: str | None = None  # dotted path to the JSON record array, e.g. "entries.item"
    notification_emails: list[str] = field(default_factory=list)
    # hive-partition the target table by these (business) columns: readers
    # filtering on them prune whole partitions at plan time — pick a
    # low-cardinality natural key (a date, a region) for 100 TB tables
    target_partition_by: list[str] = field(default_factory=list)
    # deterministic grain-derived salt added as an extra merge-join key
    # (operators/publish.py:merge_salt): opt-in protection against
    # hash-partition collision clusters in the MERGE shuffle; semantics
    # unchanged (the salt is a pure function of the grain)
    merge_salt_buckets: int | None = None

    def matches(self, filename: str) -> bool:
        """Glob match on the lowered basename (reference sources/base.py:31-38)."""
        base = filename.replace("\\", "/").rsplit("/", 1)[-1].lower()
        # strip .gz so sales_x.csv.gz matches sales_*.csv
        if base.endswith(".gz"):
            base = base[: -len(".gz")]
        return fnmatch.fnmatch(base, self.file_pattern.lower())

    @property
    def field_by_name(self) -> dict[str, FieldSpec]:
        return {f.name: f for f in self.fields}

    @property
    def business_columns(self) -> list[str]:
        return [f.name for f in self.fields]

    @property
    def target_table(self) -> str:
        return sanitize_identifier(self.name)


def sanitize_identifier(name: str) -> str:
    """``[^a-zA-Z0-9_] -> _`` (reference db_utils.py:43-50)."""
    return re.sub(r"[^a-zA-Z0-9_]", "_", name)


def stage_table_name(filename: str) -> str:
    """``stage__<sanitized filename>`` (reference db_utils.py:204-224)."""
    base = filename.replace("\\", "/").rsplit("/", 1)[-1]
    return f"stage__{sanitize_identifier(base)}"
