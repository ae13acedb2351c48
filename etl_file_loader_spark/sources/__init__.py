"""File sources (SURVEY §2.1 S1-S13): CSV(+gzip), JSON(+gzip), Parquet, Excel.

Contract shared by all readers: return a DataFrame of *raw* columns named by
the file's headers (all-string where the format is untyped: CSV/Excel; native
types for JSON/Parquet) plus a deterministic 1-based ``_file_row_number``
matching the reference's DLQ row numbering (reference read/csv.py:34-37:
CSV/Excel data starts at 2+skip_rows; JSON/Parquet at 1).
"""

from etl_file_loader_spark.sources.base import read_source

__all__ = ["read_source"]
