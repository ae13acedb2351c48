"""Digest canonicalization: the Spark term expressions and the DuckDB term
SQL must produce IDENTICAL checksums for the same logical rows — this is
what lets one digest row value-verify a whole member query (digest.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_file_loader_spark import digest

KINDS_SCHEMA = (
    "s_col string, i_col long, f_col double, d_col date, t_col timestamp, b_col boolean"
)
SPEC = [
    ["b_col", "b"],
    ["d_col", "d"],
    ["f_col", "f"],
    ["i_col", "i"],
    ["s_col", "s"],
    ["t_col", "t"],
]

ROWS = [
    ("plain", 1, 1.5, "2024-01-31", "2024-01-31 23:59:59", True),
    ("", 0, 0.0, "1970-01-01", "1970-01-01 00:00:00", False),
    (None, None, None, None, None, None),
    ("unicode ✓ émoji", -7, -123.456789, "1999-12-31", "2000-02-29 12:00:00", True),
    ("pipe|comma,quote\"", 2**40, 1e9 + 0.000001, "2038-01-19", "1987-06-05 04:03:02", False),
    ("neg", -(2**40), -0.000001, "2001-09-09", "2024-06-30 23:00:00", None),
    ("tiny", 3, 1e-7, "2024-07-01", "2024-07-01 01:02:03", True),
]


@pytest.fixture(scope="module")
def duck(tmp_path_factory):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (s_col VARCHAR, i_col BIGINT, f_col DOUBLE, "
        "d_col DATE, t_col TIMESTAMP, b_col BOOLEAN)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?, ?)", ROWS)
    return con


def test_spark_duckdb_checksums_match(spark, duck):
    import datetime as dt

    pyrows = [
        (
            s,
            i,
            f,
            dt.date.fromisoformat(d) if d else None,
            dt.datetime.fromisoformat(t) if t else None,
            b,
        )
        for s, i, f, d, t, b in ROWS
    ]
    df = spark.createDataFrame(pyrows, KINDS_SCHEMA)
    srow = digest.digest_frame(df, "kinds", SPEC).collect()[0]
    osql = digest.digest_oracle_sql("kinds", "SELECT * FROM t", SPEC)
    orow = duck.execute(osql).fetchone()
    assert (srow.query_name, srow.n_rows, srow.checksum) == orow


def test_checksum_order_insensitive(spark):
    df1 = spark.createDataFrame([( "a", 1), ("b", 2), ("c", 3)], "s_col string, i_col long")
    df2 = spark.createDataFrame([( "c", 3), ("a", 1), ("b", 2)], "s_col string, i_col long")
    spec = [["i_col", "i"], ["s_col", "s"]]
    c1 = digest.digest_frame(df1, "x", spec).collect()[0].checksum
    c2 = digest.digest_frame(df2, "x", spec).collect()[0].checksum
    assert c1 == c2


def test_checksum_detects_value_change(spark):
    spec = [["i_col", "i"], ["s_col", "s"]]
    base = spark.createDataFrame([("a", 1), ("b", 2)], "s_col string, i_col long")
    tweaked = spark.createDataFrame([("a", 1), ("b", 3)], "s_col string, i_col long")
    swapped = spark.createDataFrame([("a", 2), ("b", 1)], "s_col string, i_col long")
    cb = digest.digest_frame(base, "x", spec).collect()[0].checksum
    ct = digest.digest_frame(tweaked, "x", spec).collect()[0].checksum
    cs = digest.digest_frame(swapped, "x", spec).collect()[0].checksum
    assert cb != ct
    assert cb != cs  # column pairing matters, not just the value multiset


def test_numeric_null_differs_from_zero(spark):
    # NULL must not checksum-collide with 0 / 0.0 / false (ADVICE r3):
    # numeric kinds render NULL to the non-decimal sentinel 'N'.
    spec = [["b_col", "b"], ["f_col", "f"], ["i_col", "i"]]
    schema = "i_col long, f_col double, b_col boolean"
    zeros = spark.createDataFrame([(0, 0.0, False)], schema)
    nulls = spark.createDataFrame([(None, None, None)], schema)
    cz = digest.digest_frame(zeros, "x", spec).collect()[0].checksum
    cn = digest.digest_frame(nulls, "x", spec).collect()[0].checksum
    assert cz != cn


def test_spec_drift_raises(spark):
    df = spark.createDataFrame([("a", 1)], "s_col string, i_col long")
    with pytest.raises(ValueError, match="spec drift"):
        digest.digest_frame(df, "x", [["s_col", "s"]])  # missing column
    with pytest.raises(ValueError, match="spec drift"):
        digest.digest_frame(df, "x", [["i_col", "s"], ["s_col", "s"]])  # wrong kind
