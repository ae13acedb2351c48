"""Driver-parity tests for the local correctness gate's coercion audit.

The driver's hasher materializes both result sets via pandas/arrow, where
DuckDB HUGEINT coerces to float64. tools/check_correctness.py must flag
that class locally (CORRECTNESS_r10's bloom_filter_check red row) without
false-flagging nullable int columns that coerce identically on both sides
(asof_join, green for nine rounds).
"""

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_correctness import coercion_hazards  # noqa: E402


def _oracle(sql):
    con = duckdb.connect()
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    odtypes = list(con.execute(sql).df().dtypes)
    return ocols, orows, odtypes


def test_uncast_hugeint_sum_is_flagged():
    # the exact bloom_filter_check shape: sum(BIGINT) -> HUGEINT -> float64
    # in pandas, vs a non-null int64 on the Spark side
    ocols, orows, odtypes = _oracle(
        "SELECT sum(CAST(x AS BIGINT)) AS value FROM (SELECT unnest(range(1, 4)) x)"
    )
    scols, srows = ["value"], [(6,)]
    hazards = coercion_hazards(ocols, orows, odtypes, scols, srows)
    assert len(hazards) == 1 and "value" in hazards[0]


def test_cast_to_bigint_passes():
    ocols, orows, odtypes = _oracle(
        "SELECT CAST(sum(CAST(x AS BIGINT)) AS BIGINT) AS value "
        "FROM (SELECT unnest(range(1, 4)) x)"
    )
    hazards = coercion_hazards(ocols, orows, odtypes, ["value"], [(6,)])
    assert hazards == []


def test_nullable_int_on_both_sides_not_flagged():
    # left-join NULLs: float64 carrier on BOTH engines -> kinds agree
    ocols, orows, odtypes = _oracle(
        "SELECT * FROM (VALUES (1, NULL), (2, 5)) t(a, b)"
    )
    scols, srows = ["a", "b"], [(1, None), (2, 5)]
    hazards = coercion_hazards(ocols, orows, odtypes, scols, srows)
    assert hazards == []


def test_oracle_int_vs_spark_nullable_is_flagged():
    # the symmetric disagreement: oracle coalesced to non-null int while
    # Spark still carries NULLs -> Spark renders float, oracle renders int
    ocols, orows, odtypes = _oracle("SELECT 5 AS b")
    scols, srows = ["b"], [(5,), (None,)]
    hazards = coercion_hazards(ocols, orows, odtypes, scols, srows)
    assert len(hazards) == 1 and "'b'" in hazards[0]


def test_true_float_columns_skipped():
    ocols, orows, odtypes = _oracle("SELECT 1.5 AS f")
    hazards = coercion_hazards(ocols, orows, odtypes, ["f"], [(1.5,)])
    assert hazards == []
