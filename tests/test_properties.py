"""Property-based tests (hypothesis) for hashing / validation / serial dates.

Spark round-trips are expensive per example, so properties run on small
max_examples with batched inputs: generate a list of values, run ONE Spark
job over all of them, compare against a pure-Python model.
"""

import hashlib
from datetime import date, timedelta

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_file_loader_spark.functions import row_hash

text_values = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(codec="ascii", exclude_characters="|\x00"),
        max_size=20,
    ),
)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(text_values, text_values, st.integers(-(2**31), 2**31)), min_size=1, max_size=20))
def test_row_hash_matches_python_model(spark, rows):
    """md5('|'.join(sorted-by-name rendered values, null->''))."""
    df = spark.createDataFrame(rows, "b string, a string, n long")
    fields = {"a": T.StringType(), "b": T.StringType(), "n": T.LongType()}
    got = [r["h"] for r in df.select(row_hash(fields).alias("h")).collect()]
    for (b, a, n), h in zip(rows, got):
        joined = "|".join(["" if a is None else a, "" if b is None else b, str(n)])
        assert h == hashlib.md5(joined.encode()).hexdigest()


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(0, 200000), min_size=1, max_size=50))
def test_excel_serial_date_matches_python(spark, serials):
    from etl_file_loader_spark.functions import excel_serial_to_date

    df = spark.createDataFrame([(s,) for s in serials], "serial long")
    got = [
        r["d"]
        for r in df.select(
            excel_serial_to_date(F.col("serial")).alias("d")
        ).collect()
    ]
    for s, d in zip(serials, got):
        assert d == date(1899, 12, 30) + timedelta(days=s)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.integers(-(10**12), 10**12).map(str),
            st.text(alphabet="abc.-", max_size=6),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_try_cast_long_error_capture(spark, raws):
    """A non-null raw that fails the long-cast is always captured as exactly
    one cast_error; parseable raws produce the parsed value and no error."""
    from etl_file_loader_spark.config import FieldSpec, SourceConfig
    from etl_file_loader_spark.operators import validate as V

    cfg = SourceConfig(
        name="p", file_pattern="*", file_format="csv",
        fields=[FieldSpec("x", T.LongType(), nullable=True)], grain=["x"],
    )
    df = spark.createDataFrame([(r,) for r in raws], "x string")
    out = V.validate(df, cfg).select("x", F.size(V.ERRORS_COL).alias("n")).collect()
    for raw, row in zip(raws, out):
        if raw is None:
            assert row["n"] == 0
        else:
            try:
                expected = int(raw)
            except ValueError:
                expected = None
            if expected is None:
                assert row["n"] == 1
            else:
                assert row["n"] == 0 and row["x"] == expected
