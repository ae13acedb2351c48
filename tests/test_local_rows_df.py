"""local_rows_df (optimization round 14): literal driver rows must build a
frame whose VALUES are identical to the plain createDataFrame(list, schema)
form — only the transport differs (LocalRelation under Arrow sessions
instead of a defaultParallelism-partition Python RDD; the non-Arrow
fallback path, which this test session exercises, must accept the same
Python values the list form accepts)."""

from datetime import datetime

from pyspark.sql import types as T

from etl_file_loader_spark.functions import local_rows_df

MIXED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("ok", T.BooleanType(), True),
        T.StructField("cnt", T.LongType(), True),
        T.StructField("vec", T.ArrayType(T.DoubleType()), True),
    ]
)

ROWS = [
    (1, "a", datetime(2026, 1, 1, 12, 0, 0), True, 5, [1.0, 2.5]),
    (2, "b", datetime(2026, 1, 2), None, None, None),
]


def test_values_identical_to_list_form(spark):
    got = local_rows_df(spark, ROWS, MIXED_SCHEMA).collect()
    want = spark.createDataFrame(ROWS, MIXED_SCHEMA).collect()
    assert got == want


def test_schema_string_positional(spark):
    df = local_rows_df(spark, [("x", 100)], "domain string, w_milli long")
    assert df.dtypes == [("domain", "string"), ("w_milli", "bigint")]
    assert df.collect()[0].asDict() == {"domain": "x", "w_milli": 100}


def test_empty_rows(spark):
    df = local_rows_df(spark, [], "a int, b string")
    assert df.count() == 0
    assert df.dtypes == [("a", "int"), ("b", "string")]
