"""Pipeline-parity queries: SURVEY §2 ingestion operators on the synthetic tables.

Split from the monolithic suite.py (round 4); unit text unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window
from etl_file_loader_spark.config import FieldSpec, SourceConfig
from etl_file_loader_spark.functions import clean_email, clean_phone, excel_serial_to_date, excel_serial_to_timestamp, row_hash
from etl_file_loader_spark.operators import audit as audit_ops
from etl_file_loader_spark.operators import publish as publish_ops
from etl_file_loader_spark.operators import validate as validate_ops
from etl_file_loader_spark.operators.hashing import HASH_COL
from etl_file_loader_spark.suite._shared import ORACLES, QUERIES, _t


# ---------------------------------------------------------------------------
# pipeline-parity queries (SURVEY §2 operators on the synthetic tables)
# ---------------------------------------------------------------------------

CUSTOMER_HASH_FIELDS = {
    "c_acctbal": T.DoubleType(),
    "c_custkey": T.LongType(),
    "c_mktsegment": T.StringType(),
    "c_name": T.StringType(),
    "c_nationkey": T.IntegerType(),
}


def q_row_hash_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 row hash: md5 over sorted business columns, '|' joined, null->''."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey", row_hash(CUSTOMER_HASH_FIELDS).alias("etl_row_hash")
    )


Q_ROW_HASH_CUSTOMER_SQL = """
SELECT c_custkey,
       md5(concat_ws('|',
           coalesce(printf('%.6f', c_acctbal), ''),
           coalesce(CAST(c_custkey AS VARCHAR), ''),
           coalesce(c_mktsegment, ''),
           coalesce(c_name, ''),
           coalesce(CAST(c_nationkey AS VARCHAR), ''))) AS etl_row_hash
FROM customer ORDER BY c_custkey
"""


def _lineitem_raw_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem rendered to raw strings with injected bad cells (validation input)."""
    li = _t(spark, sf_dir, "lineitem")
    bad = (F.col("l_linenumber") % 2 == 0) & (F.col("l_orderkey") % 7 == 0)
    return li.select(
        F.col("l_orderkey").cast("string").alias("l_orderkey"),
        F.col("l_linenumber").cast("string").alias("l_linenumber"),
        F.when(bad, F.lit("not_a_number"))
        .otherwise(F.col("l_quantity").cast("string"))
        .alias("l_quantity"),
        F.col("l_discount").cast("string").alias("l_discount"),
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("l_shipdate"),
    )


_LINEITEM_RAW_SQL = """
  SELECT CAST(l_orderkey AS VARCHAR) AS l_orderkey,
         CAST(l_linenumber AS VARCHAR) AS l_linenumber,
         CASE WHEN l_linenumber % 2 = 0 AND l_orderkey % 7 = 0 THEN 'not_a_number'
              ELSE CAST(l_quantity AS VARCHAR) END AS l_quantity,
         CAST(l_discount AS VARCHAR) AS l_discount,
         strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS l_shipdate
  FROM lineitem
"""


LINEITEM_VALIDATE_CONFIG = SourceConfig(
    name="lineitem_validate",
    file_pattern="*",
    file_format="parquet",
    fields=[
        FieldSpec("l_orderkey", T.LongType(), nullable=False),
        FieldSpec("l_linenumber", T.LongType(), nullable=False),
        FieldSpec("l_quantity", T.DoubleType(), nullable=False, min_value=1, max_value=45),
        FieldSpec("l_discount", T.DoubleType(), nullable=False, min_value=0, max_value=1),
        FieldSpec("l_shipdate", T.TimestampType(), nullable=False),
    ],
    grain=["l_orderkey", "l_linenumber"],
)


def q_validate_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2-P4: try-cast + range constraints, per-row error count + validity."""
    raw = _lineitem_raw_strings(spark, sf_dir)
    validated = validate_ops.validate(raw, LINEITEM_VALIDATE_CONFIG)
    return validated.select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.size(F.col(validate_ops.ERRORS_COL)).alias("n_errors"),
        F.col(validate_ops.VALID_COL).cast("int").alias("is_valid"),
    )


Q_VALIDATE_SPLIT_SQL = f"""
WITH raw AS ({_LINEITEM_RAW_SQL})
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       CAST(l_linenumber AS BIGINT) AS l_linenumber,
       (CASE WHEN try_cast(l_quantity AS DOUBLE) IS NULL THEN 1
             WHEN try_cast(l_quantity AS DOUBLE) < 1 THEN 1
             WHEN try_cast(l_quantity AS DOUBLE) > 45 THEN 1 ELSE 0 END)
       + (CASE WHEN try_cast(l_discount AS DOUBLE) < 0 THEN 1
               WHEN try_cast(l_discount AS DOUBLE) > 1 THEN 1 ELSE 0 END)
       AS n_errors,
       CASE WHEN (try_cast(l_quantity AS DOUBLE) IS NOT NULL
                  AND try_cast(l_quantity AS DOUBLE) BETWEEN 1 AND 45
                  AND try_cast(l_discount AS DOUBLE) BETWEEN 0 AND 1)
            THEN 1 ELSE 0 END AS is_valid
FROM raw
ORDER BY 1, 2
"""


def q_dlq_error_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: invalid rows exploded to per-field error records."""
    raw = _lineitem_raw_strings(spark, sf_dir)
    validated = validate_ops.validate(raw, LINEITEM_VALIDATE_CONFIG)
    _, invalid = validate_ops.split(validated)
    return (
        invalid.select(
            "l_orderkey",
            "l_linenumber",
            F.explode(F.col(validate_ops.ERRORS_COL)).alias("e"),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("e.column_name").alias("column_name"),
            F.col("e.column_value").alias("column_value"),
            F.col("e.error_type").alias("error_type"),
            F.col("e.error_msg").alias("error_msg"),
        )
    )


Q_DLQ_ERROR_RECORDS_SQL = f"""
WITH raw AS ({_LINEITEM_RAW_SQL})
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       CAST(l_linenumber AS BIGINT) AS l_linenumber,
       'l_quantity' AS column_name,
       l_quantity AS column_value,
       CASE WHEN try_cast(l_quantity AS DOUBLE) IS NULL THEN 'cast_error'
            WHEN try_cast(l_quantity AS DOUBLE) < 1 THEN 'min_value'
            ELSE 'max_value' END AS error_type,
       CASE WHEN try_cast(l_quantity AS DOUBLE) IS NULL THEN 'could not parse as double'
            WHEN try_cast(l_quantity AS DOUBLE) < 1 THEN 'value below 1.0'
            ELSE 'value above 45.0' END AS error_msg
FROM raw
WHERE try_cast(l_quantity AS DOUBLE) IS NULL
   OR try_cast(l_quantity AS DOUBLE) < 1 OR try_cast(l_quantity AS DOUBLE) > 45
ORDER BY 1, 2, 3
"""


def q_grain_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: composite-grain uniqueness counts in one aggregate pass."""
    li = _t(spark, sf_dir, "lineitem")
    return audit_ops.grain_counts(li, ["l_orderkey", "l_linenumber"])


Q_GRAIN_AUDIT_SQL = """
SELECT count(*) AS total_rows,
       count(DISTINCT (l_orderkey, l_linenumber)) AS distinct_grains,
       CASE WHEN count(*) = count(DISTINCT (l_orderkey, l_linenumber)) THEN 1 ELSE 0 END AS is_unique
FROM lineitem
"""


def q_dup_grain_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: top-5 duplicated grains, deterministic order."""
    li = _t(spark, sf_dir, "lineitem")
    return audit_ops.duplicate_grain_examples(li, ["l_orderkey", "l_linenumber"], 5)


Q_DUP_GRAIN_EXAMPLES_SQL = """
SELECT l_orderkey, l_linenumber, count(*) AS duplicate_count
FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1
ORDER BY count(*) DESC, l_orderkey, l_linenumber
LIMIT 5
"""


LINEITEM_AUDIT_SQL = """
SELECT CASE WHEN SUM(CASE WHEN l_quantity > 0 THEN 1 ELSE 0 END) = COUNT(*) THEN 1 ELSE 0 END AS quantity_positive,
       CASE WHEN SUM(CASE WHEN l_extendedprice > 0 THEN 1 ELSE 0 END) = COUNT(*) THEN 1 ELSE 0 END AS price_positive,
       CASE WHEN SUM(CASE WHEN l_discount BETWEEN 0 AND 0.5 THEN 1 ELSE 0 END) = COUNT(*) THEN 1 ELSE 0 END AS discount_in_range
FROM {table}
"""


def q_audit_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: the user audit-SQL contract — single row, 0-valued column = fail."""
    li = _t(spark, sf_dir, "lineitem")
    return audit_ops.run_audit_query(spark, li, LINEITEM_AUDIT_SQL, "lineitem_audit_view")


Q_AUDIT_CONTRACT_SQL = LINEITEM_AUDIT_SQL.format(table="lineitem")


def q_threshold_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: validation error-rate vs threshold (0.05), round-2 rate."""
    raw = _lineitem_raw_strings(spark, sf_dir)
    validated = validate_ops.validate(raw, LINEITEM_VALIDATE_CONFIG)
    return validated.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum((~F.col(validate_ops.VALID_COL)).cast("long")).alias("error_rows"),
    ).select(
        "total_rows",
        "error_rows",
        F.round(F.col("error_rows") / F.col("total_rows"), 2).alias("error_rate"),
        (F.round(F.col("error_rows") / F.col("total_rows"), 2) < 0.05)
        .cast("int")
        .alias("passed"),
    )


Q_THRESHOLD_STATS_SQL = f"""
WITH raw AS ({_LINEITEM_RAW_SQL}),
flags AS (
  SELECT CASE WHEN (try_cast(l_quantity AS DOUBLE) IS NOT NULL
                    AND try_cast(l_quantity AS DOUBLE) BETWEEN 1 AND 45
                    AND try_cast(l_discount AS DOUBLE) BETWEEN 0 AND 1)
              THEN 0 ELSE 1 END AS is_err
  FROM raw
)
SELECT count(*) AS total_rows, CAST(sum(is_err) AS BIGINT) AS error_rows,
       round(sum(is_err) / count(*), 2) AS error_rate,
       CASE WHEN round(sum(is_err) / count(*), 2) < 0.05 THEN 1 ELSE 0 END AS passed
FROM flags
"""


ORDERS_HASH_FIELDS = {
    "o_custkey": T.LongType(),
    "o_orderdate": T.TimestampType(),
    "o_orderkey": T.LongType(),
    "o_orderpriority": T.StringType(),
    "o_orderstatus": T.StringType(),
    "o_totalprice": T.DoubleType(),
}


_ORDERS_BUSINESS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


_ORDERS_HASH_SQL = """md5(concat_ws('|',
    coalesce(CAST(o_custkey AS VARCHAR), ''),
    coalesce(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), ''),
    coalesce(CAST(o_orderkey AS VARCHAR), ''),
    coalesce(o_orderpriority, ''),
    coalesce(o_orderstatus, ''),
    coalesce(printf('%.6f', o_totalprice), '')))"""


def _merge_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Simulated target (2/3 of orders, loaded earlier) + stage (1/2, half changed)."""
    orders = _t(spark, sf_dir, "orders")
    target = (
        orders.filter(F.col("o_orderkey") % 3 != 0)
        .withColumn(HASH_COL, row_hash(ORDERS_HASH_FIELDS))
        .withColumn(publish_ops.FILENAME_COL, F.lit("initial_load.parquet"))
        .withColumn(publish_ops.LOG_ID_COL, F.lit(1).cast("long"))
        .withColumn(
            publish_ops.CREATED_COL, F.lit("2024-01-01 00:00:00").cast("timestamp")
        )
        .withColumn(publish_ops.UPDATED_COL, F.lit(None).cast("timestamp"))
    )
    stage = (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn(HASH_COL, row_hash(ORDERS_HASH_FIELDS))
        .withColumn(publish_ops.FILENAME_COL, F.lit("reload.parquet"))
        .withColumn(publish_ops.LOG_ID_COL, F.lit(2).cast("long"))
    )
    return target, stage


_MERGE_FRAMES_SQL = f"""
target AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
         {_ORDERS_HASH_SQL} AS etl_row_hash,
         'initial_load.parquet' AS source_filename, CAST(1 AS BIGINT) AS file_load_log_id,
         TIMESTAMP '2024-01-01 00:00:00' AS etl_created_at, CAST(NULL AS TIMESTAMP) AS etl_updated_at
  FROM orders WHERE o_orderkey % 3 <> 0
),
stage AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
         {_ORDERS_HASH_SQL} AS etl_row_hash,
         'reload.parquet' AS source_filename, CAST(2 AS BIGINT) AS file_load_log_id
  FROM (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 0)
)"""


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: hash-guarded MERGE (full-outer-join rewrite), fixed 'now'."""
    target, stage = _merge_frames(spark, sf_dir)
    merged = publish_ops.merge_upsert(
        target,
        stage,
        ["o_orderkey"],
        _ORDERS_BUSINESS,
        now=F.lit("2024-06-01 00:00:00").cast("timestamp"),
    )
    return merged.select(
        "o_orderkey",
        "o_totalprice",
        "o_orderstatus",
        F.col(publish_ops.FILENAME_COL),
        F.col(publish_ops.LOG_ID_COL),
        F.date_format(publish_ops.CREATED_COL, "yyyy-MM-dd HH:mm:ss").alias("created_at"),
        F.date_format(publish_ops.UPDATED_COL, "yyyy-MM-dd HH:mm:ss").alias("updated_at"),
        F.col(HASH_COL),
    )


Q_MERGE_UPSERT_SQL = f"""
WITH {_MERGE_FRAMES_SQL}
SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
       CASE WHEN s.o_orderkey IS NOT NULL AND (t.o_orderkey IS NULL OR s.etl_row_hash <> t.etl_row_hash)
            THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
       CASE WHEN s.o_orderkey IS NOT NULL AND (t.o_orderkey IS NULL OR s.etl_row_hash <> t.etl_row_hash)
            THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
       CASE WHEN s.o_orderkey IS NOT NULL AND (t.o_orderkey IS NULL OR s.etl_row_hash <> t.etl_row_hash)
            THEN s.source_filename ELSE t.source_filename END AS source_filename,
       CASE WHEN s.o_orderkey IS NOT NULL AND (t.o_orderkey IS NULL OR s.etl_row_hash <> t.etl_row_hash)
            THEN s.file_load_log_id ELSE t.file_load_log_id END AS file_load_log_id,
       strftime(CASE WHEN t.o_orderkey IS NOT NULL THEN t.etl_created_at
                     ELSE TIMESTAMP '2024-06-01 00:00:00' END, '%Y-%m-%d %H:%M:%S') AS created_at,
       strftime(CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey IS NOT NULL
                          AND s.etl_row_hash <> t.etl_row_hash
                     THEN TIMESTAMP '2024-06-01 00:00:00' ELSE t.etl_updated_at END,
                '%Y-%m-%d %H:%M:%S') AS updated_at,
       CASE WHEN s.o_orderkey IS NOT NULL AND (t.o_orderkey IS NULL OR s.etl_row_hash <> t.etl_row_hash)
            THEN s.etl_row_hash ELSE t.etl_row_hash END AS etl_row_hash
FROM stage s FULL OUTER JOIN target t ON s.o_orderkey = t.o_orderkey
ORDER BY 1
"""


def q_publish_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/J3: insert/update/unchanged counts in one outer-join pass."""
    target, stage = _merge_frames(spark, sf_dir)
    s = stage.select("o_orderkey", F.col(HASH_COL).alias("s_hash"))
    t = target.select("o_orderkey", F.col(HASH_COL).alias("t_hash"))
    j = s.join(t, "o_orderkey", "full_outer")
    return j.agg(
        F.sum((F.col("s_hash").isNotNull() & F.col("t_hash").isNull()).cast("long")).alias(
            "inserts"
        ),
        F.sum(
            (
                F.col("s_hash").isNotNull()
                & F.col("t_hash").isNotNull()
                & (F.col("s_hash") != F.col("t_hash"))
            ).cast("long")
        ).alias("updates"),
        F.sum(
            (
                F.col("s_hash").isNotNull()
                & F.col("t_hash").isNotNull()
                & (F.col("s_hash") == F.col("t_hash"))
            ).cast("long")
        ).alias("unchanged"),
    )


Q_PUBLISH_COUNTS_SQL = f"""
WITH {_MERGE_FRAMES_SQL}
SELECT CAST(sum(CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS inserts,
       CAST(sum(CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey IS NOT NULL
                     AND s.etl_row_hash <> t.etl_row_hash THEN 1 ELSE 0 END) AS BIGINT) AS updates,
       CAST(sum(CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey IS NOT NULL
                     AND s.etl_row_hash = t.etl_row_hash THEN 1 ELSE 0 END) AS BIGINT) AS unchanged
FROM stage s FULL OUTER JOIN target t ON s.o_orderkey = t.o_orderkey
"""


def q_file_loaded_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 shape: has this filename been published already?"""
    orders = _t(spark, sf_dir, "orders")
    tagged = orders.withColumn(
        "source_filename",
        F.concat(F.lit("orders_"), (F.col("o_orderkey") % 5).cast("string"), F.lit(".csv")),
    )
    return tagged.agg(
        F.max((F.col("source_filename") == "orders_3.csv").cast("int")).alias(
            "already_loaded"
        )
    )


Q_FILE_LOADED_CHECK_SQL = """
SELECT max(CASE WHEN source_filename = 'orders_3.csv' THEN 1 ELSE 0 END) AS already_loaded
FROM (SELECT 'orders_' || CAST(o_orderkey % 5 AS VARCHAR) || '.csv' AS source_filename FROM orders)
"""


def q_dlq_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: drop same-file DLQ rows from earlier runs (log_id < current)."""
    from etl_file_loader_spark.operators.dlq import cleanup_dlq

    ev = _t(spark, sf_dir, "events")
    dlq = ev.select(
        F.col("event_id").alias("dlq_id"),
        F.concat(F.lit("f"), (F.col("user_id") % 3).cast("string"), F.lit(".csv")).alias(
            "source_filename"
        ),
        (F.col("event_id") % 10).cast("long").alias("file_load_log_id"),
    )
    return cleanup_dlq(dlq, "f1.csv", 5)


Q_DLQ_CLEANUP_SQL = """
SELECT event_id AS dlq_id,
       'f' || CAST(user_id % 3 AS VARCHAR) || '.csv' AS source_filename,
       CAST(event_id % 10 AS BIGINT) AS file_load_log_id
FROM events
WHERE NOT ('f' || CAST(user_id % 3 AS VARCHAR) || '.csv' = 'f1.csv' AND event_id % 10 < 5)
ORDER BY 1
"""


def q_cleaners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: phone regexp-strip + email trim/lowercase cleaners."""
    cust = _t(spark, sf_dir, "customer")
    phone_raw = F.concat(
        F.lit("("), (F.col("c_custkey") % 1000).cast("string"), F.lit(") 555-"),
        (F.col("c_custkey") % 10000).cast("string"),
    )
    email_raw = F.concat(F.lit("  "), F.upper(F.col("c_name")), F.lit("@Example.COM  "))
    return cust.select(
        "c_custkey",
        clean_phone(phone_raw).alias("phone_clean"),
        clean_email(email_raw).alias("email_clean"),
    )


Q_CLEANERS_SQL = r"""
SELECT c_custkey,
       regexp_replace('(' || CAST(c_custkey % 1000 AS VARCHAR) || ') 555-' || CAST(c_custkey % 10000 AS VARCHAR),
                      '[^\d+]', '', 'g') AS phone_clean,
       lower(trim('  ' || upper(c_name) || '@Example.COM  ')) AS email_clean
FROM customer ORDER BY c_custkey
"""


def q_excel_serial_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: Excel 1899-12-30-epoch serial -> date / timestamp conversion."""
    orders = _t(spark, sf_dir, "orders")
    serial_int = (F.col("o_orderkey") % 50000).cast("double")
    serial_frac = serial_int + (F.col("o_orderkey") % 86400) / F.lit(86400.0)
    return orders.select(
        "o_orderkey",
        F.date_format(excel_serial_to_date(serial_int), "yyyy-MM-dd").alias("serial_date"),
        F.date_format(excel_serial_to_timestamp(serial_frac), "yyyy-MM-dd HH:mm:ss").alias(
            "serial_ts"
        ),
    )


Q_EXCEL_SERIAL_DATES_SQL = """
SELECT o_orderkey,
       strftime(DATE '1899-12-30' + CAST(o_orderkey % 50000 AS INT), '%Y-%m-%d') AS serial_date,
       strftime(CAST(DATE '1899-12-30' + CAST(floor(o_orderkey % 50000 + (o_orderkey % 86400) / 86400.0) AS INT) AS TIMESTAMP)
                + to_seconds(CAST(floor(((o_orderkey % 50000 + (o_orderkey % 86400) / 86400.0)
                                          - floor(o_orderkey % 50000 + (o_orderkey % 86400) / 86400.0)) * 86400) AS BIGINT)),
                '%Y-%m-%d %H:%M:%S') AS serial_ts
FROM orders ORDER BY o_orderkey
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4-adjacent: JSON path extraction from a string column."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k_value"),
    )


Q_JSON_EXTRACT_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
FROM events ORDER BY event_id
"""


def q_file_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/S10 shape: deterministic row numbering + skip-rows filter."""
    ev = _t(spark, sf_dir, "events")
    w = Window.orderBy("event_id")
    return (
        ev.select("event_id", F.row_number().over(w).cast("long").alias("file_row_number"))
        .filter(F.col("file_row_number") > 3)
    )


Q_FILE_ROW_NUMBER_SQL = """
SELECT event_id, file_row_number FROM (
  SELECT event_id, CAST(row_number() OVER (ORDER BY event_id) AS BIGINT) AS file_row_number
  FROM events
) WHERE file_row_number > 3 ORDER BY event_id
"""




def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD merge (operators/publish.py:scd2_apply): a customer
    dimension with pre-existing history receives a batch where 1/4 of
    keys changed segment, half are unchanged, odd keys are absent, and
    1% are brand new. Full per-row value check of the closed/new/
    passthrough/history logic under the house row-hash discipline."""
    cust = _t(spark, sf_dir, "customer")
    tracked = ["c_mktsegment", "c_name", "c_nationkey"]
    hist = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", *tracked,
        F.lit("2019-01-01").alias("valid_from"),
        F.lit("2020-01-01").alias("valid_to"),
        F.lit(0).cast("long").alias("is_current"),
    )
    cur = cust.select(
        "c_custkey", *tracked,
        F.lit("2020-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(1).cast("long").alias("is_current"),
    )
    current = hist.unionByName(cur)
    upd = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 4 == 0, F.concat(F.col("c_mktsegment"), F.lit("_R8"))
        ).otherwise(F.col("c_mktsegment")).alias("c_mktsegment"),
        "c_name", "c_nationkey",
    ).unionByName(
        cust.filter(F.col("c_custkey") % 100 == 0).select(
            (F.col("c_custkey") + 1000000).alias("c_custkey"),
            F.lit("NEWSEG").alias("c_mktsegment"),
            F.lit("NEW").alias("c_name"),
            "c_nationkey",
        )
    )
    out = publish_ops.scd2_apply(
        current, upd, ["c_custkey"], tracked, "2021-01-01"
    )
    return out.orderBy("c_custkey", "valid_from", "is_current")


_SCD2_HASH = (
    "md5(concat_ws('|', coalesce({a}.c_mktsegment, ''), "
    "coalesce({a}.c_name, ''), coalesce(CAST({a}.c_nationkey AS VARCHAR), '')))"
)

Q_SCD2_MERGE_SQL = f"""
WITH hist AS (
  SELECT c_custkey, c_mktsegment, c_name, c_nationkey,
         '2019-01-01' AS valid_from, '2020-01-01' AS valid_to,
         CAST(0 AS BIGINT) AS is_current
  FROM customer WHERE c_custkey % 10 = 0
),
cur AS (
  SELECT c_custkey, c_mktsegment, c_name, c_nationkey FROM customer
),
upd AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 4 = 0 THEN c_mktsegment || '_R8'
              ELSE c_mktsegment END AS c_mktsegment,
         c_name, c_nationkey
  FROM customer WHERE c_custkey % 2 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEWSEG', 'NEW', c_nationkey
  FROM customer WHERE c_custkey % 100 = 0
),
j AS (
  SELECT coalesce(c.c_custkey, u.c_custkey) AS k,
         c.c_mktsegment AS c_seg, c.c_name AS c_nm, c.c_nationkey AS c_nk,
         u.c_mktsegment AS u_seg, u.c_name AS u_nm, u.c_nationkey AS u_nk,
         (c.c_custkey IS NOT NULL) AS in_c, (u.c_custkey IS NOT NULL) AS in_u,
         ({_SCD2_HASH.format(a="c")} <> {_SCD2_HASH.format(a="u")}) AS differs
  FROM cur c FULL OUTER JOIN upd u ON c.c_custkey = u.c_custkey
),
flags AS (SELECT *, in_c AND in_u AND differs AS changed FROM j)
SELECT c_custkey, c_mktsegment, c_name, c_nationkey,
       valid_from, valid_to, is_current
FROM (
  SELECT c_custkey, c_mktsegment, c_name, c_nationkey,
         valid_from, valid_to, is_current FROM hist
  UNION ALL
  SELECT k, c_seg, c_nm, c_nk, '2020-01-01',
         CASE WHEN changed THEN '2021-01-01' ELSE NULL END,
         CAST(CASE WHEN changed THEN 0 ELSE 1 END AS BIGINT)
  FROM flags WHERE in_c
  UNION ALL
  SELECT k, u_seg, u_nm, u_nk, '2021-01-01', NULL, CAST(1 AS BIGINT)
  FROM flags WHERE in_u AND (NOT in_c OR changed)
) t(c_custkey, c_mktsegment, c_name, c_nationkey, valid_from, valid_to, is_current)
ORDER BY c_custkey, valid_from, is_current
"""

_CDC_TRACKED = ["c_mktsegment", "c_name", "c_nationkey"]


def _cdc_fixture(spark: SparkSession, sf_dir: str):
    """(target, changes) shared by the batch ``cdc_apply`` row and the
    streaming ``streaming_cdc_apply`` row (which feeds the same changes
    in out-of-order micro-batches and must land on the same table)."""
    cust = _t(spark, sf_dir, "customer")
    tracked = _CDC_TRACKED
    target = cust.select(
        "c_custkey", *tracked, F.lit(100).cast("long").alias("seq")
    )

    def chg(df, seg, seq, op):
        return df.select(
            "c_custkey",
            seg.alias("c_mktsegment"),
            "c_name",
            "c_nationkey",
            F.lit(seq).cast("long").alias("seq"),
            F.lit(op).alias("op"),
        )

    changes = (
        chg(cust.filter(F.col("c_custkey") % 3 == 0),
            F.concat(F.col("c_mktsegment"), F.lit("_C1")), 200, "U")
        .unionByName(chg(cust.filter(F.col("c_custkey") % 6 == 0),
                         F.concat(F.col("c_mktsegment"), F.lit("_MID")), 150, "U"))
        .unionByName(chg(cust.filter(F.col("c_custkey") % 7 == 0),
                         F.col("c_mktsegment"), 210, "D"))
        .unionByName(chg(cust.filter(F.col("c_custkey") % 5 == 0),
                         F.lit("STALE"), 50, "U"))
        .unionByName(
            cust.filter(F.col("c_custkey") % 100 == 0).select(
                (F.col("c_custkey") + 2000000).alias("c_custkey"),
                F.lit("NEWSEG").alias("c_mktsegment"),
                F.lit("NEW").alias("c_name"),
                "c_nationkey",
                F.lit(200).cast("long").alias("seq"),
                F.lit("I").alias("op"),
            )
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 97 == 0).select(
                (F.col("c_custkey") + 3000000).alias("c_custkey"),
                F.lit("GONE").alias("c_mktsegment"),
                F.lit("GONE").alias("c_name"),
                "c_nationkey",
                F.lit(220).cast("long").alias("seq"),
                F.lit("D").alias("op"),
            )
        )
        .unionByName(chg(cust.filter(F.col("c_custkey") % 11 == 0),
                         F.lit("TIE_U"), 300, "U"))
        .unionByName(chg(cust.filter(F.col("c_custkey") % 11 == 0),
                         F.col("c_mktsegment"), 300, "D"))
    )
    return target, changes


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply-changes merge (operators/publish.py:cdc_apply): a keyed
    customer snapshot (seq=100) receives a change feed exercising every
    branch — latest-of-multiple upserts (seq 150 vs 200), deletes that
    out-sequence overlapping upserts (seq 210), stale changes below the
    target's seq (50, ignored), brand-new keys, deletes of absent keys
    (no-op), and an equal-seq upsert/delete tie (delete wins)."""
    target, changes = _cdc_fixture(spark, sf_dir)
    out = publish_ops.cdc_apply(
        target, changes, ["c_custkey"], _CDC_TRACKED, "seq"
    )
    return out.orderBy("c_custkey")


Q_CDC_APPLY_SQL = """
WITH target AS (
  SELECT c_custkey, c_mktsegment, c_name, c_nationkey,
         CAST(100 AS BIGINT) AS seq
  FROM customer
),
changes AS (
  SELECT c_custkey, c_mktsegment || '_C1' AS c_mktsegment, c_name,
         c_nationkey, CAST(200 AS BIGINT) AS seq, 'U' AS op
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey, c_mktsegment || '_MID', c_name, c_nationkey, 150, 'U'
  FROM customer WHERE c_custkey % 6 = 0
  UNION ALL
  SELECT c_custkey, c_mktsegment, c_name, c_nationkey, 210, 'D'
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, 'STALE', c_name, c_nationkey, 50, 'U'
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey + 2000000, 'NEWSEG', 'NEW', c_nationkey, 200, 'I'
  FROM customer WHERE c_custkey % 100 = 0
  UNION ALL
  SELECT c_custkey + 3000000, 'GONE', 'GONE', c_nationkey, 220, 'D'
  FROM customer WHERE c_custkey % 97 = 0
  UNION ALL
  SELECT c_custkey, 'TIE_U', c_name, c_nationkey, 300, 'U'
  FROM customer WHERE c_custkey % 11 = 0
  UNION ALL
  SELECT c_custkey, c_mktsegment, c_name, c_nationkey, 300, 'D'
  FROM customer WHERE c_custkey % 11 = 0
),
latest AS (
  SELECT * FROM (
    SELECT c_custkey, c_mktsegment, c_name, c_nationkey, seq,
           (op = 'D') AS is_del,
           row_number() OVER (
             PARTITION BY c_custkey
             ORDER BY seq DESC, (op = 'D') DESC,
                      md5(concat_ws('|', coalesce(c_mktsegment, ''),
                                    coalesce(c_name, ''),
                                    coalesce(CAST(c_nationkey AS VARCHAR), ''))) DESC
           ) AS rn
    FROM changes
  ) WHERE rn = 1
),
j AS (
  SELECT coalesce(t.c_custkey, u.c_custkey) AS k,
         t.c_mktsegment AS t_seg, t.c_name AS t_nm, t.c_nationkey AS t_nk,
         t.seq AS t_seq,
         u.c_mktsegment AS u_seg, u.c_name AS u_nm, u.c_nationkey AS u_nk,
         u.seq AS u_seq, u.is_del,
         (t.c_custkey IS NOT NULL) AS in_t, (u.c_custkey IS NOT NULL) AS in_u
  FROM target t FULL OUTER JOIN latest u ON t.c_custkey = u.c_custkey
),
flags AS (
  SELECT *, in_u AND (NOT in_t OR u_seq > t_seq) AS applies FROM j
)
SELECT k AS c_custkey,
       CASE WHEN applies AND NOT is_del THEN u_seg ELSE t_seg END AS c_mktsegment,
       CASE WHEN applies AND NOT is_del THEN u_nm ELSE t_nm END AS c_name,
       CASE WHEN applies AND NOT is_del THEN u_nk ELSE t_nk END AS c_nationkey,
       CASE WHEN applies AND NOT is_del THEN u_seq ELSE t_seq END AS seq
FROM flags
WHERE (applies AND NOT is_del) OR (in_t AND NOT (applies AND is_del))
ORDER BY c_custkey
"""


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic table profiler (operators/profile.py:profile_table) over a
    derived orders frame covering every branch: bigint / string / double /
    timestamp dtypes, a null-bearing column (priority with '1-URGENT'
    nulled), and an all-null column (n_distinct 0, NULL extrema/mode)."""
    from etl_file_loader_spark.operators.profile import profile_table

    orders = _t(spark, sf_dir, "orders")
    src = orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        F.expr("nullif(o_orderpriority, '1-URGENT')").alias("prio"),
        F.lit(None).cast("string").alias("all_null"),
    )
    return profile_table(src).orderBy("col_name")


def _profile_branch(col: str, dtype: str, floaty: bool = False) -> str:
    """One oracle UNION branch: aggregate stats + mode scalar subqueries."""
    if floaty:
        mn = "CAST(NULL AS VARCHAR)"
        mx = "CAST(NULL AS VARCHAR)"
        mnn = f"min({col})"
        mxn = f"max({col})"
        top_v = "CAST(NULL AS VARCHAR)"
    else:
        mn = f"CAST(min({col}) AS VARCHAR)"
        mx = f"CAST(max({col}) AS VARCHAR)"
        mnn = "CAST(NULL AS DOUBLE)"
        mxn = "CAST(NULL AS DOUBLE)"
        top_v = f"(SELECT v FROM mode_{col})"
    return f"""
  SELECT '{col}' AS col_name, '{dtype}' AS dtype,
         count(*) AS n_rows,
         count(*) - count({col}) AS n_nulls,
         count(DISTINCT CAST({col} AS VARCHAR)) AS n_distinct,
         {mn} AS min_str, {mx} AS max_str,
         {mnn} AS min_num, {mxn} AS max_num,
         {top_v} AS top_val,
         (SELECT cnt FROM mode_{col}) AS top_count
  FROM src"""


_PROFILE_COLS = [
    ("o_orderkey", "bigint", False),
    ("o_orderstatus", "string", False),
    ("o_totalprice", "double", True),
    ("o_orderdate", "timestamp", False),
    ("prio", "string", False),
    ("all_null", "string", False),
]

Q_PROFILE_ORDERS_SQL = (
    """
WITH src AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate,
         nullif(o_orderpriority, '1-URGENT') AS prio,
         CAST(NULL AS VARCHAR) AS all_null
  FROM orders
),
"""
    + ",\n".join(
        f"""mode_{c} AS (
  SELECT v, cnt FROM (
    SELECT CAST({c} AS VARCHAR) AS v, count(*) AS cnt
    FROM src WHERE {c} IS NOT NULL
    GROUP BY 1 ORDER BY cnt DESC, v ASC LIMIT 1
  )
)"""
        for c, _, _ in _PROFILE_COLS
    )
    + "\nSELECT * FROM ("
    + "\n  UNION ALL".join(_profile_branch(c, d, fl) for c, d, fl in _PROFILE_COLS)
    + "\n) ORDER BY col_name"
)


def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level snapshot diff (operators/audit.py:diff_tables): customer
    vs a derived 'new' snapshot with deletions (%13), single-column
    changes (%4 segment), double-column changes (%9 name + %36 overlap
    with segment), and inserted keys — every key's status and exact
    changed-column list value-checked."""
    cust = _t(spark, sf_dir, "customer")
    new = (
        cust.filter(F.col("c_custkey") % 13 != 0)
        .select(
            "c_custkey",
            F.when(
                F.col("c_custkey") % 4 == 0,
                F.concat(F.col("c_mktsegment"), F.lit("_X")),
            ).otherwise(F.col("c_mktsegment")).alias("c_mktsegment"),
            F.when(
                F.col("c_custkey") % 9 == 0, F.lit("RENAMED")
            ).otherwise(F.col("c_name")).alias("c_name"),
            "c_nationkey",
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 50 == 0).select(
                (F.col("c_custkey") + 4000000).alias("c_custkey"),
                F.lit("NEWSEG").alias("c_mktsegment"),
                F.lit("NEWNAME").alias("c_name"),
                "c_nationkey",
            )
        )
    )
    out = audit_ops.diff_tables(
        cust.select("c_custkey", "c_mktsegment", "c_name", "c_nationkey"),
        new,
        ["c_custkey"],
    )
    return out.select(
        "c_custkey",
        "status",
        F.array_join("changed_cols", ",").alias("changed_cols"),
    ).orderBy("c_custkey")


Q_TABLE_DIFF_SQL = """
WITH old AS (
  SELECT c_custkey, c_mktsegment, c_name, c_nationkey FROM customer
),
new AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 4 = 0 THEN c_mktsegment || '_X'
              ELSE c_mktsegment END AS c_mktsegment,
         CASE WHEN c_custkey % 9 = 0 THEN 'RENAMED' ELSE c_name END AS c_name,
         c_nationkey
  FROM customer WHERE c_custkey % 13 <> 0
  UNION ALL
  SELECT c_custkey + 4000000, 'NEWSEG', 'NEWNAME', c_nationkey
  FROM customer WHERE c_custkey % 50 = 0
),
j AS (
  SELECT coalesce(o.c_custkey, n.c_custkey) AS k,
         (o.c_custkey IS NOT NULL) AS in_o, (n.c_custkey IS NOT NULL) AS in_n,
         list_filter([
           CASE WHEN o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
                THEN 'c_mktsegment' END,
           CASE WHEN o.c_name IS DISTINCT FROM n.c_name THEN 'c_name' END,
           CASE WHEN o.c_nationkey IS DISTINCT FROM n.c_nationkey
                THEN 'c_nationkey' END
         ], x -> x IS NOT NULL) AS ch
  FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
)
SELECT k AS c_custkey,
       CASE WHEN in_o AND NOT in_n THEN 'removed'
            WHEN in_n AND NOT in_o THEN 'added'
            WHEN len(ch) > 0 THEN 'changed'
            ELSE 'unchanged' END AS status,
       CASE WHEN in_o AND in_n THEN coalesce(array_to_string(ch, ','), '')
            ELSE '' END AS changed_cols
FROM j
ORDER BY c_custkey
"""


QUERIES.update(
    {
        "row_hash_customer": q_row_hash_customer,
        "validate_split": q_validate_split,
        "dlq_error_records": q_dlq_error_records,
        "grain_audit": q_grain_audit,
        "dup_grain_examples": q_dup_grain_examples,
        "audit_contract": q_audit_contract,
        "threshold_stats": q_threshold_stats,
        "merge_upsert": q_merge_upsert,
        "scd2_merge": q_scd2_merge,
        "cdc_apply": q_cdc_apply,
        "profile_orders": q_profile_orders,
        "table_diff": q_table_diff,
        "publish_counts": q_publish_counts,
        "file_loaded_check": q_file_loaded_check,
        "dlq_cleanup": q_dlq_cleanup,
        "cleaners": q_cleaners,
        "excel_serial_dates": q_excel_serial_dates,
        "json_extract": q_json_extract,
        "file_row_number": q_file_row_number,
    }
)


ORACLES.update(
    {
        "row_hash_customer": Q_ROW_HASH_CUSTOMER_SQL,
        "validate_split": Q_VALIDATE_SPLIT_SQL,
        "dlq_error_records": Q_DLQ_ERROR_RECORDS_SQL,
        "grain_audit": Q_GRAIN_AUDIT_SQL,
        "dup_grain_examples": Q_DUP_GRAIN_EXAMPLES_SQL,
        "audit_contract": Q_AUDIT_CONTRACT_SQL,
        "threshold_stats": Q_THRESHOLD_STATS_SQL,
        "merge_upsert": Q_MERGE_UPSERT_SQL,
        "scd2_merge": Q_SCD2_MERGE_SQL,
        "cdc_apply": Q_CDC_APPLY_SQL,
        "profile_orders": Q_PROFILE_ORDERS_SQL,
        "table_diff": Q_TABLE_DIFF_SQL,
        "publish_counts": Q_PUBLISH_COUNTS_SQL,
        "file_loaded_check": Q_FILE_LOADED_CHECK_SQL,
        "dlq_cleanup": Q_DLQ_CLEANUP_SQL,
        "cleaners": Q_CLEANERS_SQL,
        "excel_serial_dates": Q_EXCEL_SERIAL_DATES_SQL,
        "json_extract": Q_JSON_EXTRACT_SQL,
        "file_row_number": Q_FILE_ROW_NUMBER_SQL,
    }
)


def q_streaming_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming CDC run (streaming/ingest.py:cdc_stream): the SAME
    change feed as ``cdc_apply``, split into three micro-batch files fed
    one per trigger — mid seqs (150/200) first, then the deletes and the
    equal-seq tie (210/220/300), then the STALE batch (seq 50) arriving
    LAST. Tombstoned incremental application must land on exactly the
    one-shot batch answer (the stale batch must lose to already-applied
    higher-seq deletes — the resurrection case plain delete-and-forget
    state gets wrong), so this row replays the IDENTICAL DuckDB oracle
    as ``cdc_apply``. The equal-seq U/D tie pair ships inside one batch:
    within-batch ties are ordered (delete wins); across arrival
    boundaries no CDC consumer can order equal seqs."""
    import tempfile

    from etl_file_loader_spark.streaming.ingest import cdc_stream
    from etl_file_loader_spark.suite._shared import _ensure_session_confs

    _ensure_session_confs(spark)
    target, changes = _cdc_fixture(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="efls_cdc_stream_")
    chg_dir = f"{root}/changes"
    buckets = [
        changes.filter(F.col("seq").isin(150, 200)),
        changes.filter(F.col("seq").isin(210, 220, 300)),
        changes.filter(F.col("seq") == 50),
    ]
    for i, b in enumerate(buckets):
        b.coalesce(1).write.parquet(f"{chg_dir}/b{i}")
    target.withColumn("_deleted", F.lit(0)).write.parquet(
        f"{root}/state/state_v0"
    )
    stream = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chg_dir)
    )
    q = cdc_stream(
        stream,
        f"{root}/state",
        f"{root}/ck",
        ["c_custkey"],
        _CDC_TRACKED,
        "seq",
    )
    q.awaitTermination()
    from etl_file_loader_spark.fs import FS

    import re

    fs = FS(spark)
    v = max(
        int(m.group(1))
        for name in fs.list_names(f"{root}/state")
        if (m := re.fullmatch(r"state_v(\d+)", name))
    )
    final = spark.read.parquet(f"{root}/state/state_v{v}")
    return (
        final.filter(F.col("_deleted") == 0)
        .drop("_deleted")
        .orderBy("c_custkey")
    )


QUERIES.update({"streaming_cdc_apply": q_streaming_cdc_apply})
# the streaming run must land on the batch answer: identical oracle
ORACLES.update({"streaming_cdc_apply": Q_CDC_APPLY_SQL})
