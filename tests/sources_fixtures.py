"""Test source configs + file payloads mirroring the reference test corpus
(FIXTURES.md; reference src/tests/fixtures/sources.py, csv_files.py)."""

from pyspark.sql import types as T

from etl_file_loader_spark.config import FieldSpec, SourceConfig

TRANSACTIONS_AUDIT = """
SELECT CASE WHEN SUM(CASE WHEN unit_price > 0 THEN 1 ELSE 0 END) = COUNT(*)
            THEN 1 ELSE 0 END AS unit_price_positive
FROM {table}
"""


def transactions_source(**overrides) -> SourceConfig:
    defaults = dict(
        name="transactions",
        file_pattern="sales_*.csv",
        file_format="csv",
        fields=[
            FieldSpec("transaction_id", T.StringType(), nullable=False, max_length=100),
            FieldSpec("customer_id", T.StringType(), nullable=False, max_length=100),
            FieldSpec("product_sku", T.StringType(), nullable=False, max_length=100),
            FieldSpec("quantity", T.LongType(), nullable=False),
            FieldSpec("unit_price", T.DoubleType(), nullable=False),
            FieldSpec("total_amount", T.DoubleType(), nullable=False),
            FieldSpec("sale_date", T.DateType(), nullable=False),
            FieldSpec("sales_rep", T.StringType(), nullable=False, max_length=100),
        ],
        grain=["transaction_id"],
        audit_query=TRANSACTIONS_AUDIT,
        validation_error_threshold=0.0,
    )
    defaults.update(overrides)
    return SourceConfig(**defaults)


CSV_HEADER = "transaction_id,customer_id,product_sku,quantity,unit_price,total_amount,sale_date,sales_rep"

CSV_GOOD = f"""{CSV_HEADER}
TXN001,CUST01,SKU-1,2,10.50,21.00,2024-01-05,alice
TXN002,CUST02,SKU-2,1,5.25,5.25,2024-01-06,bob
TXN003,CUST01,SKU-3,4,2.00,8.00,2024-01-07,alice
"""

CSV_DUPLICATES = f"""{CSV_HEADER}
TXN001,CUST01,SKU-1,2,10.50,21.00,2024-01-05,alice
TXN001,CUST02,SKU-2,1,5.25,5.25,2024-01-06,bob
"""

CSV_VALIDATION_ERROR = f"""{CSV_HEADER}
TXN001,CUST01,SKU-1,2,asdf,21.00,2024-01-05,alice
TXN002,CUST02,SKU-2,1,5.25,5.25,2024-01-06,bob
"""

CSV_MISSING_COLUMNS = """transaction_id,customer_id,product_sku,quantity,unit_price,total_amount,sales_rep
TXN001,CUST01,SKU-1,2,10.50,21.00,alice
"""

CSV_FAIL_AUDIT = f"""{CSV_HEADER}
TXN001,CUST01,SKU-1,2,-10.50,21.00,2024-01-05,alice
TXN002,CUST02,SKU-2,1,5.25,5.25,2024-01-06,bob
"""

CSV_BLANK_HEADER = """,,,,,,,
TXN001,CUST01,SKU-1,2,10.50,21.00,2024-01-05,alice
"""

# 1 bad row out of 10 -> error_rate 0.10 < threshold 0.15
CSV_BELOW_THRESHOLD = CSV_HEADER + "\n" + "\n".join(
    f"TXN{i:03d},CUST01,SKU-1,1,{'asdf' if i == 3 else '1.00'},1.00,2024-01-05,alice"
    for i in range(1, 11)
) + "\n"
