"""JSON / Excel / Parquet pipeline behavior (reference test_json.py,
test_excel.py, test_parquet.py)."""

import json

import pytest
from pyspark.sql import types as T

from etl_file_loader_spark.config import FieldSpec, SourceConfig
from etl_file_loader_spark.exceptions import (
    GrainValidationError,
    MissingColumnsError,
    NoDataInFileError,
)
from etl_file_loader_spark.plans.pipeline import PipelineRunner
from tests.xlsx_helper import write_xlsx


def ledger_source(**overrides) -> SourceConfig:
    defaults = dict(
        name="ledger_entries",
        file_pattern="ledger_*.json",
        file_format="json",
        fields=[
            FieldSpec("entry_id", T.LongType(), nullable=False),
            FieldSpec("account_code", T.StringType(), nullable=False, max_length=100),
            FieldSpec("account_name", T.StringType(), nullable=False, max_length=100),
            FieldSpec("debit_amount", T.DoubleType(), nullable=True),
            FieldSpec("credit_amount", T.DoubleType(), nullable=True),
            FieldSpec("description", T.StringType(), nullable=False, max_length=500),
            FieldSpec("transaction_date", T.DateType(), nullable=False),
            FieldSpec("reference_number", T.StringType(), nullable=False, max_length=100),
        ],
        grain=["entry_id"],
        validation_error_threshold=0.0,
    )
    defaults.update(overrides)
    return SourceConfig(**defaults)


def ledger_record(i: int, **over) -> dict:
    rec = {
        "entry_id": i,
        "account_code": f"AC{i:03d}",
        "account_name": f"Account {i}",
        "debit_amount": 100.0 + i,
        "credit_amount": None,
        "description": f"entry number {i}",
        "transaction_date": "2024-02-01",
        "reference_number": f"REF-{i}",
    }
    rec.update(over)
    return rec


def write_ledger(tmp_path, records, name="ledger_2024.json"):
    p = tmp_path / name
    p.write_text(json.dumps({"entries": {"item": records}}))
    return str(p)


def test_json_happy_path(spark, warehouse, tmp_path):
    path = write_ledger(tmp_path, [ledger_record(i) for i in range(1, 6)])
    cfg = ledger_source(array_path="entries.item")
    result = PipelineRunner(spark, warehouse, cfg, path).run()
    assert result.success and result.counts.inserts == 5
    target = warehouse.read_table("ledger_entries")
    row = target.filter("entry_id = 3").collect()[0]
    assert row["debit_amount"] == 103.0
    assert row["credit_amount"] is None
    assert str(row["transaction_date"]) == "2024-02-01"


def test_json_duplicates(spark, warehouse, tmp_path):
    recs = [ledger_record(1), ledger_record(1), ledger_record(2)]
    path = write_ledger(tmp_path, recs)
    with pytest.raises(GrainValidationError):
        PipelineRunner(spark, warehouse, ledger_source(array_path="entries.item"), path).run()


def test_json_missing_columns(spark, warehouse, tmp_path):
    recs = [
        {k: v for k, v in ledger_record(i).items() if k not in ("transaction_date", "reference_number")}
        for i in range(1, 4)
    ]
    path = write_ledger(tmp_path, recs)
    with pytest.raises(MissingColumnsError) as exc:
        PipelineRunner(spark, warehouse, ledger_source(array_path="entries.item"), path).run()
    assert set(exc.value.missing) == {"transaction_date", "reference_number"}


def test_json_no_data(spark, warehouse, tmp_path):
    path = write_ledger(tmp_path, [])
    with pytest.raises(NoDataInFileError):
        PipelineRunner(spark, warehouse, ledger_source(array_path="entries.item"), path).run()


def test_json_nested_flatten(spark, warehouse, tmp_path):
    """Nested dicts flatten to parent_child lowercase columns (S4)."""
    recs = [
        {
            "entry_id": i,
            "account_code": f"AC{i}",
            "account_name": f"A{i}",
            "debit_amount": 1.0,
            "credit_amount": None,
            "description": "x",
            "transaction_date": "2024-02-01",
            "reference_number": "R",
            "meta": {"Source": {"System": f"sys{i}"}},
        }
        for i in range(1, 3)
    ]
    path = write_ledger(tmp_path, recs)
    fields = ledger_source().fields + [
        FieldSpec("meta_source_system", T.StringType(), nullable=True)
    ]
    cfg = ledger_source(array_path="entries.item", fields=fields)
    result = PipelineRunner(spark, warehouse, cfg, path).run()
    assert result.success
    rows = warehouse.read_table("ledger_entries").orderBy("entry_id").collect()
    assert rows[0]["meta_source_system"] == "sys1"


def test_json_ijson_item_path_plain_array(spark, warehouse, tmp_path):
    """ijson path semantics: 'entries.item' addresses the elements of a plain
    {"entries": [...]} array (reference read/json.py:81), not only a literal
    {"entries": {"item": [...]}} key."""
    p = tmp_path / "ledger_plain.json"
    p.write_text(json.dumps({"entries": [ledger_record(i) for i in range(1, 4)]}))
    cfg = ledger_source(array_path="entries.item")
    result = PipelineRunner(spark, warehouse, cfg, str(p)).run()
    assert result.success and result.counts.inserts == 3
    rows = warehouse.read_table("ledger_entries").orderBy("entry_id").collect()
    assert [r["entry_id"] for r in rows] == [1, 2, 3]


def test_json_array_path_without_item_suffix(spark, warehouse, tmp_path):
    """array_path pointing AT the array (no trailing .item) also works
    (reference json.py:91-99 unwraps the yielded list)."""
    p = tmp_path / "ledger_noitem.json"
    p.write_text(json.dumps({"entries": [ledger_record(1), ledger_record(2)]}))
    cfg = ledger_source(array_path="entries")
    result = PipelineRunner(spark, warehouse, cfg, str(p)).run()
    assert result.success and result.counts.inserts == 2


def test_json_list_of_dicts_index_flatten(spark, warehouse, tmp_path):
    """Lists of dicts flatten to indexed parent_N_child columns (reference
    read/json.py:51-59); ragged rows null-fill; scalar lists stringify."""
    recs = [
        {
            "entry_id": 1,
            "account_code": "AC1",
            "account_name": "A1",
            "debit_amount": 1.0,
            "credit_amount": None,
            "description": "x",
            "transaction_date": "2024-02-01",
            "reference_number": "R",
            "tags": ["a", "b"],
            "splits": [
                {"Pct": 60, "Owner": {"Name": "alice"}},
                {"Pct": 40, "Owner": {"Name": "bob"}},
            ],
        },
        {
            "entry_id": 2,
            "account_code": "AC2",
            "account_name": "A2",
            "debit_amount": 2.0,
            "credit_amount": None,
            "description": "y",
            "transaction_date": "2024-02-01",
            "reference_number": "R",
            "tags": ["c"],
            "splits": [{"Pct": 100, "Owner": {"Name": "carol"}}],
        },
    ]
    path = write_ledger(tmp_path, recs)
    fields = ledger_source().fields + [
        FieldSpec("tags", T.StringType(), nullable=True),
        FieldSpec("splits_0_pct", T.LongType(), nullable=True),
        FieldSpec("splits_0_owner_name", T.StringType(), nullable=True),
        FieldSpec("splits_1_pct", T.LongType(), nullable=True),
        FieldSpec("splits_1_owner_name", T.StringType(), nullable=True),
    ]
    cfg = ledger_source(array_path="entries.item", fields=fields)
    result = PipelineRunner(spark, warehouse, cfg, path).run()
    assert result.success and result.counts.inserts == 2
    rows = {
        r["entry_id"]: r
        for r in warehouse.read_table("ledger_entries").collect()
    }
    assert rows[1]["splits_0_pct"] == 60 and rows[1]["splits_1_owner_name"] == "bob"
    assert rows[2]["splits_0_owner_name"] == "carol"
    assert rows[2]["splits_1_pct"] is None and rows[2]["splits_1_owner_name"] is None
    assert rows[1]["tags"] == '["a","b"]' and rows[2]["tags"] == '["c"]'


EXCEL_HEADER = ["SKU", "Product Name", "Category", "Price", "Stock Qty", "Supplier", "Last Date", "Last Updated"]


def products_source(**overrides) -> SourceConfig:
    defaults = dict(
        name="products",
        file_pattern="inventory_*.xlsx",
        file_format="excel",
        fields=[
            FieldSpec("sku", T.StringType(), alias="SKU", nullable=False, max_length=100),
            FieldSpec("name", T.StringType(), alias="Product Name", nullable=False),
            FieldSpec("category", T.StringType(), alias="Category", nullable=False),
            FieldSpec("price", T.DoubleType(), alias="Price", nullable=False),
            FieldSpec("stock_quantity", T.LongType(), alias="Stock Qty", nullable=False),
            FieldSpec("supplier", T.StringType(), alias="Supplier", nullable=False),
            FieldSpec("last_date", T.DateType(), alias="Last Date", nullable=False, excel_serial=True),
            FieldSpec("last_updated", T.TimestampType(), alias="Last Updated", nullable=False, excel_serial=True),
        ],
        grain=["sku"],
        audit_query=(
            "SELECT CASE WHEN SUM(CASE WHEN price > 0 THEN 1 ELSE 0 END) = COUNT(*) "
            "THEN 1 ELSE 0 END AS price_positive FROM {table}"
        ),
    )
    defaults.update(overrides)
    return SourceConfig(**defaults)


def product_row(i: int):
    # serial 45292 = 2024-01-01; .5 fraction = 12:00:00
    return [f"SKU-{i}", f"Product {i}", "Tools", 9.99 + i, 10 * i, "Acme", 45292 + i, 45292 + i + 0.5]


def test_excel_happy_path_with_serial_dates(spark, warehouse, tmp_path):
    path = write_xlsx(
        str(tmp_path / "inventory_jan.xlsx"),
        {"Products": [EXCEL_HEADER] + [product_row(i) for i in range(1, 4)]},
    )
    result = PipelineRunner(spark, warehouse, products_source(sheet_name="Products"), path).run()
    assert result.success and result.counts.inserts == 3
    row = warehouse.read_table("products").filter("sku = 'SKU-1'").collect()[0]
    assert row["price"] == 10.99
    assert row["stock_quantity"] == 10
    assert str(row["last_date"]) == "2024-01-02"  # 45293
    assert str(row["last_updated"]) == "2024-01-02 12:00:00"


def test_excel_sheet_selection(spark, warehouse, tmp_path):
    path = write_xlsx(
        str(tmp_path / "inventory_multi.xlsx"),
        {
            "Summary": [["ignore me"]],
            "Products": [EXCEL_HEADER] + [product_row(i) for i in range(1, 3)],
        },
    )
    result = PipelineRunner(spark, warehouse, products_source(sheet_name="Products"), path).run()
    assert result.success and result.counts.inserts == 2


def test_excel_skip_rows(spark, warehouse, tmp_path):
    rows = [EXCEL_HEADER, ["junk"] + [None] * 7] + [product_row(i) for i in range(1, 3)]
    path = write_xlsx(str(tmp_path / "inventory_skip.xlsx"), {"Products": rows})
    result = PipelineRunner(
        spark, warehouse, products_source(sheet_name="Products", skip_rows=1), path
    ).run()
    assert result.success and result.counts.inserts == 2


def test_excel_missing_columns(spark, warehouse, tmp_path):
    path = write_xlsx(
        str(tmp_path / "inventory_bad.xlsx"),
        {"Products": [EXCEL_HEADER[:-1]] + [product_row(1)[:-1]]},
    )
    with pytest.raises(MissingColumnsError) as exc:
        PipelineRunner(spark, warehouse, products_source(sheet_name="Products"), path).run()
    assert exc.value.missing == ["last updated"]


def customers_parquet_source():
    return SourceConfig(
        name="customers",
        file_pattern="customers-*.parquet",
        file_format="parquet",
        fields=[
            FieldSpec("customer_id", T.StringType(), alias="Customer Id", nullable=False, max_length=50),
            FieldSpec("first_name", T.StringType(), alias="First Name", nullable=False, max_length=100),
            FieldSpec("email", T.StringType(), nullable=False, email=True, max_length=100),
        ],
        grain=["customer_id"],
    )


def test_parquet_happy_path_and_row_numbers(spark, warehouse, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "Customer Id": [f"C{i}" for i in range(1, 6)],
            "First Name": [f"Name{i}" for i in range(1, 6)],
            "email": [f"user{i}@example.com" if i != 3 else "not-an-email" for i in range(1, 6)],
        }
    )
    path = str(tmp_path / "customers-100.parquet")
    pq.write_table(table, path)
    cfg = customers_parquet_source()
    from etl_file_loader_spark.exceptions import ValidationThresholdExceededError

    with pytest.raises(ValidationThresholdExceededError):
        PipelineRunner(spark, warehouse, cfg, path).run()
    dlq = warehouse.read_table("file_load_dlq").collect()
    assert len(dlq) == 1
    assert dlq[0]["file_row_number"] == 3  # parquet rows are 1-based
    errors = json.loads(dlq[0]["validation_errors"])
    assert errors[0]["error_type"] == "email"


def test_parquet_empty_file(spark, warehouse, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table({"Customer Id": pa.array([], type=pa.string()),
                      "First Name": pa.array([], type=pa.string()),
                      "email": pa.array([], type=pa.string())})
    path = str(tmp_path / "customers-empty.parquet")
    pq.write_table(table, path)
    with pytest.raises(NoDataInFileError):
        PipelineRunner(spark, warehouse, customers_parquet_source(), path).run()


def test_excel_dates_serial_and_string_mixed(spark, warehouse, tmp_path):
    """Excel Date/Timestamp fields need no excel_serial flag: numeric cells
    convert as serials, string cells parse as dates (reference excel.py:62-84
    converts only isinstance(value, (int, float)))."""
    from tests.xlsx_helper import write_xlsx

    rows = [
        EXCEL_HEADER,
        ["SKU-1", "A", "c", "1.5", "3", "s", "45299", "45299.5"],          # serials
        ["SKU-2", "B", "c", "2.5", "4", "s", "2024-01-08", "2024-01-08 06:00:00"],  # strings
    ]
    path = write_xlsx(str(tmp_path / "inventory_mix.xlsx"), {"Sheet1": rows})
    fields = [
        FieldSpec(f.name, f.dtype, alias=f.alias, nullable=f.nullable, excel_serial=False)
        for f in products_source().fields
    ]
    cfg = products_source(fields=fields)
    result = PipelineRunner(spark, warehouse, cfg, path).run()
    assert result.success and result.counts.inserts == 2
    got = {r["sku"]: r for r in warehouse.read_table("products").collect()}
    assert str(got["SKU-1"]["last_date"]) == "2024-01-08"      # 45299 = 2024-01-08
    assert str(got["SKU-1"]["last_updated"]) == "2024-01-08 12:00:00"
    assert str(got["SKU-2"]["last_date"]) == "2024-01-08"
    assert str(got["SKU-2"]["last_updated"]) == "2024-01-08 06:00:00"


def test_excel_number_formats_and_shared_formulas(spark, warehouse, tmp_path):
    """Real-world xlsx: date-FORMATTED cells (float serial + numFmtId style)
    and shared-formula cells with cached values load through the full
    pipeline (reference read/excel.py:86-175 via openpyxl data_only=True)."""
    from tests.xlsx_helper import DateCell, FormulaCell, write_xlsx

    rows = [
        EXCEL_HEADER,
        # date-styled serials: numFmtId=14 date, numFmtId=22 datetime
        [
            "SKU-1", "A", "c", 1.5, 3, "s",
            DateCell(45299), DateCell(45299.25, with_time=True),
        ],
        # shared formula: master carries the formula + ref, follower only si;
        # both carry cached values (what Excel always writes)
        [
            "SKU-2", "B", "c",
            FormulaCell(2.5, formula="E3*0.5", shared_si=0, shared_ref="D3:D4"),
            5, "s", DateCell(45300), DateCell(45300.5, with_time=True),
        ],
        [
            "SKU-3", "C", "c",
            FormulaCell(3.5, shared_si=0),
            7, "s", DateCell(45301), DateCell(45301.75, with_time=True),
        ],
        # string-typed formula result (t="str")
        [
            "SKU-4", FormulaCell("Concat D", formula='CONCATENATE("Concat"," D")'),
            "c", 4.5, 9, "s", DateCell(45302), DateCell(45302.5, with_time=True),
        ],
    ]
    path = write_xlsx(str(tmp_path / "inventory_fmt.xlsx"), {"Sheet1": rows})
    # no excel_serial flag: the reader renders date-styled cells as ISO text,
    # the validator parses it like any date string
    fields = [
        FieldSpec(f.name, f.dtype, alias=f.alias, nullable=f.nullable, excel_serial=False)
        for f in products_source().fields
    ]
    cfg = products_source(fields=fields)
    result = PipelineRunner(spark, warehouse, cfg, path).run()
    assert result.success and result.counts.inserts == 4
    got = {r["sku"]: r for r in warehouse.read_table("products").collect()}
    assert str(got["SKU-1"]["last_date"]) == "2024-01-08"
    assert str(got["SKU-1"]["last_updated"]) == "2024-01-08 06:00:00"  # .25 day
    assert got["SKU-2"]["price"] == 2.5  # shared-formula master cached value
    assert got["SKU-3"]["price"] == 3.5  # follower cached value
    assert got["SKU-4"]["name"] == "Concat D"  # string formula result
    assert str(got["SKU-3"]["last_updated"]) == "2024-01-10 18:00:00"  # .75 day


def test_json_nested_item_path_two_levels(spark, warehouse, tmp_path):
    """Depth-2 ijson path 'batches.item.entries.item': leaf records across
    nested arrays, row numbers counting leaf items in stream order."""
    doc = {
        "batches": [
            {"entries": [ledger_record(1), ledger_record(2)]},
            {"entries": [ledger_record(3)]},
        ]
    }
    p = tmp_path / "ledger_nested.json"
    p.write_text(json.dumps(doc))
    cfg = ledger_source(array_path="batches.item.entries.item")
    result = PipelineRunner(spark, warehouse, cfg, str(p)).run()
    assert result.success and result.counts.inserts == 3
    rows = warehouse.read_table("ledger_entries").orderBy("entry_id").collect()
    assert [r["entry_id"] for r in rows] == [1, 2, 3]
