"""End-to-end CSV pipeline behavior matrix (reference src/tests/test_csv.py)."""

import gzip
import json

import pytest
from pyspark.sql import functions as F

from etl_file_loader_spark.exceptions import (
    AuditFailedError,
    DuplicateFileError,
    GrainValidationError,
    MissingColumnsError,
    MissingHeaderError,
    ValidationThresholdExceededError,
)
from etl_file_loader_spark.plans.pipeline import DLQ_TABLE, PipelineRunner
from tests.sources_fixtures import (
    CSV_BELOW_THRESHOLD,
    CSV_BLANK_HEADER,
    CSV_DUPLICATES,
    CSV_FAIL_AUDIT,
    CSV_GOOD,
    CSV_MISSING_COLUMNS,
    CSV_VALIDATION_ERROR,
    transactions_source,
)


def write_file(tmp_path, name, content):
    p = tmp_path / name
    if name.endswith(".gz"):
        p.write_bytes(gzip.compress(content.encode()))
    else:
        p.write_text(content)
    return str(p)


def run(spark, warehouse, tmp_path, content, name="sales_2024.csv", **cfg):
    path = write_file(tmp_path, name, content)
    return PipelineRunner(
        spark, warehouse, transactions_source(**cfg), path
    ).run()


def test_happy_path(spark, warehouse, tmp_path):
    result = run(spark, warehouse, tmp_path, CSV_GOOD)
    assert result.success
    assert result.counts.inserts == 3 and result.counts.updates == 0

    target = warehouse.read_table("transactions")
    assert target.count() == 3
    row = target.filter(F.col("transaction_id") == "TXN001").collect()[0]
    assert row["quantity"] == 2
    assert row["unit_price"] == 10.50
    assert str(row["sale_date"]) == "2024-01-05"
    assert row["source_filename"] == "sales_2024.csv"
    assert row["etl_row_hash"] is not None
    assert row["etl_created_at"] is not None
    assert row["etl_updated_at"] is None


def test_idempotent_reload_rejected(spark, warehouse, tmp_path):
    run(spark, warehouse, tmp_path, CSV_GOOD)
    with pytest.raises(DuplicateFileError):
        run(spark, warehouse, tmp_path, CSV_GOOD)


def test_upsert_update_path(spark, warehouse, tmp_path):
    run(spark, warehouse, tmp_path, CSV_GOOD, name="sales_a.csv")
    changed = CSV_GOOD.replace("TXN001,CUST01,SKU-1,2,10.50", "TXN001,CUST01,SKU-1,9,10.50")
    result = run(spark, warehouse, tmp_path, changed, name="sales_b.csv")
    assert result.counts.inserts == 0
    assert result.counts.updates == 1
    assert result.counts.unchanged == 2
    target = warehouse.read_table("transactions")
    row = target.filter(F.col("transaction_id") == "TXN001").collect()[0]
    assert row["quantity"] == 9
    assert row["etl_updated_at"] is not None
    unchanged = target.filter(F.col("transaction_id") == "TXN002").collect()[0]
    assert unchanged["etl_updated_at"] is None
    assert unchanged["source_filename"] == "sales_a.csv"


def test_duplicate_grain(spark, warehouse, tmp_path):
    with pytest.raises(GrainValidationError) as exc:
        run(spark, warehouse, tmp_path, CSV_DUPLICATES)
    assert exc.value.examples[0]["transaction_id"] == "TXN001"
    assert exc.value.examples[0]["duplicate_count"] == 2


def test_validation_error_to_dlq(spark, warehouse, tmp_path):
    with pytest.raises(ValidationThresholdExceededError):
        run(spark, warehouse, tmp_path, CSV_VALIDATION_ERROR)
    dlq = warehouse.read_table(DLQ_TABLE).collect()
    assert len(dlq) == 1
    rec = dlq[0]
    assert rec["file_row_number"] == 2  # 1-based file row, header = 1
    errors = json.loads(rec["validation_errors"])
    assert errors[0]["column_name"] == "unit_price"
    assert errors[0]["column_value"] == "asdf"
    assert errors[0]["error_type"] == "cast_error"
    payload = json.loads(rec["file_record_data"])
    assert "transaction_id" in payload  # grain always included
    assert "unit_price" in payload


def test_below_threshold_succeeds(spark, warehouse, tmp_path):
    result = run(
        spark, warehouse, tmp_path, CSV_BELOW_THRESHOLD,
        validation_error_threshold=0.15,
    )
    assert result.success
    assert warehouse.read_table("transactions").count() == 9
    assert warehouse.read_table(DLQ_TABLE).count() == 1


def test_missing_columns(spark, warehouse, tmp_path):
    with pytest.raises(MissingColumnsError) as exc:
        run(spark, warehouse, tmp_path, CSV_MISSING_COLUMNS)
    assert exc.value.missing == ["sale_date"]


def test_blank_header(spark, warehouse, tmp_path):
    with pytest.raises(MissingHeaderError):
        run(spark, warehouse, tmp_path, CSV_BLANK_HEADER)


def test_empty_file(spark, warehouse, tmp_path):
    with pytest.raises(MissingHeaderError):
        run(spark, warehouse, tmp_path, "")


def test_audit_failure(spark, warehouse, tmp_path):
    with pytest.raises(AuditFailedError) as exc:
        run(spark, warehouse, tmp_path, CSV_FAIL_AUDIT)
    assert exc.value.failed_audits == ["unit_price_positive"]


def test_gzip_roundtrip(spark, warehouse, tmp_path):
    result = run(spark, warehouse, tmp_path, CSV_GOOD, name="sales_2024.csv.gz")
    assert result.success
    assert warehouse.read_table("transactions").count() == 3


def test_dlq_cleanup_on_reprocess(spark, warehouse, tmp_path):
    with pytest.raises(ValidationThresholdExceededError):
        run(spark, warehouse, tmp_path, CSV_VALIDATION_ERROR)
    assert warehouse.read_table(DLQ_TABLE).count() == 1
    # reprocess same filename with still-bad data below threshold:
    # old DLQ rows for this file (earlier log id) must be removed
    result = run(
        spark, warehouse, tmp_path, CSV_VALIDATION_ERROR,
        validation_error_threshold=0.9,
    )
    assert result.success
    dlq = warehouse.read_table(DLQ_TABLE).collect()
    assert len(dlq) == 1  # only the new run's row remains


def test_on_stage_hook_streams_stage_completions(spark, warehouse, tmp_path):
    """The run-log on_stage hook (CLI --stages) fires once per completed
    stage, in execution order, with success + timing fields populated."""
    seen = []
    path = write_file(tmp_path, "sales_2024.csv", CSV_GOOD)
    result = PipelineRunner(
        spark, warehouse, transactions_source(), path, on_stage=seen.append
    ).run()
    assert result.success
    stages = [e["stage"] for e in seen]
    assert stages[:3] == ["check_if_processed", "read_data", "validate_data"]
    assert "publish_data" in stages and "cleanup_dlq_records" in stages
    assert all(e["success"] for e in seen)
    assert all(e["ended_at"] >= e["started_at"] for e in seen)
    publish = next(e for e in seen if e["stage"] == "publish_data")
    assert publish["row_count"] == 3
