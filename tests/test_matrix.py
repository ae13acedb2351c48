"""Format x failure-mode matrix (reference test corpus shape): every source
format hits duplicate-grain, audit-failure, and validation-error identically,
and each handled error notifies stakeholders."""

import json

import pytest
from pyspark.sql import types as T

from etl_file_loader_spark.config import FieldSpec, SourceConfig
from etl_file_loader_spark.exceptions import (
    AuditFailedError,
    GrainValidationError,
    ValidationThresholdExceededError,
)
from etl_file_loader_spark.notify import CallableNotifier
from etl_file_loader_spark.plans.pipeline import PipelineRunner, Processor
from etl_file_loader_spark.registry import SourceRegistry
from tests.xlsx_helper import write_xlsx

AUDIT = (
    "SELECT CASE WHEN SUM(CASE WHEN amount > 0 THEN 1 ELSE 0 END) = COUNT(*) "
    "THEN 1 ELSE 0 END AS amount_positive FROM {table}"
)


def source_for(fmt: str) -> SourceConfig:
    return SourceConfig(
        name=f"m_{fmt}",
        file_pattern=f"m_*.{ 'xlsx' if fmt == 'excel' else fmt }",
        file_format=fmt,
        fields=[
            FieldSpec("rec_id", T.StringType(), nullable=False),
            FieldSpec("amount", T.DoubleType(), nullable=False),
        ],
        grain=["rec_id"],
        audit_query=AUDIT,
        array_path="entries.item" if fmt == "json" else None,
    )


def write_file(tmp_path, fmt: str, records: list[dict]) -> str:
    if fmt == "csv":
        p = tmp_path / "m_1.csv"
        lines = ["rec_id,amount"] + [f"{r['rec_id']},{r['amount']}" for r in records]
        p.write_text("\n".join(lines) + "\n")
    elif fmt == "json":
        p = tmp_path / "m_1.json"
        p.write_text(json.dumps({"entries": {"item": records}}))
    elif fmt == "excel":
        p = tmp_path / "m_1.xlsx"
        rows = [["rec_id", "amount"]] + [[r["rec_id"], r["amount"]] for r in records]
        write_xlsx(str(p), {"Sheet1": rows})
    elif fmt == "parquet":
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = tmp_path / "m_1.parquet"
        pq.write_table(
            pa.table(
                {
                    "rec_id": [str(r["rec_id"]) for r in records],
                    # keep raw strings so bad cells survive into validation
                    "amount": [str(r["amount"]) for r in records],
                }
            ),
            str(p),
        )
    return str(p)


FORMATS = ["csv", "json", "excel", "parquet"]

GOOD = [{"rec_id": "A", "amount": 10.5}, {"rec_id": "B", "amount": 2.0}]


@pytest.mark.parametrize("fmt", FORMATS)
def test_happy_path_all_formats(spark, warehouse, tmp_path, fmt):
    path = write_file(tmp_path, fmt, GOOD)
    result = PipelineRunner(spark, warehouse, source_for(fmt), path).run()
    assert result.success and result.counts.inserts == 2
    rows = {r["rec_id"]: r["amount"] for r in warehouse.read_table(f"m_{fmt}").collect()}
    assert rows == {"A": 10.5, "B": 2.0}


@pytest.mark.parametrize("fmt", FORMATS)
def test_duplicate_grain_all_formats(spark, warehouse, tmp_path, fmt):
    path = write_file(tmp_path, fmt, GOOD + [{"rec_id": "A", "amount": 3.0}])
    with pytest.raises(GrainValidationError):
        PipelineRunner(spark, warehouse, source_for(fmt), path).run()


@pytest.mark.parametrize("fmt", FORMATS)
def test_fail_audit_all_formats(spark, warehouse, tmp_path, fmt):
    path = write_file(tmp_path, fmt, GOOD + [{"rec_id": "C", "amount": -1.0}])
    with pytest.raises(AuditFailedError) as exc:
        PipelineRunner(spark, warehouse, source_for(fmt), path).run()
    assert exc.value.failed_audits == ["amount_positive"]


@pytest.mark.parametrize("fmt", ["csv", "excel", "parquet"])
def test_validation_error_all_formats(spark, warehouse, tmp_path, fmt):
    # json omitted: a bad literal arrives as a native-typed field there
    path = write_file(tmp_path, fmt, GOOD + [{"rec_id": "C", "amount": "oops"}])
    with pytest.raises(ValidationThresholdExceededError):
        PipelineRunner(spark, warehouse, source_for(fmt), path).run()
    dlq = warehouse.read_table("file_load_dlq").collect()
    assert len(dlq) == 1
    assert "oops" in dlq[0]["validation_errors"]


@pytest.mark.parametrize(
    "records,expected_error",
    [
        (GOOD + [{"rec_id": "A", "amount": 1.0}], "GrainValidationError"),
        (GOOD + [{"rec_id": "C", "amount": -5.0}], "AuditFailedError"),
        (GOOD + [{"rec_id": "C", "amount": "bad"}], "ValidationThresholdExceededError"),
    ],
)
def test_notification_per_error_type(spark, warehouse, tmp_path, records, expected_error):
    drop = tmp_path / "drop"
    drop.mkdir()
    write_file(drop, "csv", records)
    got = []
    cfg = source_for("csv")
    cfg.notification_emails = ["ops@example.com"]
    Processor(
        spark, warehouse, SourceRegistry([cfg]), notifier=CallableNotifier(got.append)
    ).process_directory(str(drop))
    kinds = {n.kind for n in got}
    assert "file_error" in kinds
    assert expected_error in got[0].subject
