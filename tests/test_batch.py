"""Batch-union ingestion (one job over many files) + warehouse compaction."""

from pyspark.sql import functions as F

from etl_file_loader_spark.plans.batch import batch_ingest
from tests.sources_fixtures import CSV_HEADER, transactions_source


def write(drop, name, rows):
    (drop / name).write_text(CSV_HEADER + "\n" + "\n".join(rows) + "\n")
    return str(drop / name)


def test_batch_ingest_multi_file(spark, warehouse, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    paths = [
        write(drop, "sales_a.csv", [
            "T1,C1,S1,1,1.00,1.00,2024-01-01,rep",
            "T2,C1,S1,1,2.00,2.00,2024-01-01,rep",
        ]),
        # same grain T2 with different value: later filename must win
        write(drop, "sales_b.csv", [
            "T2,C1,S1,9,2.00,2.00,2024-01-02,rep",
            "T3,C1,S1,1,3.00,3.00,2024-01-02,rep",
        ]),
        # a file over threshold: excluded from publish, rows in DLQ
        write(drop, "sales_c.csv", [
            "T4,C1,S1,oops,4.00,4.00,2024-01-03,rep",
        ]),
    ]
    result = batch_ingest(spark, warehouse, transactions_source(), paths)
    assert result.files_published == ["sales_a.csv", "sales_b.csv"]
    assert list(result.files_rejected) == ["sales_c.csv"]
    assert result.dlq_rows == 1
    target = warehouse.read_table("transactions")
    rows = {r["transaction_id"]: r for r in target.collect()}
    assert set(rows) == {"T1", "T2", "T3"}
    assert rows["T2"]["quantity"] == 9  # latest filename won the grain
    assert rows["T2"]["source_filename"] == "sales_b.csv"
    dlq = warehouse.read_table("file_load_dlq").collect()
    assert dlq[0]["source_filename"] == "sales_c.csv"
    assert result.inserts == 3


def test_batch_ingest_then_incremental(spark, warehouse, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    p1 = write(drop, "sales_a.csv", ["T1,C1,S1,1,1.00,1.00,2024-01-01,rep"])
    batch_ingest(spark, warehouse, transactions_source(), [p1])
    p2 = write(drop, "sales_b.csv", [
        "T1,C1,S1,7,1.00,1.00,2024-01-01,rep",  # update
        "T9,C1,S1,1,9.00,9.00,2024-01-09,rep",  # insert
    ])
    result = batch_ingest(spark, warehouse, transactions_source(), [p2])
    assert result.inserts == 1 and result.updates == 1
    target = warehouse.read_table("transactions")
    t1 = target.filter(F.col("transaction_id") == "T1").collect()[0]
    assert t1["quantity"] == 7 and t1["etl_updated_at"] is not None


def test_warehouse_compact(spark, warehouse):
    for i in range(5):
        warehouse.append("logs", spark.createDataFrame([(i,)], "id long"))
    before = len(warehouse.read_table("logs").inputFiles())
    assert before >= 5
    warehouse.compact("logs", target_files=1)
    after = warehouse.read_table("logs")
    assert len(after.inputFiles()) == 1
    assert after.count() == 5
