"""Hadoop-FS path abstraction: drop/archive/quarantine on `file:/` URIs.

Exercises the SAME code path an object-store deployment uses (s3a://,
abfss://, gs:// — Path.getFileSystem dispatches on scheme), with the local
filesystem standing in. Reference parity: aws_file_helper.py:59-91 /
factory.py:18-28 (per-cloud list/archive/delete helpers).
"""

from __future__ import annotations

import gzip
from pathlib import Path

from pyspark.sql import types as T

from etl_file_loader_spark import fs as fsmod
from etl_file_loader_spark.config import FieldSpec, SourceConfig
from etl_file_loader_spark.plans.pipeline import Processor
from etl_file_loader_spark.plans.warehouse import Warehouse
from etl_file_loader_spark.registry import SourceRegistry


def _uri(p: Path) -> str:
    return p.as_uri().replace("file:///", "file:/")


def _cfg():
    return SourceConfig(
        name="sales",
        file_pattern="sales_*.csv",
        file_format="csv",
        fields=[
            FieldSpec("id", T.LongType(), nullable=False),
            FieldSpec("amount", T.DoubleType()),
        ],
        grain=["id"],
    )


def test_fs_helpers_on_uris(spark, tmp_path):
    hfs = fsmod.FS(spark)
    d = tmp_path / "fsops"
    hfs.mkdirs(_uri(tmp_path) + "/fsops")
    assert d.is_dir()
    (d / "a.txt").write_text("hello\nworld\n")
    (d / ".hidden").write_text("x")

    files = hfs.list_files(_uri(d))
    assert len(files) == 1 and files[0].endswith("a.txt") and files[0].startswith("file:")
    assert hfs.exists(files[0])

    hfs.copy(files[0], _uri(d) + "/b.txt")
    assert (d / "b.txt").read_text() == "hello\nworld\n"
    hfs.move(_uri(d) + "/b.txt", _uri(d) + "/c.txt")
    assert not (d / "b.txt").exists() and (d / "c.txt").exists()
    hfs.delete(_uri(d) + "/c.txt")
    assert not (d / "c.txt").exists()

    assert hfs.read_head(files[0], 5) == b"hello"
    assert hfs.read_first_line(files[0]) == "hello"


def test_read_first_line_gzip_uri(spark, tmp_path):
    p = tmp_path / "data.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("id,amount\n1,2.0\n")
    assert fsmod.FS(spark).read_first_line(_uri(p)) == "id,amount"


def test_pipeline_end_to_end_on_file_uris(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "sales_1.csv").write_text("id,amount\n1,10.0\n2,20.0\n")
    with gzip.open(drop / "sales_2.csv.gz", "wt") as f:
        f.write("id,amount\n3,30.0\n")
    (drop / "mystery.bin").write_text("???")

    wh = Warehouse(spark, str(tmp_path / "wh"))
    proc = Processor(
        spark,
        wh,
        SourceRegistry([_cfg()]),
        archive_dir=_uri(tmp_path) + "/archive",
        duplicate_dir=_uri(tmp_path) + "/dupes",
    )
    results = proc.process_directory(_uri(drop))
    summary = proc.results_summary()
    assert summary["succeeded"] == 2 and summary["no_source"] == 1

    rows = {r["id"]: r["amount"] for r in wh.read_table("sales").collect()}
    assert rows == {1: 10.0, 2: 20.0, 3: 30.0}
    # every drop file (matched or not) landed in the archive
    archived = {p.name for p in (tmp_path / "archive").iterdir()}
    assert archived == {"sales_1.csv", "sales_2.csv.gz", "mystery.bin"}
    # source filenames recorded as the bare names, not URIs
    names = {
        r["source_filename"]
        for r in wh.read_table("sales").select("source_filename").collect()
    }
    assert names == {"sales_1.csv", "sales_2.csv.gz"}

    # reprocessing quarantines the duplicates via the URI code path (move)
    proc2 = Processor(
        spark,
        wh,
        SourceRegistry([_cfg()]),
        duplicate_dir=_uri(tmp_path) + "/dupes",
    )
    results2 = proc2.process_directory(_uri(drop))
    dup = [r for r in results2 if r.error_type == "DuplicateFileError"]
    assert len(dup) == 2
    quarantined = {p.name for p in (tmp_path / "dupes").iterdir()}
    assert quarantined == {"sales_1.csv", "sales_2.csv.gz"}
    assert not (drop / "sales_1.csv").exists()  # moved, not copied
