"""CLI surface: python -m etl_file_loader_spark process (--json contract).

The --json object is the automation analogue of the reference CLI's rich
tables (reference src/cli/main.py:27-129): one stdout JSON document with the
results summary, per-file outcomes (incl. publish counts), and per-stage
timings from the run-log hook.
"""

from __future__ import annotations

import json

import pytest

from etl_file_loader_spark import __main__ as cli
from tests.sources_fixtures import CSV_HEADER, transactions_source

SOURCES = [transactions_source()]


@pytest.fixture
def cli_env(spark, tmp_path, monkeypatch):
    """Route the CLI at the shared test session (and keep it alive)."""
    monkeypatch.setattr(cli, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    monkeypatch.setattr(
        cli, "load_sources", lambda spec: SOURCES if spec == "test:SOURCES" else None
    )
    drop = tmp_path / "drop"
    drop.mkdir()
    rows = "\n".join(
        f"TX{i},C1,S1,1,2.50,2.50,2024-01-01,rep" for i in range(5)
    )
    (drop / "sales_1.csv").write_text(CSV_HEADER + "\n" + rows + "\n")
    (drop / "unmatched.dat").write_text("nope\n")
    return drop


def test_cli_json_output_schema(cli_env, tmp_path, capsys):
    rc = cli.main(
        [
            "process",
            "--sources", "test:SOURCES",
            "--warehouse", str(tmp_path / "wh"),
            "--directory", str(cli_env),
            "--max-workers", "1",
            "--no-progress",
            "--json",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out) == {"summary", "files", "stages"}

    s = out["summary"]
    assert s["total"] == 2 and s["succeeded"] == 1 and s["no_source"] == 1
    assert s["failed"] == 0 and s["errors"] == {}

    files = {f["filename"]: f for f in out["files"]}
    ok = files["sales_1.csv"]
    assert ok["success"] is True and ok["error_type"] is None
    assert ok["counts"] == {"inserts": 5, "updates": 0, "unchanged": 0}
    skipped = files["unmatched.dat"]
    assert skipped["success"] is False
    assert skipped["error_type"] == "NoSourceMatchError"
    assert skipped["counts"] is None

    # per-stage timings: the full pipeline for the good file, every entry
    # carrying the timing fields
    stages = [e for e in out["stages"] if e["file"] == "sales_1.csv"]
    names = {e["stage"] for e in stages}
    assert {"read_data", "validate_data", "publish_data"} <= names
    for e in out["stages"]:
        assert set(e) == {"file", "stage", "success", "rows", "seconds", "started_at"}
        assert e["seconds"] >= 0 and e["success"] is True


def test_cli_plain_output_unchanged(cli_env, tmp_path, capsys):
    rc = cli.main(
        [
            "process",
            "--sources", "test:SOURCES",
            "--warehouse", str(tmp_path / "wh"),
            "--directory", str(cli_env),
            "--max-workers", "1",
            "--no-progress",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # bare summary object, exactly as before
    assert set(out) == {"total", "succeeded", "failed", "no_source", "errors"}
