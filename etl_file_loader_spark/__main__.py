"""CLI driver (reference src/cli/main.py:27-129 — `./fileloader process`).

    python -m etl_file_loader_spark process \
        --sources my_sources:SOURCES --warehouse ./warehouse \
        (--directory drop_dir | --file one_file.csv) [--archive archived/]

``--sources`` is ``module:attr`` resolving to a list[SourceConfig].
"""

from __future__ import annotations

import argparse
import importlib
import json
import sys
import threading
import time

from etl_file_loader_spark.plans.pipeline import Processor
from etl_file_loader_spark.plans.warehouse import Warehouse
from etl_file_loader_spark.registry import SourceRegistry
from etl_file_loader_spark.session import get_spark


def load_sources(spec: str):
    mod_name, _, attr = spec.partition(":")
    mod = importlib.import_module(mod_name)
    return getattr(mod, attr or "SOURCES")


def _run_with_progress(processor: Processor, directory: str, max_workers) -> None:
    """Directory processing with a live progress line on stderr.

    Same design as the reference's rich progress (cli/main.py:106-127): the
    work runs in a thread while the main thread polls ``processor.results``
    — per-file completion is driver-side state, so no Spark listener wiring
    is needed. Rendering is stdlib (this container has no ``rich``): a
    carriage-return bar with counts and elapsed time.
    """
    from etl_file_loader_spark.fs import FS

    total = len(FS(processor.spark).list_files(directory))
    done = threading.Event()

    def work() -> None:
        try:
            processor.process_files_in_parallel(directory, max_workers=max_workers)
        finally:
            done.set()

    t = threading.Thread(target=work, daemon=True)
    start = time.monotonic()
    t.start()
    while not done.is_set() or len(processor.results) < total:
        n = min(len(processor.results), total)
        width = 24
        filled = int(width * n / total) if total else width
        bar = "#" * filled + "-" * (width - filled)
        sys.stderr.write(
            f"\r[{bar}] {n}/{total} files  {time.monotonic() - start:6.1f}s"
        )
        sys.stderr.flush()
        if done.is_set():
            break
        time.sleep(0.1)
    sys.stderr.write(
        f"\r[{'#' * 24}] {len(processor.results)}/{total} files  "
        f"{time.monotonic() - start:6.1f}s  done\n"
    )
    sys.stderr.flush()
    t.join()


def _print_stage(entry: dict) -> None:
    """One stderr line per completed pipeline stage (reference
    cli/main.py:106-127 polls per-file state; the run-log hook gives us the
    finer per-stage grain for free)."""
    dt = (entry["ended_at"] - entry["started_at"]).total_seconds()
    rows = f"  {entry['row_count']} rows" if entry["row_count"] is not None else ""
    status = "ok" if entry["success"] else "FAIL"
    sys.stderr.write(
        f"{entry['source_filename']}: {entry['stage']} {status}{rows}  {dt:.2f}s\n"
    )
    sys.stderr.flush()


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="etl_file_loader_spark")
    sub = parser.add_subparsers(dest="command", required=True)
    p = sub.add_parser("process", help="process a drop directory or one file")
    p.add_argument("--sources", required=True, help="module:attr -> list[SourceConfig]")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--directory")
    p.add_argument("--file")
    p.add_argument("--archive")
    p.add_argument("--duplicates", help="directory already-loaded files are moved to")
    p.add_argument("--delete-source", action="store_true", help="remove drop files after processing (reference behavior)")
    p.add_argument("--cpus", type=int, default=None)
    p.add_argument(
        "--max-workers", type=int, default=None,
        help="thread-pool width for directory mode (reference processes "
        "directories in parallel by default; 1 forces sequential)",
    )
    p.add_argument(
        "--progress", action=argparse.BooleanOptionalAction, default=None,
        help="live per-file progress bar on stderr (default: on when stderr "
        "is a TTY)",
    )
    p.add_argument(
        "--stages", action="store_true",
        help="stream per-file STAGE completions (read/validate/write/audit/"
        "publish...) to stderr as they finish — the run-log, live "
        "(disables the progress bar; bar + interleaved lines don't mix)",
    )
    p.add_argument(
        "--json", action="store_true", dest="json_out",
        help="emit ONE machine-readable JSON object on stdout: results "
        "summary + per-file outcomes + per-stage timings (the reference "
        "CLI's rich tables, for automation)",
    )
    args = parser.parse_args(argv)

    if bool(args.directory) == bool(args.file):
        parser.error("exactly one of --directory / --file is required")

    spark = get_spark("etl-file-loader-cli", cpus=args.cpus)
    try:
        # per-stage collection for --json (list.append is atomic, so the
        # hook is safe under the parallel-files thread pool)
        stage_log: list[dict] = []

        def _collect_stage(entry: dict) -> None:
            stage_log.append(
                {
                    "file": entry["source_filename"],
                    "stage": entry["stage"],
                    "success": entry["success"],
                    "rows": entry["row_count"],
                    "seconds": round(
                        (entry["ended_at"] - entry["started_at"]).total_seconds(), 3
                    ),
                    "started_at": entry["started_at"].isoformat(),
                }
            )
            if args.stages:
                _print_stage(entry)

        on_stage = None
        if args.json_out:
            on_stage = _collect_stage
        elif args.stages:
            on_stage = _print_stage
        processor = Processor(
            spark=spark,
            warehouse=Warehouse(spark, args.warehouse),
            registry=SourceRegistry(list(load_sources(args.sources))),
            archive_dir=args.archive,
            duplicate_dir=args.duplicates,
            delete_source=args.delete_source,
            on_stage=on_stage,
        )
        show_progress = (
            args.progress if args.progress is not None else sys.stderr.isatty()
        ) and not args.stages
        if args.directory:
            if show_progress:
                _run_with_progress(processor, args.directory, args.max_workers)
            elif args.max_workers == 1:
                processor.process_directory(args.directory)
            else:
                processor.process_files_in_parallel(
                    args.directory, max_workers=args.max_workers
                )
        else:
            processor.process_file(args.file)
        summary = processor.results_summary()
        if args.json_out:
            out = {
                "summary": summary,
                "files": [
                    {
                        "filename": r.filename,
                        "success": r.success,
                        "error_type": r.error_type,
                        "counts": (
                            {
                                "inserts": r.counts.inserts,
                                "updates": r.counts.updates,
                                "unchanged": r.counts.unchanged,
                            }
                            if r.counts is not None
                            else None
                        ),
                    }
                    for r in processor.results
                ],
                "stages": stage_log,
            }
            print(json.dumps(out))
        else:
            print(json.dumps(summary))
        return 0 if summary["failed"] == 0 else 1
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
