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

from etl_file_loader_spark.plans.pipeline import Processor
from etl_file_loader_spark.plans.warehouse import Warehouse
from etl_file_loader_spark.registry import SourceRegistry
from etl_file_loader_spark.session import get_spark


def load_sources(spec: str):
    mod_name, _, attr = spec.partition(":")
    mod = importlib.import_module(mod_name)
    return getattr(mod, attr or "SOURCES")


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
    args = parser.parse_args(argv)

    if bool(args.directory) == bool(args.file):
        parser.error("exactly one of --directory / --file is required")

    spark = get_spark("etl-file-loader-cli", cpus=args.cpus)
    try:
        processor = Processor(
            spark=spark,
            warehouse=Warehouse(spark, args.warehouse),
            registry=SourceRegistry(list(load_sources(args.sources))),
            archive_dir=args.archive,
            duplicate_dir=args.duplicates,
            delete_source=args.delete_source,
        )
        if args.directory:
            if args.max_workers == 1:
                processor.process_directory(args.directory)
            else:
                processor.process_files_in_parallel(
                    args.directory, max_workers=args.max_workers
                )
        else:
            processor.process_file(args.file)
        summary = processor.results_summary()
        print(json.dumps(summary))
        return 0 if summary["failed"] == 0 else 1
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
