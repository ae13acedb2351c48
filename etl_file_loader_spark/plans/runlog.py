"""Run log (SURVEY §1.1): per-stage started/ended/success + row counts.

Reference: ``file_load_log`` table updated after every stage (reference
process/log.py:7-44, runner.py:113-125). Here the log is driver-side state
flushed to a warehouse parquet table at end of run — per-stage DB round-trips
make no sense in Spark; metrics come from explicit actions the pipeline
already performs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import types as T

from etl_file_loader_spark.plans.warehouse import Warehouse

LOG_TABLE = "file_load_log"

LOG_SCHEMA = T.StructType(
    [
        T.StructField("file_load_log_id", T.LongType(), False),
        T.StructField("source_filename", T.StringType(), False),
        T.StructField("target_table_name", T.StringType(), True),
        T.StructField("stage", T.StringType(), False),
        T.StructField("started_at", T.TimestampType(), False),
        T.StructField("ended_at", T.TimestampType(), True),
        T.StructField("success", T.BooleanType(), True),
        T.StructField("row_count", T.LongType(), True),
    ]
)


@dataclass
class RunLog:
    log_id: int
    filename: str
    target_table: str
    entries: list[dict] = field(default_factory=list)
    # live per-stage hook (CLI progress, reference cli/main.py:106-127):
    # called with the completed entry dict right after it is recorded
    on_stage: "Callable[[dict], None] | None" = None

    def stage(self, name: str):
        """Context manager logging started/ended/success for one stage."""
        log = self

        class _Stage:
            def __init__(self):
                self.row_count: int | None = None

            def __enter__(self):
                self.started = datetime.now(timezone.utc)
                return self

            def __exit__(self, exc_type, exc, tb):
                log.entries.append(
                    {
                        "file_load_log_id": log.log_id,
                        "source_filename": log.filename,
                        "target_table_name": log.target_table,
                        "stage": name,
                        "started_at": self.started.replace(tzinfo=None),
                        "ended_at": datetime.now(timezone.utc).replace(tzinfo=None),
                        "success": exc_type is None,
                        "row_count": self.row_count,
                    }
                )
                if log.on_stage is not None:
                    log.on_stage(log.entries[-1])
                return False

        return _Stage()

    def flush(self, warehouse: Warehouse) -> None:
        if self.entries:
            from etl_file_loader_spark.functions import local_rows_df

            # LocalRelation, not a 32-partition Python RDD: the list form
            # paid one Python-worker round trip per partition at every
            # scan of this handful of rows (guide §4, optimization r14)
            df = local_rows_df(
                warehouse.spark,
                [tuple(e[f.name] for f in LOG_SCHEMA.fields) for e in self.entries],
                LOG_SCHEMA,
            )
            warehouse.append(LOG_TABLE, df)


def next_log_id(warehouse: Warehouse) -> int:
    if not warehouse.exists(LOG_TABLE):
        return 1
    row = warehouse.read_table(LOG_TABLE).agg({"file_load_log_id": "max"}).collect()[0]
    return int(row[0] or 0) + 1
