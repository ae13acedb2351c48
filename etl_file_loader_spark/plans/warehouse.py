"""Copy-on-write parquet warehouse.

The reference's targets are DB tables (reference process/db.py:92-213). Here a
table is a directory of versioned parquet snapshots ``<table>/_v<N>`` with the
highest N current — a minimal copy-on-write format (Delta-without-the-log):
a MERGE writes the *new* snapshot by executing a plan that reads the old one,
then flips the version; readers never see a partial write and the "read your
own input while overwriting it" parquet hazard is avoided by construction.

Scale: snapshot writes are fully parallel; old versions are pruned to
``keep_versions``. On a real cluster you'd swap this for Delta/Iceberg —
the engine only uses read_table/overwrite/append, so the swap is local.
"""

from __future__ import annotations

import re
import shutil
import threading
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class Warehouse:
    def __init__(self, spark: SparkSession, path: str, keep_versions: int = 2):
        self.spark = spark
        self.path = Path(path)
        self.keep_versions = keep_versions
        self.path.mkdir(parents=True, exist_ok=True)
        # per-TABLE locks: concurrent per-file pipelines
        # (Processor.process_files_in_parallel) can't interleave a
        # read-modify-write on the same table, but pipelines targeting
        # different tables mutate fully in parallel (the Delta/Iceberg
        # analogue is per-table optimistic concurrency). Reads stay
        # lock-free (snapshot isolation via versioned dirs).
        self._locks: dict[str, threading.RLock] = {}
        self._meta = threading.Lock()

    def _table_lock(self, table: str) -> threading.RLock:
        with self._meta:
            return self._locks.setdefault(table, threading.RLock())

    def _versions(self, table: str) -> list[int]:
        tdir = self.path / table
        if not tdir.exists():
            return []
        out = []
        for p in tdir.iterdir():
            m = re.fullmatch(r"_v(\d+)", p.name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def exists(self, table: str) -> bool:
        return bool(self._versions(table))

    def table_versions(self, table: str) -> list[int]:
        """Retained snapshot versions, oldest first (time-travel surface)."""
        return self._versions(table)

    def read_table(
        self,
        table: str,
        schema: T.StructType | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Current snapshot — or a retained older one via ``version`` (time
        travel, the COW analogue of Delta's VERSION AS OF; only the last
        ``keep_versions`` snapshots are retained). Empty frame with
        ``schema`` if the table doesn't exist.
        """
        versions = self._versions(table)
        if not versions:
            if schema is None:
                raise FileNotFoundError(f"table {table} does not exist and no schema given")
            return self.spark.createDataFrame([], schema)
        if version is not None:
            if version not in versions:
                raise FileNotFoundError(
                    f"table {table} version {version} not retained "
                    f"(available: {versions})"
                )
            return self.spark.read.parquet(str(self.path / table / f"_v{version}"))
        return self.spark.read.parquet(str(self.path / table / f"_v{versions[-1]}"))

    def overwrite(
        self, table: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> None:
        with self._table_lock(table):
            self._overwrite_locked(table, df, partition_by)

    def _overwrite_locked(
        self, table: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> None:
        versions = self._versions(table)
        new_v = (versions[-1] + 1) if versions else 0
        out = self.path / table / f"_v{new_v}"
        writer = df.write.mode("overwrite")
        if partition_by:
            # hive-style layout: readers filtering on these columns prune
            # whole directories at plan time (PartitionFilters, zero I/O for
            # excluded partitions) — the COW analogue of Delta partitioning
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(out))
        for v in versions[: -self.keep_versions + 1] if self.keep_versions > 0 else versions:
            shutil.rmtree(self.path / table / f"_v{v}", ignore_errors=True)

    def append(self, table: str, df: DataFrame) -> None:
        """True append: new part files into the current snapshot directory.

        O(appended rows), not O(table) — a run ingesting N files appends to
        the run log / DLQ N times; rewriting the whole table each time would
        be quadratic. Readers of the current snapshot list files at plan
        time, so concurrent readers see either the old or the new file set.
        Deletes/updates still go through ``overwrite`` (new snapshot).
        """
        with self._table_lock(table):
            versions = self._versions(table)
            if not versions:
                self._overwrite_locked(table, df)
            else:
                out = self.path / table / f"_v{versions[-1]}"
                df.write.mode("append").parquet(str(out))

    def mutate(self, table: str):
        """Context manager serializing a multi-step read-modify-write on ONE
        table (e.g. merge: read target -> counts -> overwrite) across
        threads; mutations of other tables proceed concurrently."""
        return self._table_lock(table)

    def compact(self, table: str, target_files: int | None = None) -> None:
        """Rewrite the current snapshot with fewer, larger files.

        Append-heavy tables (run log, DLQ) accumulate one small part file per
        append; periodic compaction restores scan efficiency — the COW
        equivalent of Delta OPTIMIZE. ``target_files`` defaults to the
        cluster's parallelism capped by current file count.
        """
        with self._table_lock(table):
            if not self.exists(table):
                return
            df = self.read_table(table)
            n = target_files or max(1, min(len(df.inputFiles()), self.spark.sparkContext.defaultParallelism))
            self._overwrite_locked(table, df.coalesce(n))

    def drop(self, table: str) -> None:
        shutil.rmtree(self.path / table, ignore_errors=True)
