"""JDBC sink adapter: stage/DLQ bulk loads into a relational target.

Covers the reference's database write surface (SURVEY §2.2 K3/K4 — SQL
Server bulk load, reference src/pipeline/write/mssql.py:228-356; BigQuery
load jobs, write/bigquery.py:43-158) the Spark way: ``df.write.jdbc`` is
already a parallel bulk writer (one batched INSERT stream per partition),
so the whole dialect-specific machinery — SqlBulkCopy DataTables,
2100-parameter batch-size math (mssql.py:29-41), NDJSON load-job
stringification — collapses into connector options:

- ``batchsize``      rows per executeBatch round-trip (reference
                     BATCH_SIZE=100k, settings.py:64)
- ``isolationLevel`` per-partition transaction isolation
- ``numPartitions``  cap on concurrent connections (reference pools 20,
                     settings.py:268-274)
- ``truncate``       overwrite keeps the table + indexes, TRUNCATE + load

The adapter deliberately mirrors the reference's WRITE semantics only
(stage insert write/base.py:34-73 + DLQ insert write/base.py:74-129):
audits, MERGE and DLQ cleanup run in Spark against the engine's own
warehouse — the reference pushes them to the DB because the DB is its only
execution engine; here Spark is.

Tested against the Derby embedded driver that ships with Spark's JVM; any
JDBC4 driver on the classpath works the same way.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcSink:
    """Connection + tuning bundle for a JDBC target.

    ``url`` like ``jdbc:postgresql://host/db`` or
    ``jdbc:derby:/path;create=true``; ``driver`` is the JDBC class name when
    the URL scheme alone can't resolve it; ``properties`` carries
    user/password and any driver-specific keys.
    """

    url: str
    driver: str | None = None
    batch_size: int = 100_000
    isolation_level: str = "READ_COMMITTED"
    num_partitions: int | None = None
    properties: dict[str, str] = field(default_factory=dict)

    def _writer(self, df: DataFrame, table: str, mode: str):
        if self.num_partitions and df.rdd.getNumPartitions() > self.num_partitions:
            df = df.coalesce(self.num_partitions)
        w = (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
            .option("batchsize", str(self.batch_size))
            .option("isolationLevel", self.isolation_level)
            .mode(mode)
        )
        if self.driver:
            w = w.option("driver", self.driver)
        for k, v in self.properties.items():
            w = w.option(k, v)
        return w

    def write_stage(self, df: DataFrame, table: str) -> None:
        """Stage insert (K1 pushed over JDBC): create-or-append the batch.

        Spark issues parallel batched INSERTs (one connection per
        partition) — the engine-portable analog of SqlBulkCopy/load jobs.
        """
        self._writer(df, table, "append").save()

    def write_dlq(self, df: DataFrame, table: str = "file_load_dlq") -> None:
        """DLQ insert (K2 pushed over JDBC): append invalid-row records."""
        self._writer(df, table, "append").save()

    def overwrite(self, df: DataFrame, table: str, truncate: bool = True) -> None:
        """Full refresh of a target table. ``truncate`` keeps the table's
        DDL (indexes, grants) and reloads rows — the fast path on real
        databases; set False to drop/recreate from the DataFrame schema."""
        self._writer(df, table, "overwrite").option(
            "truncate", "true" if truncate else "false"
        ).save()

    def read_table(self, spark: SparkSession, table: str) -> DataFrame:
        r = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
        )
        if self.driver:
            r = r.option("driver", self.driver)
        for k, v in self.properties.items():
            r = r.option(k, v)
        return r.load()
