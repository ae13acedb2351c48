"""Publish / MERGE upsert (SURVEY §2.5 J2-J4, §2.4 A5).

Reference semantics (publish/postgresql.py:24-43 and dialect twins, driver
publish/base.py:80-97):

    MERGE INTO target USING stage ON <grain equi-join>
    WHEN MATCHED AND stage.etl_row_hash != target.etl_row_hash
        THEN UPDATE SET <business cols>, etl_row_hash, source_filename,
                        file_load_log_id, etl_updated_at = now
    WHEN NOT MATCHED THEN INSERT (..., etl_created_at = now)

Matched-but-unchanged rows are untouched (etl_created_at preserved,
etl_updated_at untouched).

Spark-first implementation: a **full-outer-join rewrite** on the grain key so
the core has zero non-Spark dependencies (Delta's MERGE INTO is the drop-in
alternative when its jars are on the classpath — same logical plan underneath:
join on the merge condition + per-column conditional projection).

Scale: one shuffle on the grain key for both sides. On a real cluster, bucket
the target table by grain (``write.bucketBy(n, *grain)``) so repeated loads
shuffle only the (much smaller) stage side; AQE handles skewed grains. The
insert/update counts reuse the same join shape (left_anti / inner+hash-filter)
— Catalyst broadcasts the stage side automatically when a single file's rows
are << the target.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_file_loader_spark.operators.hashing import HASH_COL

CREATED_COL = "etl_created_at"
UPDATED_COL = "etl_updated_at"
FILENAME_COL = "source_filename"
LOG_ID_COL = "file_load_log_id"

SYSTEM_COLS = [HASH_COL, FILENAME_COL, LOG_ID_COL, CREATED_COL, UPDATED_COL]


def merge_upsert(
    target: DataFrame,
    stage: DataFrame,
    grain: list[str],
    business_cols: list[str],
    now: Column | None = None,
) -> DataFrame:
    """Full-outer-join MERGE rewrite; returns the new target contents.

    ``stage`` must carry business cols + etl_row_hash + source_filename +
    file_load_log_id. ``target`` additionally carries etl_created_at /
    etl_updated_at. Grain columns are assumed non-null (enforced upstream by
    validation - grain fields are non-nullable).
    """
    now = now if now is not None else F.current_timestamp()
    data_cols = [c for c in business_cols if c not in grain]

    s = stage.select(
        *[F.col(g).alias(f"s_{g}") for g in grain],
        *[F.col(c).alias(f"s_{c}") for c in data_cols],
        F.col(HASH_COL).alias(f"s_{HASH_COL}"),
        F.col(FILENAME_COL).alias(f"s_{FILENAME_COL}"),
        F.col(LOG_ID_COL).alias(f"s_{LOG_ID_COL}"),
    )
    t = target.select(
        *[F.col(g).alias(f"t_{g}") for g in grain],
        *[F.col(c).alias(f"t_{c}") for c in data_cols],
        *[F.col(c).alias(f"t_{c}") for c in SYSTEM_COLS],
    )
    cond = [s[f"s_{g}"] == t[f"t_{g}"] for g in grain]
    joined = s.join(t, on=cond if cond else None, how="full_outer")

    s_exists = F.col(f"s_{grain[0]}").isNotNull()
    t_exists = F.col(f"t_{grain[0]}").isNotNull()
    changed = s_exists & t_exists & (F.col(f"s_{HASH_COL}") != F.col(f"t_{HASH_COL}"))
    # the UPDATE branch only fires on hash mismatch (reference
    # publish/postgresql.py:24-43); matched-but-unchanged rows keep every
    # target value including source_filename / file_load_log_id
    take_stage = changed | (s_exists & ~t_exists)

    def pick(c: str) -> Column:
        return F.when(take_stage, F.col(f"s_{c}")).otherwise(F.col(f"t_{c}")).alias(c)

    out = [F.coalesce(F.col(f"s_{g}"), F.col(f"t_{g}")).alias(g) for g in grain]
    out += [pick(c) for c in data_cols]
    out += [pick(HASH_COL), pick(FILENAME_COL), pick(LOG_ID_COL)]
    out.append(F.when(t_exists, F.col(f"t_{CREATED_COL}")).otherwise(now).alias(CREATED_COL))
    out.append(F.when(changed, now).otherwise(F.col(f"t_{UPDATED_COL}")).alias(UPDATED_COL))
    return joined.select(*out)


@dataclass
class PublishCounts:
    inserts: int
    updates: int
    unchanged: int


def publish_counts(target: DataFrame, stage: DataFrame, grain: list[str]) -> PublishCounts:
    """Insert/update/unchanged counts (reference publish/base.py:40-74).

    inserts   = stage rows with no grain match in target   (left_anti)
    updates   = grain-matched rows whose etl_row_hash differs (inner + filter)
    unchanged = grain-matched rows with equal hash

    The reference computes matched via EXISTS then inserts = total - matched
    ("EXISTS is more efficient than NOT EXISTS", publish/base.py:51-57);
    Catalyst plans left_semi/left_anti from the same join, so we write the
    intent directly and count all three in one pass over the inner join plus
    one anti-join.
    """
    t = target.select(*grain, F.col(HASH_COL).alias("_t_hash"))
    matched = stage.join(t, on=grain, how="inner")
    agg = matched.agg(
        F.count(F.lit(1)).alias("matched"),
        F.sum((F.col(HASH_COL) != F.col("_t_hash")).cast("long")).alias("updates"),
    ).collect()[0]
    matched_n = agg["matched"] or 0
    updates = int(agg["updates"] or 0)
    inserts = stage.join(t, on=grain, how="left_anti").count()
    return PublishCounts(inserts=inserts, updates=updates, unchanged=matched_n - updates)


def is_file_loaded(target: DataFrame, filename: str) -> bool:
    """Duplicate-file check (reference db_utils.py:243-258): filter+limit, not a join."""
    return not target.filter(F.col(FILENAME_COL) == filename).limit(1).isEmpty()
