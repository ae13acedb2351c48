"""Skew protection for the MERGE full-outer join.

The grain is unique on both merge sides (the grain audit gates publish), so
no single key can explode the join — the remaining exposure is an unlucky or
adversarial key SET whose murmur3 hashes collide into one shuffle partition
(AQE's skew-join splitting does not apply to full-outer joins, so it cannot
rescue that). The fixture here crafts exactly that pathology: every key
hashes to shuffle partition 0. ``salt_buckets`` re-keys the shuffle with a
deterministic grain-derived salt, spreading the hotspot without changing a
single output row.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_file_loader_spark.functions import row_hash
from etl_file_loader_spark.operators import publish

FIELDS = {"id": T.LongType(), "v": T.LongType()}


def _colliding_ids(spark, n_search: int):
    """Keys that ALL hash into shuffle partition 0 (the skewed fixture)."""
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return spark.range(n_search).filter(
        F.pmod(F.hash(F.col("id")), F.lit(n_part)) == 0
    )


def _frame(ids, fname: str, log: int, v_expr):
    return (
        ids.select("id", v_expr.alias("v"))
        .withColumn("etl_row_hash", row_hash(FIELDS))
        .withColumn("source_filename", F.lit(fname))
        .withColumn("file_load_log_id", F.lit(log).cast("long"))
    )


def _target(ids):
    return (
        _frame(ids, "t.csv", 1, F.col("id") * 2)
        .withColumn("etl_created_at", F.lit("2024-01-01 00:00:00").cast("timestamp"))
        .withColumn("etl_updated_at", F.lit(None).cast("timestamp"))
    )


def test_salted_merge_spreads_colliding_grains(spark):
    ids = _colliding_ids(spark, 200_000)
    target = _target(ids)
    # stage updates every second row, inserts a disjoint colliding range
    stage_ids = ids.filter(F.col("id") % 2 == 0)
    stage = _frame(stage_ids, "s.csv", 2, F.col("id") * 3)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try:
        # force the shuffle join (a broadcast join has no shuffle to skew) and
        # keep AQE from coalescing the tiny test partitions — at real scale
        # the skewed partition is far above the advisory size, so coalescing
        # wouldn't merge it; locally it hides the distribution being measured
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        now = F.lit("2024-06-01 00:00:00").cast("timestamp")
        unsalted = publish.merge_upsert(target, stage, ["id"], ["id", "v"], now=now)
        salted = publish.merge_upsert(
            target, stage, ["id"], ["id", "v"], now=now, salt_buckets=64
        )

        # the fixture really is pathological: the unsalted join lands every
        # row in ONE shuffle partition...
        unsalted_parts = (
            unsalted.select(F.spark_partition_id().alias("p")).distinct().count()
        )
        # ...and the salt spreads it across (essentially all of) them
        salted_parts = (
            salted.select(F.spark_partition_id().alias("p")).distinct().count()
        )
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        assert unsalted_parts == 1, unsalted_parts
        assert salted_parts >= max(2, n_part // 2), (salted_parts, n_part)

        # semantics identical row-for-row
        cols = sorted(unsalted.columns)
        a = sorted(map(tuple, unsalted.select(*cols).collect()))
        b = sorted(map(tuple, salted.select(*cols).collect()))
        assert a == b and len(a) == ids.count()
        assert "_merge_salt" not in salted.columns
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old_coalesce)


def test_merge_salt_is_pure_function_of_grain(spark):
    # equal grains must get equal salts on both sides regardless of other
    # columns — that's what makes the extra join key semantics-preserving
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 7).alias("noise")
    )
    s1 = df.select(publish.merge_salt(["id"], 64).alias("s")).collect()
    s2 = (
        df.withColumn("noise", F.col("noise") + 1)
        .select(publish.merge_salt(["id"], 64).alias("s"))
        .collect()
    )
    assert [r["s"] for r in s1] == [r["s"] for r in s2]
    assert all(0 <= r["s"] < 64 for r in s1)
    assert len({r["s"] for r in s1}) > 32  # actually spreads


# ---------------------------------------------------------------------------
# scd2_apply (round 8: Type-2 slowly-changing-dimension merge)
# ---------------------------------------------------------------------------


def _scd2_frames(spark):
    current = spark.createDataFrame(
        [
            # pre-existing history for key 1
            (1, "segA", "2019-01-01", "2020-01-01", 0),
            (1, "segB", "2020-01-01", None, 1),
            (2, "segC", "2020-01-01", None, 1),
            (3, "segD", "2020-01-01", None, 1),
        ],
        "k long, seg string, valid_from string, valid_to string, is_current long",
    )
    updates = spark.createDataFrame(
        [
            (1, "segB2"),  # changed -> close + insert
            (2, "segC"),   # unchanged -> passthrough
            (9, "segNew"), # new key -> insert
        ],
        "k long, seg string",
    )
    return current, updates


def test_scd2_apply_core_semantics(spark):
    current, updates = _scd2_frames(spark)
    out = publish.scd2_apply(current, updates, ["k"], ["seg"], "2021-01-01")
    rows = {(r["k"], r["valid_from"]): r for r in out.collect()}
    assert len(rows) == 6
    # history untouched
    assert rows[(1, "2019-01-01")]["is_current"] == 0
    assert rows[(1, "2019-01-01")]["valid_to"] == "2020-01-01"
    # changed key: old row closed at ts, new current inserted
    closed = rows[(1, "2020-01-01")]
    assert closed["is_current"] == 0 and closed["valid_to"] == "2021-01-01"
    assert closed["seg"] == "segB"
    new = rows[(1, "2021-01-01")]
    assert new["is_current"] == 1 and new["valid_to"] is None and new["seg"] == "segB2"
    # unchanged key passes through
    assert rows[(2, "2020-01-01")]["is_current"] == 1
    assert rows[(2, "2020-01-01")]["valid_to"] is None
    # key absent from batch: untouched by default
    assert rows[(3, "2020-01-01")]["is_current"] == 1
    # brand-new key
    brand = rows[(9, "2021-01-01")]
    assert brand["is_current"] == 1 and brand["seg"] == "segNew"


def test_scd2_apply_close_missing(spark):
    current, updates = _scd2_frames(spark)
    out = publish.scd2_apply(
        current, updates, ["k"], ["seg"], "2021-01-01", close_missing=True
    )
    rows = {(r["k"], r["valid_from"]): r for r in out.collect()}
    # key 3 absent from the snapshot batch -> closed
    gone = rows[(3, "2020-01-01")]
    assert gone["is_current"] == 0 and gone["valid_to"] == "2021-01-01"
    # but present keys behave as before
    assert rows[(2, "2020-01-01")]["is_current"] == 1


def test_scd2_apply_idempotent_on_unchanged_batch(spark):
    current, updates = _scd2_frames(spark)
    once = publish.scd2_apply(current, updates, ["k"], ["seg"], "2021-01-01")
    twice = publish.scd2_apply(once, updates, ["k"], ["seg"], "2022-01-01")
    # replaying the same batch later changes nothing but timestamps never
    # fire: same row count, same current rows
    assert once.count() == twice.count()
    cur_once = {(r["k"], r["seg"]) for r in once.filter("is_current = 1").collect()}
    cur_twice = {(r["k"], r["seg"]) for r in twice.filter("is_current = 1").collect()}
    assert cur_once == cur_twice


def _cdc_frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 100), (3, "c", 100), (4, "d", 100)],
        "k long, seg string, seq long",
    )
    changes = spark.createDataFrame(
        [
            # k=1: two upserts, latest (seq 300) must win
            (1, "a_mid", 200, "U"),
            (1, "a_new", 300, "U"),
            # k=2: delete
            (2, "b", 250, "D"),
            # k=3: stale change (seq 50 <= target 100) ignored
            (3, "c_stale", 50, "U"),
            # k=5: brand-new key
            (5, "e", 200, "I"),
            # k=6: delete of an absent key is a no-op
            (6, "x", 200, "D"),
            # k=4: equal-seq upsert/delete tie — delete wins
            (4, "d_tie", 400, "U"),
            (4, "d", 400, "D"),
        ],
        "k long, seg string, seq long, op string",
    )
    return target, changes


def test_cdc_apply_core_semantics(spark):
    target, changes = _cdc_frames(spark)
    out = publish.cdc_apply(target, changes, ["k"], ["seg"], "seq")
    rows = {r["k"]: r for r in out.collect()}
    # k=1 latest upsert applied; k=2 deleted; k=3 stale change ignored;
    # k=4 equal-seq tie resolved to delete; k=5 inserted; k=6 never existed
    assert set(rows) == {1, 3, 5}
    assert rows[1]["seg"] == "a_new" and rows[1]["seq"] == 300
    assert rows[3]["seg"] == "c" and rows[3]["seq"] == 100
    assert rows[5]["seg"] == "e" and rows[5]["seq"] == 200


def test_cdc_apply_idempotent_replay(spark):
    target, changes = _cdc_frames(spark)
    once = publish.cdc_apply(target, changes, ["k"], ["seg"], "seq")
    # replaying the same batch: every change's seq is now <= the row's
    # seq (or the key is gone), so nothing moves — idempotent recovery
    twice = publish.cdc_apply(once, changes, ["k"], ["seg"], "seq")
    a = sorted(tuple(r) for r in once.collect())
    b = sorted(tuple(r) for r in twice.collect())
    assert a == b


def test_cdc_apply_incremental_batches_compose(spark):
    target, _ = _cdc_frames(spark)
    b1 = spark.createDataFrame(
        [(1, "a2", 200, "U"), (2, "b", 200, "D")],
        "k long, seg string, seq long, op string",
    )
    b2 = spark.createDataFrame(
        [(1, "a3", 300, "U"), (2, "b_back", 300, "I")],
        "k long, seg string, seq long, op string",
    )
    # applying b1 then b2 equals applying b1+b2 in one batch
    step = publish.cdc_apply(
        publish.cdc_apply(target, b1, ["k"], ["seg"], "seq"),
        b2, ["k"], ["seg"], "seq",
    )
    both = publish.cdc_apply(
        target, b1.unionByName(b2), ["k"], ["seg"], "seq"
    )
    assert sorted(tuple(r) for r in step.collect()) == sorted(
        tuple(r) for r in both.collect()
    )
