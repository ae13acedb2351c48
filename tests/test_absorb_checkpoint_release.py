"""Maintained-index absorb must not accumulate superseded checkpoints.

Round-12 probe facts this pins: localCheckpoint ENTRIES are
strong-referenced by SparkContext until an explicit RDD-level unpersist
(DataFrame.unpersist touches only the CacheManager), so an absorb loop
that rebinds ``self._x`` to a fresh eager checkpoint without releasing
the predecessor holds K copies of the index state after K absorbs —
evictable memory pressure, then unbounded local-disk growth over a
stream's lifetime. Round 13 releases the predecessor inside every
absorb; these tests assert the persistent-RDD count stays CONSTANT
across K >= 5 absorbs per index class AND the estimates still match an
all-at-once build (the release must not change any answer).
"""

import pytest
from pyspark.sql import functions as F

from etl_file_loader_spark.operators.cache import (
    release_local_checkpoint,
    release_operator_caches,
)
from etl_file_loader_spark.operators.dedup import NearDupIndex, connected_components
from etl_file_loader_spark.operators.sketches import (
    CMSIndex,
    HLLIndex,
    KMVIndex,
    QuantileIndex,
    hll_estimate,
    hll_registers,
)

K_ABSORBS = 5


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _batches(spark, k=K_ABSORBS):
    return [
        spark.range(i * 100, (i + 1) * 100).select(
            F.col("id"),
            (F.col("id") % 7).alias("grp"),
            (F.col("id") % 13).cast("double").alias("val"),
            F.concat(F.lit("the quick brown fox jumps over doc "), F.col("id").cast("string")).alias("text"),
        )
        for i in range(k)
    ]


def _assert_constant_rdds(spark, index, batches):
    """Absorb K batches; the persistent-RDD count after each absorb must
    equal the count after the first (one live checkpoint per index)."""
    baseline = None
    for b in batches:
        index.absorb(b)
        n = _n_persistent(spark)
        if baseline is None:
            baseline = n
        assert n == baseline, f"checkpoint accumulation: {n} != {baseline}"


def test_hll_index_constant_checkpoints(spark):
    batches = _batches(spark)
    before = _n_persistent(spark)
    idx = HLLIndex(batches[0], ["grp"], "id", p=6)
    _assert_constant_rdds(spark, idx, batches[1:])
    # answers unaffected: maintained estimate == one-shot over the union
    union = batches[0]
    for b in batches[1:]:
        union = union.unionByName(b)
    expect = {
        (r.grp, r.hll_est)
        for r in hll_estimate(hll_registers(union, ["grp"], "id", 6), ["grp"], 6).collect()
    }
    got = {(r.grp, r.hll_est) for r in idx.estimate().collect()}
    assert got == expect
    release_local_checkpoint(idx._regs)
    assert _n_persistent(spark) == before


def test_quantile_index_constant_checkpoints(spark):
    batches = _batches(spark)
    before = _n_persistent(spark)
    idx = QuantileIndex(batches[0], ["grp"], "val")
    _assert_constant_rdds(spark, idx, batches[1:])
    union = batches[0]
    for b in batches[1:]:
        union = union.unionByName(b)
    one_shot = QuantileIndex(union, ["grp"], "val")
    expect = {tuple(r) for r in one_shot.estimate([500, 990]).collect()}
    got = {tuple(r) for r in idx.estimate([500, 990]).collect()}
    assert got == expect
    release_local_checkpoint(idx._hist)
    release_local_checkpoint(one_shot._hist)
    assert _n_persistent(spark) == before


def test_cms_index_constant_checkpoints(spark):
    batches = _batches(spark)
    before = _n_persistent(spark)
    idx = CMSIndex(batches[0], "grp", width=64)
    _assert_constant_rdds(spark, idx, batches[1:])
    probes = spark.createDataFrame([(0,), (3,)], "grp long")
    union = batches[0]
    for b in batches[1:]:
        union = union.unionByName(b)
    one_shot = CMSIndex(union, "grp", width=64)
    expect = {(r.grp, r.est_count) for r in one_shot.query(probes, "grp").collect()}
    got = {(r.grp, r.est_count) for r in idx.query(probes, "grp").collect()}
    assert got == expect
    # never-undercount on the true counts (500 rows, id % 7)
    true = {r.grp: r.cnt for r in union.groupBy("grp").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for g, est in got:
        assert est >= true[g]
    release_local_checkpoint(idx._sk)
    release_local_checkpoint(one_shot._sk)
    assert _n_persistent(spark) == before


def test_kmv_index_constant_checkpoints(spark):
    batches = _batches(spark)
    before = _n_persistent(spark)
    idx = KMVIndex(batches[0], ["grp"], "id", k=16)
    _assert_constant_rdds(spark, idx, batches[1:])
    assert idx.estimate().count() == 7
    release_local_checkpoint(idx._state)
    assert _n_persistent(spark) == before


def test_near_dup_index_constant_checkpoints(spark):
    batches = _batches(spark)
    before = _n_persistent(spark)
    idx = NearDupIndex(batches[0], "id", "text")
    _assert_constant_rdds(spark, idx, batches[1:])
    # flags still work after K releases (every doc is a near-dup of the
    # shared template, so batch 0's ids win the min)
    flagged = idx.flag(batches[0].limit(5))
    assert flagged.filter(F.col("is_near_dup") == 1).count() == 5
    release_local_checkpoint(idx._index)
    release_operator_caches()
    assert _n_persistent(spark) == before


def test_release_is_noop_on_non_checkpoint_frames(spark, tmp_path):
    df = spark.range(10)
    assert release_local_checkpoint(df) is False
    df.write.mode("overwrite").parquet(str(tmp_path / "p"))
    assert release_local_checkpoint(spark.read.parquet(str(tmp_path / "p"))) is False


def test_connected_components_releases_round_checkpoints(spark):
    before = _n_persistent(spark)
    # a 12-node chain forces many min-label rounds (diameter >> 3)
    pairs = spark.range(11).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    out = connected_components(pairs, max_iterations=20)
    rows = out.collect()
    assert len(rows) == 12 and {r.cluster_id for r in rows} == {0}
    # only the FINAL label checkpoint may remain live (edges + every
    # superseded round released inside the loop)
    assert _n_persistent(spark) - before <= 1


def test_link_best_tier_checkpoints_release_between_workloads(spark):
    """The per-tier link_best checkpoints cannot release behind their own
    lazy return value (the pin() contract), so they register with
    pin_checkpoint and release_operator_caches() frees them between
    workloads — a session composing many link calls stays bounded."""
    from etl_file_loader_spark.operators.dedup import LinkageIndex

    before = _n_persistent(spark)
    master = spark.range(200).select(
        F.col("id").alias("pid"),
        F.concat(F.lit("name-"), F.col("id").cast("string")).alias("name"),
    )
    idx = LinkageIndex(master, "pid", "name", max_distance=1)
    feed = spark.range(50).select(
        (F.col("id") + 1000).alias("rid"),
        F.concat(F.lit("name-"), F.col("id").cast("string")).alias("s"),
    )
    resolved = idx.link_best(feed, "rid", "s")
    assert resolved.count() == 50  # exact tier resolves everything
    assert _n_persistent(spark) > before  # tier checkpoints live until release
    idx.release()
    released = release_operator_caches()
    assert released >= 1
    assert _n_persistent(spark) == before
