"""Round 12: the maintained-index family survives a session.

VERDICT r11 ranked this #1 under "missing": LinkageIndex / NearDupIndex /
HLLIndex lived in-session (pinned / localCheckpointed frames) while their
docstrings promised a written-once durable base — prose, not code. Each
index now has save(path)/load(spark, path) over plain parquet
(operators/persist.py). These tests assert RELOAD EQUALITY: flag/link/
estimate outputs are identical before and after a round-trip, and
absorbing MORE data into a restored index equals an uninterrupted run
(confluence makes the boundary unobservable).
"""

import pytest
from pyspark.sql import functions as F

from etl_file_loader_spark.operators import dedup as dedup_ops
from etl_file_loader_spark.operators import sketches

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


@pytest.fixture(scope="module")
def part(spark):
    return spark.read.parquet(f"{SF}/part.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_near_dup_index_reload_equality(spark, docs, tmp_path):
    seed = docs.filter(F.col("doc_id") % 4 == 0)
    b1 = docs.filter(F.col("doc_id") % 4 == 1)
    b2 = docs.filter(F.col("doc_id") % 4 == 2)

    idx = dedup_ops.NearDupIndex(seed, "doc_id", "text")
    idx.absorb(b1)
    flags_live = _rows(idx.flag(b2))

    path = str(tmp_path / "ndi")
    idx.save(path)
    back = dedup_ops.NearDupIndex.load(spark, path)
    assert (back.id_col, back.text_col, back.num_hashes, back.n,
            back.bands, back.rows_per_band) == (
        idx.id_col, idx.text_col, idx.num_hashes, idx.n,
        idx.bands, idx.rows_per_band,
    )
    assert _rows(back.index_frame()) == _rows(idx.index_frame())
    assert _rows(back.flag(b2)) == flags_live

    # absorbing PAST the boundary equals the uninterrupted run
    idx.absorb(b2)
    back.absorb(b2)
    assert _rows(back.index_frame()) == _rows(idx.index_frame())


def test_linkage_index_reload_equality(spark, part, tmp_path):
    left = part.select(
        F.col("p_partkey").alias("pid"), F.col("p_name").alias("name")
    )
    idx = dedup_ops.LinkageIndex(left, "pid", "name", max_distance=2)
    feed = part.filter(F.col("p_partkey") % 16 == 1).select(
        (F.col("p_partkey") + F.lit(5_000_000)).alias("rid"),
        F.expr("substr(p_name, 2)").alias("s"),
    )
    live_link = _rows(idx.link(feed, "rid", "s"))
    live_best = _rows(idx.link_best(feed, "rid", "s"))

    path = str(tmp_path / "li")
    idx.save(path)
    back = dedup_ops.LinkageIndex.load(spark, path)
    assert (back.master_id, back.max_distance) == ("pid", 2)
    # the spread guard re-applies on load: the fan-out join must never
    # run on a single-file parquet's 1-2 partitions
    par = spark.sparkContext.defaultParallelism
    assert back._lbase.rdd.getNumPartitions() >= min(
        par, max(idx._lbase.rdd.getNumPartitions(), 1)
    )
    assert _rows(back.link(feed, "rid", "s")) == live_link
    assert _rows(back.link_best(feed, "rid", "s")) == live_best
    back.release()


def test_hll_index_reload_equality(spark, orders, tmp_path):
    seed = orders.filter(F.col("o_orderkey") % 4 == 0)
    b1 = orders.filter(F.col("o_orderkey") % 4 == 1)
    b2 = orders.filter(F.col("o_orderkey") % 4 == 2)

    idx = sketches.HLLIndex(seed, ["o_orderstatus"], "o_custkey", p=8)
    idx.absorb(b1)
    est_live = _rows(idx.estimate())

    path = str(tmp_path / "hll")
    idx.save(path)
    back = sketches.HLLIndex.load(spark, path)
    assert (back.keys, back.col, back.p) == (["o_orderstatus"], "o_custkey", 8)
    assert _rows(back.registers()) == _rows(idx.registers())
    assert _rows(back.estimate()) == est_live

    idx.absorb(b2)
    back.absorb(b2)
    assert _rows(back.registers()) == _rows(idx.registers())
    assert _rows(back.estimate()) == _rows(idx.estimate())


def test_bm25_index_reload_equality(spark, docs, tmp_path):
    from etl_file_loader_spark.operators.text import BM25Index, bm25_score

    terms = ["shared", "doc"]
    seed = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)

    idx = BM25Index(seed, "doc_id", "text", terms)
    idx.absorb(b1)
    path = str(tmp_path / "bm25")
    idx.save(path)
    back = BM25Index.load(spark, path)
    assert (back.terms, back.k1, back.b) == (terms, 1.2, 0.75)
    assert _rows(back.postings()) == _rows(idx.postings())

    idx.absorb(b2)
    back.absorb(b2)
    assert _rows(back.score()) == _rows(idx.score())
    # maintained score == scan-time one-shot over the whole corpus
    one_shot = _rows(bm25_score(docs, "doc_id", "text", terms))
    assert _rows(back.score()) == one_shot


def test_hll_saved_registers_are_engine_portable(spark, orders, tmp_path):
    """The persisted state is plain rows — DuckDB reads it directly and
    agrees on every register (the portable-sketch point of the design)."""
    import duckdb

    idx = sketches.HLLIndex(
        orders.filter(F.col("o_orderkey") % 4 == 0),
        ["o_orderstatus"], "o_custkey", p=8,
    )
    path = str(tmp_path / "hllp")
    idx.save(path)
    duck = duckdb.sql(
        f"SELECT o_orderstatus, bucket, rho FROM '{path}/snapshot/state/*.parquet' "
        f"ORDER BY 1, 2"
    ).fetchall()
    live = _rows(idx.registers())
    assert [tuple(r) for r in duck] == live


def test_cms_index_reload_and_exactly_once(spark, orders, tmp_path):
    from pyspark.sql import functions as F

    seed = orders.filter(F.col("o_orderkey") % 2 == 0)
    b1 = orders.filter(F.col("o_orderkey") % 2 == 1)
    cands = spark.createDataFrame([(1,), (2,), (500,)], "o_custkey long")

    idx = sketches.CMSIndex(seed, "o_custkey", depth=4, width=64)
    idx.absorb(b1)
    est_live = _rows(idx.query(cands, "o_custkey"))

    path = str(tmp_path / "cms")
    idx.save(path)
    back = sketches.CMSIndex.load(spark, path)
    assert (back.col, back.depth, back.width) == ("o_custkey", 4, 64)
    assert _rows(back.sketch()) == _rows(idx.sketch())
    assert _rows(back.query(cands, "o_custkey")) == est_live

    # maintained == one-shot over the union
    one = sketches.cms_sketch(orders, "o_custkey", depth=4, width=64)
    assert _rows(idx.sketch()) == _rows(one)

    # exactly-once contract: double absorb double-counts (sum, not max)
    total_before = back.sketch().agg(F.sum("cnt")).first()[0]
    back.absorb(b1)
    total_after = back.sketch().agg(F.sum("cnt")).first()[0]
    assert total_after == total_before + 4 * b1.count()


def test_kmv_index_reload_and_confluence(spark, orders, tmp_path):
    """KMVIndex: reload equality, maintained == one-shot, and — the
    property that separates it from the sum-merged Quantile/CMS —
    CONFLUENCE: replayed and out-of-order absorbs leave the state
    unchanged (set-union keep-k-smallest is idempotent)."""
    seed = orders.filter(F.col("o_orderkey") % 3 == 0)
    b1 = orders.filter(F.col("o_orderkey") % 3 == 1)
    b2 = orders.filter(F.col("o_orderkey") % 3 == 2)

    idx = sketches.KMVIndex(seed, ["o_orderstatus"], "o_custkey", k=32)
    idx.absorb(b1).absorb(b2)
    one = sketches.kmv_sketch(orders, ["o_orderstatus"], "o_custkey", k=32)
    assert _rows(idx.state()) == _rows(one)

    path = str(tmp_path / "kmv")
    idx.save(path)
    back = sketches.KMVIndex.load(spark, path)
    assert (back.keys, back.col, back.k) == (["o_orderstatus"], "o_custkey", 32)
    assert _rows(back.state()) == _rows(idx.state())
    assert _rows(back.estimate()) == _rows(idx.estimate())

    # confluence: absorbing b1 AGAIN (a replay) changes nothing
    back.absorb(b1)
    assert _rows(back.state()) == _rows(idx.state())

    # order independence: seed -> b2 -> b1 equals seed -> b1 -> b2
    other = sketches.KMVIndex(seed, ["o_orderstatus"], "o_custkey", k=32)
    other.absorb(b2).absorb(b1)
    assert _rows(other.state()) == _rows(idx.state())


def test_save_publishes_atomically_and_load_refuses_torn_state(spark, orders, tmp_path):
    """ADVICE r12: state+meta used to be two independent overwrites — a
    crash between them could pair NEW state with OLD meta, and a missing
    meta died on an opaque path error. Round 13 publishes both parts
    under one staging dir gated on _SUCCESS and adopted by a single
    rename; load refuses torn layouts with a clear message."""
    import pytest as _pytest

    from etl_file_loader_spark.fs import FS
    from etl_file_loader_spark.operators.persist import (
        load_index_state,
        save_index_state,
    )

    fs = FS(spark)
    path = str(tmp_path / "atomic")
    idx = sketches.HLLIndex(orders.limit(50), ["o_orderstatus"], "o_custkey", p=6)
    idx.save(path)
    assert fs.exists(f"{path}/snapshot/_SUCCESS")

    # a second save replaces the snapshot in one adoption step and any
    # crashed staging husk is absorbed by the next attempt
    fs.mkdirs(f"{path}/_tmp_snapshot")
    fs.write_text(f"{path}/_tmp_snapshot/_SUCCESS", "")  # husk
    idx.save(path)
    state, meta = load_index_state(spark, path)
    assert meta["p"] == 6 and state.count() > 0

    # torn publish (no _SUCCESS): clear refusal, not an opaque path error
    fs.delete(f"{path}/snapshot/_SUCCESS")
    with _pytest.raises(FileNotFoundError, match="_SUCCESS"):
        load_index_state(spark, path)

    # nothing at all: clear message naming both layouts
    with _pytest.raises(FileNotFoundError, match="no index state"):
        load_index_state(spark, str(tmp_path / "nowhere"))

    # pre-round-13 layout still loads
    legacy = str(tmp_path / "legacy")
    idx.registers().write.parquet(f"{legacy}/state")
    spark.createDataFrame(
        [('{"keys": ["o_orderstatus"], "col": "o_custkey", "p": 6}',)],
        "meta string",
    ).write.parquet(f"{legacy}/meta")
    back = sketches.HLLIndex.load(spark, legacy)
    assert _rows(back.estimate()) == _rows(idx.estimate())


def test_bucketed_save_colocates_probe_join(spark, tmp_path):
    """Round 13: persist.py's 'a bucketed saveAsTable would additionally
    co-locate the probe join' prose is now code. Bucketing on BOTH probe
    join keys makes the restored index side read pre-partitioned: the
    index-side Exchange disappears from flag()'s plan and results are
    identical to the plain-parquet path."""
    from etl_file_loader_spark.operators.dedup import NearDupIndex

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("shared words for doc "), (F.col("id") % 40).cast("string")
        ).alias("text"),
    )
    idx = NearDupIndex(docs, "doc_id", "text")
    bpath, ppath = str(tmp_path / "bidx"), str(tmp_path / "pidx")
    idx.save(bpath, bucket_by=["band_idx", "band_hash"], n_buckets=4)
    idx.save(ppath)
    bucketed = NearDupIndex.load(spark, bpath)
    plain = NearDupIndex.load(spark, ppath)

    batch = spark.range(300, 320).select(
        F.col("id").alias("doc_id"), F.lit("shared words for doc 7").alias("text")
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bplan = bucketed.flag(batch)._jdf.queryExecution().executedPlan().toString()
        pplan = plain.flag(batch)._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in bplan
        assert bplan.count("Exchange hashpartitioning") < pplan.count(
            "Exchange hashpartitioning"
        )
        assert sorted(map(tuple, bucketed.flag(batch).collect())) == sorted(
            map(tuple, plain.flag(batch).collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_bm25_add_terms_equals_rebuild(spark, docs, tmp_path):
    """Round 14 (VERDICT r13 ask 6): watchlist-delta term addition — one
    corpus pass counting ONLY the new terms joined into the stored
    postings must equal a full rebuild with all terms, including across
    a save/load boundary, and must validate the exactly-once corpus."""
    from etl_file_loader_spark.operators.text import BM25Index, bm25_score

    seed = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    corpus = seed.unionByName(b1)

    idx = BM25Index(seed, "doc_id", "text", ["shared", "doc"])
    idx.absorb(b1)
    idx.add_terms(corpus, ["data", "Doc"])  # 'Doc' lowers to a no-op dup
    assert idx.terms == ["shared", "doc", "data"]
    got = _rows(idx.score())
    rebuilt = BM25Index(corpus, "doc_id", "text", ["shared", "doc", "data"])
    assert got == _rows(rebuilt.score())
    # one-shot scan-time agreement too
    assert got == _rows(bm25_score(corpus, "doc_id", "text", ["shared", "doc", "data"]))

    # the widened terms persist through save/load
    path = str(tmp_path / "bm25w")
    idx.save(path)
    idx.release()
    rebuilt.release()
    back = BM25Index.load(spark, path)
    assert back.terms == ["shared", "doc", "data"]
    assert _rows(back.score()) == got

    # all-dup addition is a no-op (same object, same terms)
    assert back.add_terms(corpus, ["DOC"]) is back
    assert back.terms == ["shared", "doc", "data"]


def test_bm25_add_terms_validates_corpus(spark, docs):
    from etl_file_loader_spark.operators.text import BM25Index

    seed = docs.filter(F.col("doc_id") % 3 == 0)
    idx = BM25Index(seed, "doc_id", "text", ["doc"])
    # missing docs -> nulls -> raise
    with pytest.raises(ValueError, match="exactly the absorbed docs"):
        idx.add_terms(seed.filter(F.col("doc_id") % 6 == 0), ["data"])
    # duplicated docs -> fan-out -> raise
    with pytest.raises(ValueError, match="exactly the absorbed docs"):
        idx.add_terms(seed.unionByName(seed), ["data"])
    # the failed attempts left the standing state usable and unchanged
    assert idx.terms == ["doc"]
    assert idx.score().count() == seed.count()
    idx.release()
