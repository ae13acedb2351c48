"""Versioned incremental curation runs (round 5): corpus v(N+1) grows by a
curated delta only — no old-vs-old rework, stable held-out split, manifests
reconciled per version."""

import os

import pytest
from pyspark.sql import functions as F

from etl_file_loader_spark.plans.curation import CurationConfig, VersionedCorpus


def _doc(i: int, salt: str) -> str:
    # unique per-doc vocabulary so distinct docs are NOT near-duplicates
    body = " ".join(f"w{salt}{i}x{j}" for j in range(12))
    return f"{salt} {body} document number {i}"


@pytest.fixture
def corpus_config():
    return CurationConfig(
        min_quality=None,
        scrub_pii=False,
        near_dedup=True,
        split_fractions={"train": 0.8, "heldout": 0.2},
        keep_splits=("train",),
        shard_budget_tokens=64,
        partition_cols=["lang"],
    )


def _snapshot(path):
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            out[p] = (st.st_size, st.st_mtime_ns)
    return out


def test_versioned_corpus_two_runs(spark, tmp_path, corpus_config):
    vc = VersionedCorpus(spark, str(tmp_path / "corpus"), corpus_config)
    assert vc.latest_version() == 0

    batch1 = spark.createDataFrame(
        [(i, _doc(i, "v1"), "en" if i % 2 else "de") for i in range(40)],
        "doc_id long, text string, lang string",
    )
    r1 = vc.ingest(batch1)
    assert r1.version == 1
    v1_docs = {r["doc_id"]: r for r in vc.read_docs(1).collect()}
    assert len(v1_docs) == 40  # all distinct -> all kept, every split stored

    # batch 2: 5 exact copies of v1 texts, 5 near-dups of v1, 2 internal
    # exact dups, 8 genuinely new docs
    rows = []
    for j in range(5):
        rows.append((100 + j, _doc(j, "v1"), "en"))                # exact vs v1
    for j in range(5):
        rows.append((110 + j, _doc(10 + j, "v1") + " tail", "en"))  # near vs v1
    rows.append((120, _doc(500, "v2"), "en"))
    rows.append((121, _doc(500, "v2"), "en"))                       # internal dup
    for j in range(8):
        rows.append((130 + j, _doc(600 + j, "v2"), "de"))
    batch2 = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    before = _snapshot(str(tmp_path / "corpus" / "delta_v1"))
    r2 = vc.ingest(batch2)
    after = _snapshot(str(tmp_path / "corpus" / "delta_v1"))

    assert r2.version == 2
    # old delta untouched byte-for-byte: no old-vs-old rework
    assert before == after

    c = r2.stage_counts
    assert c["input"] == 20
    assert c["delta_vs_corpus_exact"] == 15          # 5 exact copies dropped
    assert c["delta_vs_corpus_near"] == 10           # 5 near-dups dropped
    assert c["within_delta_dedup"] == 9              # internal dup collapsed
    assert c["delta_docs"] == 9

    # v2 = v1 ∪ curated delta; v1 rows identical (text, split, shard)
    v2 = vc.read_docs(2).collect()
    assert len(v2) == 49
    for r in v2:
        if r["corpus_version"] == 1:
            old = v1_docs[r["doc_id"]]
            assert (r["text"], r["split"], r["shard_id"]) == (
                old["text"], old["split"], old["shard_id"]
            )

    # held-out split is stable and recorded for every doc
    splits = {r["doc_id"]: r["split"] for r in v2}
    assert set(splits.values()) <= {"train", "heldout"}
    assert any(s == "heldout" for s in splits.values())

    # manifests reconcile per version: token sums match the packed docs
    man = vc.manifest(2).collect()
    assert {r["corpus_version"] for r in man} == {1, 2}
    docs = vc.read_docs(2)
    for v in (1, 2):
        m_tokens = sum(r["tokens"] for r in man if r["corpus_version"] == v)
        d_tokens = docs.filter(
            (F.col("corpus_version") == v) & (F.col("split") == "train")
        ).agg(F.sum("n_tokens")).collect()[0][0]
        assert m_tokens == d_tokens

    # registry is consistent
    assert vc.versions() == [1, 2]


def test_versioned_corpus_empty_root_raises(spark, tmp_path, corpus_config):
    vc = VersionedCorpus(spark, str(tmp_path / "nothing"), corpus_config)
    with pytest.raises(FileNotFoundError):
        vc.read_docs()


def test_curation_pipeline_with_subword_tokenizer(spark, corpus_config):
    """CurationConfig.tokenizer threads the seam end-to-end: subword
    budgets exceed whitespace budgets on the same docs, changing packing."""
    from dataclasses import replace

    from etl_file_loader_spark.functions.tokenizers import SubwordTokenizer
    from etl_file_loader_spark.plans.curation import CurationPipeline

    docs = spark.createDataFrame(
        [(i, _doc(i, "tk"), "en") for i in range(20)],
        "doc_id long, text string, lang string",
    )
    ws = CurationPipeline(corpus_config).run(docs)
    sub = CurationPipeline(
        replace(corpus_config, tokenizer=SubwordTokenizer(4))
    ).run(docs)
    ws_tokens = sum(r["n_tokens"] for r in ws.packed.collect())
    sub_tokens = sum(r["n_tokens"] for r in sub.packed.collect())
    # per-doc unique words like 'wtk3x7' (6 chars) split into 2 subword
    # pieces each -> strictly more budget under the subword tokenizer
    assert sub_tokens > ws_tokens
    assert sub.stage_counts["packed"] == ws.stage_counts["packed"]  # same docs
    # more tokens at the same budget -> at least as many shards
    assert (max(r["shard_id"] for r in sub.packed.collect())
            >= max(r["shard_id"] for r in ws.packed.collect()))
