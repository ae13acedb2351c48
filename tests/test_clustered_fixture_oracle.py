"""Bit-exactness of the md5-derived clustered fixture across engines.

The round-11 fixture change (fixtures.clustered_embeddings: md5 uniforms,
NO normalization) exists so the *_clustered suite rows can carry full
value oracles. The entire soundness argument is that every float32
component is one correctly-rounded double add of exactly-representable
inputs — these tests assert the resulting values are BIT-IDENTICAL
between the Spark/numpy fixture and the DuckDB CTE replay
(suite/similarity.py:clustered_fixture_cte), and that the downstream
LSH sign margins on the fixture dominate float noise."""

import math

import duckdb
import numpy as np

from etl_file_loader_spark import fixtures
from etl_file_loader_spark.suite.similarity import clustered_fixture_cte


def _duck_fixture(n, **kw):
    con = duckdb.connect()
    rows = con.execute(
        f"WITH {clustered_fixture_cte(n, **kw)} "
        "SELECT vec_id, label, embedding FROM fx ORDER BY vec_id"
    ).fetchall()
    return rows


def test_fixture_bit_identical_across_engines(spark):
    n = 300
    srows = sorted(
        (r.vec_id, r.label, tuple(r.embedding))
        for r in fixtures.clustered_embeddings(spark, n=n).collect()
    )
    drows = sorted((v, l, tuple(e)) for v, l, e in _duck_fixture(n))
    assert len(srows) == len(drows) == n
    for (sv, sl, se), (dv, dl, de) in zip(srows, drows):
        assert (sv, sl) == (dv, dl)
        # float32 equality must be EXACT — any mismatch breaks every
        # downstream clustered oracle
        assert se == de, f"vec {sv} differs"


def test_fixture_bit_identical_k30_variant(spark):
    # the n=600, k=30 variant used by dedup suite rows
    srows = sorted(
        (r.vec_id, tuple(r.embedding))
        for r in fixtures.clustered_embeddings(spark, n=120, k=30).collect()
    )
    drows = sorted((v, tuple(e)) for v, _, e in _duck_fixture(120, k=30))
    assert srows == drows


def test_fixture_lsh_sign_margin():
    # projections of fixture vectors onto the md5 hyperplanes: the minimum
    # |projection| must dominate double summation-order noise (~1e-13) so
    # no band bucket can differ between the numpy matmul and the DuckDB
    # per-element sum. 64 planes covers the deepest banding used (8x8).
    from etl_file_loader_spark.operators.similarity import _plane_matrix

    emb = _duck_fixture(2000)
    vecs = np.array([list(e) for _, _, e in emb], dtype="float64")
    planes = _plane_matrix(64, 64)
    proj = vecs @ planes
    m = float(np.abs(proj).min())
    assert m > 1e-7, f"fixture LSH sign margin collapsed: {m}"


def test_fixture_cosine_structure():
    # intra-cluster cosine must clear the 0.9/0.95 gates' working range
    # and cross-cluster must sit far below — the separation the ANN
    # pruning demos rely on
    emb = _duck_fixture(400)
    vecs = np.array([list(e) for _, _, e in emb], dtype="float64")
    labels = np.array([l for _, l, _ in emb])
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    unit = vecs / norms
    sims = unit @ unit.T
    same = labels[:, None] == labels[None, :]
    iu = np.triu_indices(len(emb), 1)
    intra = sims[iu][same[iu]]
    cross = sims[iu][~same[iu]]
    assert intra.mean() > 0.93
    assert abs(cross.mean()) < 0.2
