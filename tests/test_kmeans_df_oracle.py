"""Numeric guarantees behind the deterministic-k-means IVF value oracle.

Round 11 moved similarity_ivf_topk off the rows-only list by switching it
to operators.similarity.KMeansDF — md5-seeded init, fixed Lloyd
iterations, per-update rounded centroids — and replaying the ENTIRE fit in
DuckDB (suite/similarity.py:kmeans_cte). That replay is sound only if the
two engines' double arithmetic can never disagree on (a) an assignment
argmin, (b) a rounded centroid mean, or (c) the probe cutoff. These tests
measure all three margins on the driver's data (a regenerated dataset that
violates them fails HERE, not as a driver hash mismatch) and assert the
replayed centroids are EXACTLY equal after every iteration.
"""

import math
import os

import duckdb
import numpy as np
import pytest

from etl_file_loader_spark.operators.similarity import IVFIndexDF, KMeansDF
from etl_file_loader_spark.suite.similarity import kmeans_cte

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

K, ITERS, ROUND_TO = 8, 5, 6


def _con(sf_dir):
    con = duckdb.connect()
    p = f"{sf_dir}/embeddings.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{src}'")
    return con


def _numpy_fit_with_margins(sf_dir):
    """Reference replay in numpy mirroring KMeansDF.fit exactly, collecting
    the margin statistics the engine-agreement argument rests on."""
    import pandas as pd
    import hashlib

    p = f"{sf_dir}/embeddings.parquet"
    df = pd.read_parquet(p)
    ids = df["vec_id"].to_numpy()
    vecs = np.stack(df["embedding"].to_numpy()).astype("float64")
    order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]),
    )
    centers = vecs[order[:K]].copy()
    history = [centers.copy()]
    min_assign_gap = math.inf
    min_round_gap = math.inf
    for _ in range(ITERS):
        d = ((vecs[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        part = np.partition(d, 1, axis=1)
        min_assign_gap = min(min_assign_gap, float((part[:, 1] - part[:, 0]).min()))
        new = centers.copy()
        for c in range(K):
            mask = assign == c
            if mask.any():
                mean = vecs[mask].mean(axis=0)
                # distance of each mean from its round-half boundary at
                # ROUND_TO decimals — the rounding-flip hazard measure
                frac = np.abs(np.abs(mean) * 10**ROUND_TO % 1.0 - 0.5)
                min_round_gap = min(min_round_gap, float(frac.min()))
                new[c] = np.round(mean, ROUND_TO)
        centers = new
        history.append(centers.copy())
    return history, min_assign_gap, min_round_gap


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_margins_dominate_summation_noise(sf_dir):
    _, assign_gap, round_gap = _numpy_fit_with_margins(sf_dir)
    # engines differ only by double summation order: ~1e-15 relative per
    # term over 64 terms of O(1) squared distance -> ~1e-14 absolute, so a
    # flipped argmin needs a gap below ~2e-14 and a flipped rounding needs
    # a mean within ~1e-14 of a half boundary (1e-8 after the 10^6 scale).
    # Measured: assignment 1.8e-7 (sf0.001), rounding >= 1e-5 — the
    # thresholds below still leave >= 3-4 orders of headroom.
    assert assign_gap > 1e-10, f"assignment argmin margin collapsed: {assign_gap}"
    assert round_gap > 1e-6, f"rounding boundary margin collapsed: {round_gap}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_duckdb_replay_matches_spark_every_iteration(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    km = KMeansDF(k=K, iters=ITERS, round_to=ROUND_TO).fit(emb, "vec_id", "embedding")
    con = _con(sf_dir)
    for i in range(ITERS + 1):
        rows = con.execute(
            f"WITH {kmeans_cte(K, ITERS, ROUND_TO)} "
            f"SELECT cid, cv FROM c{i} ORDER BY cid"
        ).fetchall()
        got = [list(cv) for _, cv in rows]
        assert got == km.history[i], f"centroids diverged at iteration {i}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_bucket_assignment_and_probe_boundary(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = IVFIndexDF(n_lists=K, iters=ITERS, round_to=ROUND_TO).fit(emb, "embedding")
    spark_buckets = {
        r.vec_id: r._ivf_bucket
        for r in idx.assign(emb, "embedding").select("vec_id", "_ivf_bucket").collect()
    }
    con = _con(sf_dir)
    duck_buckets = dict(
        con.execute(
            f"""
WITH {kmeans_cte(K, ITERS, ROUND_TO)}
SELECT vec_id, cid FROM (
  SELECT v.vec_id, c.cid, row_number() OVER (
    PARTITION BY v.vec_id ORDER BY
      list_sum(list_transform(list_zip(v.vec, c.cv),
                              x -> (x[1] - x[2]) * (x[1] - x[2]))), c.cid) AS rn
  FROM v CROSS JOIN c{ITERS} c) WHERE rn = 1
"""
        ).fetchall()
    )
    assert spark_buckets == duck_buckets

    # probe cutoff (6 of 8 centroids): the 6th/7th distance gap must be
    # strict so ORDER BY d, cid LIMIT 6 picks the same probe SET
    import pandas as pd

    qv = np.asarray(
        pd.read_parquet(f"{sf_dir}/embeddings.parquet")
        .set_index("vec_id")
        .loc[0, "embedding"],
        dtype="float64",
    )
    dists = sorted(((qv - np.asarray(c)) ** 2).sum() for c in idx.km.centers)
    gap = dists[6] - dists[5]
    assert gap > 1e-9, f"probe boundary gap collapsed: {gap}"


def test_empty_cluster_keeps_previous_centroid(spark):
    # force an empty cluster deterministically: the two md5-smallest ids
    # carry IDENTICAL vectors, so init yields two equal centroids and the
    # argmin tiebreak (lowest cluster id) starves the second one on
    # iteration 1. Contract: the starved cluster CARRIES its previous
    # centroid (replayable), never NaN/reseed — and the DuckDB CTE chain
    # agrees on every iteration including the starved ones.
    import hashlib
    import pandas as pd

    ids = list(range(6))
    by_md5 = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    vecs = {by_md5[0]: [0.0, 0.0], by_md5[1]: [0.0, 0.0], by_md5[2]: [10.0, 10.0]}
    for i, rest in enumerate(by_md5[3:]):
        vecs[rest] = [0.2, 0.0] if i == 0 else [10.2, 10.0]
    pts = [(i, vecs[i]) for i in ids]
    df = spark.createDataFrame(pts, ["vec_id", "embedding"])
    km = KMeansDF(k=3, iters=3).fit(df, "vec_id", "embedding")
    # iteration 1: both [0,0] points tie between c0 and c1 -> c0 wins the
    # tiebreak, c1 is empty and must keep its init centroid
    assert km.history[1][1] == km.history[0][1] == [0.0, 0.0]
    # c0 absorbed the zero points plus [0.2, 0]
    assert km.history[1][0] != km.history[0][0]
    assert all(all(math.isfinite(x) for x in c) for c in km.centers)

    # the replay handles the carry-over identically (the COALESCE branch)
    con = duckdb.connect()
    con.register(
        "embeddings", pd.DataFrame({"vec_id": ids, "embedding": [vecs[i] for i in ids]})
    )
    for i in range(4):
        rows = con.execute(
            f"WITH {kmeans_cte(3, 3)} SELECT cid, cv FROM c{i} ORDER BY cid"
        ).fetchall()
        assert [list(cv) for _, cv in rows] == km.history[i], f"iteration {i}"


def test_ivf_search_matches_full_oracle(spark):
    # end-to-end: the suite row vs its registered oracle at sf0.001
    from etl_file_loader_spark.suite.similarity import (
        Q_SIMILARITY_IVF_TOPK_SQL,
        q_similarity_ivf_topk,
    )

    got = [
        (r.vec_id, r.score)
        for r in q_similarity_ivf_topk(spark, "/root/testdata/sf0.001").collect()
    ]
    con = _con("/root/testdata/sf0.001")
    want = con.execute(Q_SIMILARITY_IVF_TOPK_SQL).fetchall()
    assert got == [(v, s) for v, s in want]
