"""Numeric-margin guarantees behind the hyperplane-LSH value oracles.

The round-11 oracles (similarity_lsh_topk / knn_join_lsh /
dedup_embedding_pairs_lsh) replay the md5-derived plane projections in
DuckDB and compare full result values against Spark's numpy-matmul
bucketing. That comparison is sound only if no projection sits close
enough to zero for double-summation-order differences (~1e-13 relative)
to flip a sign, and the multi-probe cutoff is strict. These tests pin
both margins on the driver's test data so a regenerated dataset that
violates them fails HERE, not as an inscrutable driver hash mismatch.
"""

import duckdb
import pytest

from etl_file_loader_spark.suite.similarity import lsh_proj_cte

import os

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"] + [
    # locally-generated scale dirs (tools/gen_scale_data.py), when present:
    # the margins must hold wherever the replay oracles run
    d
    for d in ["/tmp/sf1"]
    if os.path.isdir(f"{d}/embeddings.parquet")
]


def _con(sf_dir):
    import os

    con = duckdb.connect()
    p = f"{sf_dir}/embeddings.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{src}'")
    return con


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_projection_sign_margin(sf_dir):
    con = _con(sf_dir)
    (m,) = con.execute(
        f"WITH {lsh_proj_cte(16)} SELECT min(abs(proj)) FROM proj"
    ).fetchone()
    # measured 2.3e-4 at sf0.01; anything above 1e-6 leaves >= 7 orders
    # of magnitude of headroom over double summation-order noise
    assert m > 1e-6, f"projection sign margin collapsed: min |proj| = {m}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_multi_probe_boundary_strict(sf_dir):
    # q_similarity_lsh_topk probes the 8 cheapest of 16 buckets; the
    # oracle's ORDER BY cost LIMIT 8 is unambiguous only if the 8th and
    # 9th cheapest costs differ (ties inside the top 8 are harmless —
    # the SET is what matters)
    con = _con(sf_dir)
    costs = [
        r[0]
        for r in con.execute(
            f"""
WITH {lsh_proj_cte(4)},
qproj AS (SELECT p, proj FROM proj WHERE vec_id = 0),
base AS (SELECT CAST(sum(CASE WHEN proj >= 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS b FROM qproj)
SELECT COALESCE(sum(CASE WHEN ((xor(cb.b, base.b) >> qp.p) & 1) = 1
                         THEN abs(qp.proj) END), 0) AS cost
FROM (SELECT unnest(range(0, 16)) AS b) cb
CROSS JOIN base CROSS JOIN qproj qp
GROUP BY cb.b ORDER BY cost
"""
        ).fetchall()
    ]
    assert len(costs) == 16
    gap = costs[8] - costs[7]
    assert gap > 1e-9, f"probe cutoff ambiguous: 8th/9th cost gap = {gap}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_duckdb_buckets_match_spark(sf_dir, spark):
    """End-to-end sign agreement: every vector's 4-plane bucket identical
    between the DuckDB replay and hyperplane_lsh_buckets' Arrow matmul."""
    from etl_file_loader_spark.operators import similarity as sim_ops

    con = _con(sf_dir)
    duck = dict(
        con.execute(
            f"""
WITH {lsh_proj_cte(4)}
SELECT vec_id, CAST(sum(CASE WHEN proj >= 0 THEN 1 << p ELSE 0 END) AS BIGINT)
FROM proj GROUP BY 1
"""
        ).fetchall()
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sp = {
        r["vec_id"]: r["bucket"]
        for r in sim_ops.hyperplane_lsh_buckets(
            emb, "vec_id", "embedding", 4
        ).collect()
    }
    assert sp == duck
