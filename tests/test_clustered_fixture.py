"""Clustered-embedding fixture + ANN pruning gate (VERDICT r2 task 4)."""

from __future__ import annotations

from etl_file_loader_spark import fixtures, suite
from etl_file_loader_spark.operators import dedup as dedup_ops
from etl_file_loader_spark.operators import similarity as sim_ops


def test_fixture_deterministic(spark):
    a = fixtures.clustered_embeddings(spark, n=50).collect()
    b = fixtures.clustered_embeddings(spark, n=50).collect()
    assert a == b
    assert len(a) == 50 and len(a[0].embedding) == 64
    # round 11: deliberately NOT unit-normalized (bit-exact cross-engine
    # contract — see the fixture docstring); |v| ~ sqrt(dim/12) ~ 2.31
    norm2 = sum(x * x for x in a[0].embedding)
    assert 2.0 < norm2 < 9.0


def test_clustered_gate_passes(spark):
    """Recall >= 90% AND candidate density < 20% on clustered embeddings —
    the pruning case the near-orthogonal testdata cannot demonstrate."""
    rows = {
        r.metric: r.passed
        for r in suite.QUERIES["dedup_embedding_clustered_recall"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert rows == {
        "clustered_pair_recall": 1,
        "clustered_candidate_density": 1,
    }


def test_clustered_density_measured(spark):
    """The density isn't just under the gate — it's an order of magnitude
    under: bucketed candidates ~6% of all pairs at n=600."""
    n = 600
    emb = fixtures.clustered_embeddings(spark, n=n)
    banded = sim_ops.hyperplane_lsh_bands(emb, "vec_id", "embedding", 8, 8)
    cand = dedup_ops._bucket_join_pairs(
        banded.select("vec_id", "band", "bucket"), "vec_id", ["band", "bucket"]
    ).count()
    density = cand / (n * (n - 1) / 2)
    assert density < 0.12, f"candidate density {density:.1%}"
