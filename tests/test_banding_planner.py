"""Adaptive LSH banding planner (round-4 scale fix).

The sf1 sweep showed fixed banding parameters make random-collision
candidate volume grow ∝ n² on near-orthogonal embeddings (NOTES_r4 §2).
``plan_banding`` closes that: planes/band grow with log2(n) so the expected
per-row candidate load stays bounded, while bands are solved from the
Goemans-Williamson collision model to keep recall at the target.
"""

from __future__ import annotations

import math

from etl_file_loader_spark import fixtures
from etl_file_loader_spark.operators import dedup as dedup_ops
from etl_file_loader_spark.operators import similarity as sim_ops


def _recall(threshold: float, bands: int, planes: int) -> float:
    p = 1.0 - math.acos(threshold) / math.pi
    return 1.0 - (1.0 - p**planes) ** bands


def test_recall_model_satisfied_across_sizes():
    for n in (100, 10_000, 1_000_000, 100_000_000, 10_000_000_000):
        b, r = sim_ops.plan_banding(n, threshold=0.9, target_recall=0.9)
        assert _recall(0.9, b, r) >= 0.9, (n, b, r)


def test_planes_grow_with_log_n_and_load_stays_bounded():
    prev_r = 0
    for n in (1_000, 100_000, 10_000_000, 1_000_000_000):
        b, r = sim_ops.plan_banding(
            n, threshold=0.9, target_recall=0.9, candidates_per_row=64
        )
        assert r >= prev_r  # monotone: bigger corpus -> finer buckets
        prev_r = r
        # the budget the planner promises: b * n / 2^r candidates per row
        assert b * n / 2**r <= 64, (n, b, r)


def test_tiny_inputs_degenerate_gracefully():
    assert sim_ops.plan_banding(0, 0.9) == (1, 1)
    assert sim_ops.plan_banding(1, 0.9) == (1, 1)
    b, r = sim_ops.plan_banding(10, 0.9)
    assert b >= 1 and r >= 1


def test_exact_threshold_needs_one_band():
    # threshold=1.0 -> per-plane agreement 1.0 -> any single band recalls all
    b, r = sim_ops.plan_banding(1_000_000, threshold=1.0)
    assert b == 1


def test_low_threshold_hits_band_cap_not_infinite_loop():
    # threshold 0 -> p=0.5: planes can't prune without killing recall; the
    # planner must terminate and respect the band cap
    b, r = sim_ops.plan_banding(
        10_000_000, threshold=0.0, target_recall=0.95, max_bands=64
    )
    assert 1 <= b <= 64 and 1 <= r <= 24
    assert _recall(0.0, b, r) >= 0.95 or b == 64  # cap may bind instead


def test_auto_banding_knn_recall_on_clustered_fixture(spark):
    """End-to-end: num_bands=None plans the banding from the data size and
    still finds the true neighbors on the clustered fixture."""
    n = 400
    emb = fixtures.clustered_embeddings(spark, n=n)
    exact = {
        (row.vec_id, row.neighbor_id)
        for row in sim_ops.knn_join_exact(emb, "vec_id", "embedding", k=3).collect()
    }
    approx = {
        (row.vec_id, row.neighbor_id)
        for row in sim_ops.knn_join_lsh(
            emb,
            "vec_id",
            "embedding",
            k=3,
            num_bands=None,
            planes_per_band=None,
            recall_threshold=0.9,
            n_rows=n,
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_lsh_index_partition_pruned(spark, tmp_path):
    """write_lsh_index -> lsh_topk_indexed: identical results to the
    recompute path, and the bucket predicate lands in PartitionFilters
    (pruned at file listing, not row filtering)."""
    from etl_file_loader_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "lsh_index")
    sim.write_lsh_index(emb, path, "vec_id", "embedding", num_planes=4)
    qv = [float(x) for x in emb.limit(1).collect()[0].embedding]
    live = sim.lsh_topk(
        emb, "vec_id", "embedding", qv, k=5, num_planes=4, n_probe=2
    ).collect()
    indexed_df = sim.lsh_topk_indexed(
        spark, path, "vec_id", "embedding", qv, k=5, num_planes=4, n_probe=2
    )
    assert indexed_df.collect() == live
    plan = indexed_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the bucket predicate must be in the partition filters, not a row filter
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("bucket" in ln for ln in pf)


def test_ivf_index_roundtrip_partition_pruned(spark, tmp_path):
    """write_ivf_index -> ivf_topk_indexed: quantizer round-trips through
    the ml writer, results match the in-memory search, bucket probes land
    in PartitionFilters."""
    from etl_file_loader_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf_index")
    idx = sim.write_ivf_index(emb, path, "vec_id", "embedding", n_lists=4)
    qv = [float(x) for x in emb.limit(1).collect()[0].embedding]
    live = idx.search(
        idx.assign(emb, "embedding"), "vec_id", "embedding", qv, k=5, n_probe=2
    ).collect()
    indexed_df = sim.ivf_topk_indexed(
        spark, path, "vec_id", "embedding", qv, k=5, n_probe=2
    )
    assert indexed_df.collect() == live
    plan = indexed_df._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("_ivf_bucket" in ln for ln in pf)


def test_auto_banding_pairs_match_fixed_on_clustered_fixture(spark):
    """The auto-planned embedding_cosine_pairs_lsh finds the same high-cosine
    pairs the exact operator does (recall gate) on the clustered fixture."""
    n = 300
    emb = fixtures.clustered_embeddings(spark, n=n)
    exact = {
        (row.id_a, row.id_b)
        for row in dedup_ops.embedding_cosine_pairs(
            emb, "vec_id", "embedding", threshold=0.9
        ).collect()
    }
    approx = {
        (row.id_a, row.id_b)
        for row in dedup_ops.embedding_cosine_pairs_lsh(
            emb,
            "vec_id",
            "embedding",
            threshold=0.9,
            num_bands=None,
            planes_per_band=None,
            n_rows=n,
        ).collect()
    }
    assert exact, "fixture must contain near-dup pairs"
    assert len(exact & approx) / len(exact) >= 0.9
