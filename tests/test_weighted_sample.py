"""Behavioral + margin guarantees for weighted_sample (Efraimidis-
Spirakis exponential races, operators/sampling.py).

The full-value oracle (suite weighted_sample_check) replays ln(u)/w and
the (key DESC, id) selection in DuckDB; engines can only disagree if two
keys near the kth/k+1th boundary sit within float-noise of each other
(~1 ulp of libm ln). The margin test measures that boundary gap on the
driver's data so a regenerated dataset that collapses it fails HERE."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_file_loader_spark.operators import sampling as sampling_ops

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _key(doc_id: int, w: float) -> float:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
    return math.log((h + 1) / float(1 << 60)) / w


def test_matches_python_replay(spark):
    rows = [(i, float(1 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = {
        (r.doc_id, r.sample_rank)
        for r in sampling_ops.weighted_sample(df, "doc_id", "w", k=10).collect()
    }
    order = sorted(rows, key=lambda t: (-_key(t[0], t[1]), t[0]))
    want = {(doc_id, rank + 1) for rank, (doc_id, _) in enumerate(order[:10])}
    assert got == want


def test_weight_proportionality(spark):
    # two weight classes, 10:1 — across many disjoint groups the heavy
    # class should win the single slot far more often (A-ES correctness,
    # statistically). 500 groups of {heavy, light}; deterministic data so
    # the observed rate is a fixed number: assert it sits in a generous
    # proportional band around 10/11.
    rows = []
    for g in range(500):
        rows.append((2 * g, f"g{g}", 10.0))
        rows.append((2 * g + 1, f"g{g}", 1.0))
    df = spark.createDataFrame(rows, ["doc_id", "grp", "w"])
    picked = sampling_ops.weighted_sample(df, "doc_id", "w", k=1, group_cols=["grp"])
    heavy_wins = picked.filter(F.col("doc_id") % 2 == 0).count()
    # E[wins] = 500 * 10/11 ~ 454.5, sigma ~ 6.4; allow 5 sigma
    assert 420 <= heavy_wins <= 490


def test_zero_and_negative_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, 2.0)], ["doc_id", "w"]
    )
    got = {r.doc_id for r in sampling_ops.weighted_sample(df, "doc_id", "w", k=10).collect()}
    assert got == {1, 4}


def test_rank_pushdown_plan(spark):
    df = spark.createDataFrame([(i, "g", 1.0 + i) for i in range(100)],
                               ["doc_id", "grp", "w"])
    capped = sampling_ops.weighted_sample(df, "doc_id", "w", k=3, group_cols=["grp"])
    plan = capped._jdf.queryExecution().executedPlan().toString()
    # the map-side partial top-k must appear below the exchange
    assert "WindowGroupLimit" in plan


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_selection_boundary_margin(sf_dir):
    import pandas as pd

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs = docs[docs["n_chars"] > 0]
    min_gap = math.inf
    for _, grp in docs.groupby("lang"):
        keys = np.sort(
            [-_key(i, w) for i, w in zip(grp["doc_id"], grp["n_chars"])]
        )
        if len(keys) > 5:
            min_gap = min(min_gap, float(keys[5] - keys[4]))
    # libm ln noise is ~1 ulp (~1e-16 relative on keys of magnitude
    # ~1e-4..1e-2); measured gap orders above that
    assert min_gap > 1e-12, f"selection boundary margin collapsed: {min_gap}"
