"""Per-scale IVF recall floors (ADVICE r11 #4).

The driver row similarity_ivf_recall gates at a single 70% floor because
its static oracle literal cannot depend on scale. The measurements ARE
deterministic per dataset though (md5-seeded quantizer, fixed testdata),
so the sharper per-scale floors live here where sf_dir is known:
recall@10 measured 100% at sf0.001 and 80% at sf0.01 — a regression
below 100/80 at those scales is a real behavior change, not noise.
"""

import pytest

from etl_file_loader_spark.suite.similarity import (
    q_similarity_ivf_topk,
    q_similarity_topk,
)


@pytest.mark.parametrize(
    "sf_dir,floor_pct",
    [("/root/testdata/sf0.001", 100), ("/root/testdata/sf0.01", 80)],
)
def test_ivf_recall_per_scale_floor(spark, sf_dir, floor_pct):
    exact = {r.vec_id for r in q_similarity_topk(spark, sf_dir).collect()}
    approx = {r.vec_id for r in q_similarity_ivf_topk(spark, sf_dir).collect()}
    recall = 100 * len(exact & approx) / len(exact)
    assert recall >= floor_pct, (
        f"ivf recall@10 regressed at {sf_dir}: {recall:.0f}% < {floor_pct}%"
    )
