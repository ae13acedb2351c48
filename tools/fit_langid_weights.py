"""Fit the langid fixture classifier and print the milli-unit constants
embedded in suite/text.py (the quality-classifier precedent:
tools/fit_quality_weights.py). Also reports train/holdout accuracy so the
threshold in the pytest gate stays honest.

Usage: python tools/fit_langid_weights.py [dim]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_file_loader_spark import fixtures  # noqa: E402
from etl_file_loader_spark.operators import text as text_ops  # noqa: E402
from etl_file_loader_spark.session import get_spark  # noqa: E402


def main() -> None:
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    spark = get_spark("fit-langid")
    docs = fixtures.langid_corpus(spark)
    # split on (doc_id // 4) so it is independent of the lang assignment
    # (lang = doc_id % 4): 75% train / 25% holdout, exactly lang-balanced
    train = docs.filter((F.col("doc_id") / 4).cast("long") % 4 != 0)
    hold = docs.filter((F.col("doc_id") / 4).cast("long") % 4 == 0)
    models = text_ops.fit_langid_nb(train, "text", "lang", dim=dim)

    for name, frame in (("train", train), ("holdout", hold)):
        scored = text_ops.langid_score(frame, "doc_id", "text", models)
        joined = scored.join(frame.select("doc_id", "lang"), "doc_id")
        per_lang = (
            joined.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("lang_pred") == F.col("lang")).cast("int")).alias("ok"),
            )
            .collect()
        )
        accs = {r["lang"]: r["ok"] / r["n"] for r in per_lang}
        bal = sum(accs.values()) / len(accs)
        print(f"{name}: balanced_acc={bal:.4f} per-lang={ {k: round(v, 4) for k, v in sorted(accs.items())} }")

    print(f"\n_LANGID_DIM = {dim}")
    print("_LANGID_MODELS = {")
    for lang in sorted(models):
        w, b = models[lang]
        print(f"    {lang!r}: ({w!r}, {b}),")
    print("}")
    spark.stop()


if __name__ == "__main__":
    main()
