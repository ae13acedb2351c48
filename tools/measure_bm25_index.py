"""Scale probe for BM25Index: standing-query scoring from postings vs
re-tokenizing the corpus per query (the claim the index exists to win).

Usage: python tools/measure_bm25_index.py [sf_dir]   (default /tmp/sf10)

Build the index once over the corpus, then time K repeated rankings from
postings against K scan-time bm25_score runs over the raw text — the
"standing decontamination probe / domain watchlist re-ranked per ingest
epoch" access pattern.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_file_loader_spark.operators.text import BM25Index, bm25_score  # noqa: E402
from etl_file_loader_spark.session import get_spark  # noqa: E402

TERMS = ["window", "merge", "scan"]
K_QUERIES = 5


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    spark = get_spark("measure-bm25-index")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    print(f"documents: {n:,}")

    t0 = time.time()
    idx = BM25Index(docs, "doc_id", "text", TERMS)
    t_build = time.time() - t0
    print(f"one-time build (tokenize once into postings): {t_build:.1f}s")

    t0 = time.time()
    for _ in range(K_QUERIES):
        idx.topk(10).collect()
    t_idx = time.time() - t0
    print(f"{K_QUERIES} rankings from postings: {t_idx:.1f}s "
          f"({t_idx / K_QUERIES:.2f}s each)")

    t0 = time.time()
    for _ in range(K_QUERIES):
        (
            bm25_score(docs, "doc_id", "text", TERMS)
            .orderBy("bm25", ascending=False)
            .limit(10)
            .collect()
        )
    t_scan = time.time() - t0
    print(f"{K_QUERIES} scan-time rankings (re-tokenize): {t_scan:.1f}s "
          f"({t_scan / K_QUERIES:.2f}s each; postings path is "
          f"{t_scan / t_idx:.1f}x faster)")
    spark.stop()


if __name__ == "__main__":
    main()
