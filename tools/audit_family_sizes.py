"""Duplication-density audit: predict near-dedup pair-work BEFORE a run.

Usage: python tools/audit_family_sizes.py [sf_dir] [--bits=60] [--blocks=4]
       [--bands=4] [--rows-per-band=4] [--text-col=text] [--id-col=doc_id]

The lesson from the sf10 scale sweep (NOTES_r6 §8): superlinear pair costs
in `simhash_dedup` / `minhash` LSH are a property of the DATA SHAPE (near-dup
family sizes), not of the operators — ~80-member families turned candidate
verification into Sigma family^2 work. This tool makes that visible up
front, from exactly the bucketings the operators will use:

 - SimHash block buckets (the (block_idx, block_val) equi-join key of
   `simhash_pairs_blocked` / `simhash_dedup` after the fingerprint-quotient
   collapse): per-bucket member histogram + the EXACT candidate-pair count
   Sigma m(m-1)/2 those buckets will feed into hamming verification.
 - MinHash LSH band buckets (the (band_idx, band_hash) key of
   `lsh_candidate_pairs`): same histogram + pair count.
 - The exact-duplicate quotient (docs per distinct md5(text)) — how much
   the fingerprint-quotient collapse buys before any pairwise stage.

Output is one JSON object on stdout, suitable for committing next to a
bench record. Costs a handful of aggregates over the corpus — run it on a
sample (or a small sf) to budget a 100 TB job; if predicted simhash pairs
blow up, compose MinHash near-dedup first (CurationConfig.simhash_dedup)
or set `max_family_size` (see dedup.simhash_dedup docstring).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_file_loader_spark.operators import dedup as dedup_ops  # noqa: E402
from etl_file_loader_spark.session import get_spark  # noqa: E402

# histogram edges for bucket-member counts (left-inclusive)
_EDGES = [2, 3, 5, 9, 17, 33, 65, 129, 1025]


def _bucket_report(members: DataFrame, id_col: str, bucket_cols: list[str]) -> dict:
    """Histogram of bucket sizes + exact candidate-pair count for a
    (member, bucket) frame — one aggregate pass, never materializes pairs."""
    sizes = members.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("m"))
    labels = []
    aggs = [
        F.count(F.lit(1)).alias("buckets"),
        F.sum(F.col("m")).alias("members"),
        F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("candidate_pairs"),
        F.max("m").alias("max_bucket"),
    ]
    lo = 2
    for hi in _EDGES[1:] + [None]:
        label = f"{lo}+" if hi is None else f"{lo}-{hi - 1}"
        cond = F.col("m") >= lo if hi is None else (F.col("m") >= lo) & (F.col("m") < hi)
        aggs.append(F.sum(cond.cast("long")).alias(f"h_{label}"))
        labels.append(label)
        lo = hi
        if hi is None:
            break
    row = sizes.filter(F.col("m") >= 2).agg(*aggs).collect()[0]
    return {
        "buckets_ge2": int(row["buckets"] or 0),
        "members_in_those": int(row["members"] or 0),
        "candidate_pairs": int(row["candidate_pairs"] or 0),
        "max_bucket": int(row["max_bucket"] or 0),
        "bucket_size_histogram": {lab: int(row[f"h_{lab}"] or 0) for lab in labels},
    }


def audit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
    blocks: int = 4,
    bands: int = 4,
    rows_per_band: int = 4,
) -> dict:
    """Full report over a documents frame (see module docstring)."""
    n_docs = docs.count()

    # exact-text quotient: what the fingerprint collapse removes up front
    q = (
        docs.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.count(F.lit(1)).alias("m"))
        .agg(
            F.count(F.lit(1)).alias("distinct_texts"),
            F.max("m").alias("max_family"),
            F.sum((F.col("m") > 1).cast("long")).alias("families_ge2"),
        )
        .collect()[0]
    )

    # simhash block buckets over the fingerprint quotient (what
    # simhash_dedup actually joins on)
    sh = dedup_ops.simhash(docs, id_col, text_col, bits=bits).persist()
    reps = sh.groupBy("simhash").agg(F.min(F.col(id_col)).alias(id_col))
    width = bits // blocks
    mask = (1 << width) - 1
    slices = F.array(
        *[
            F.struct(
                F.lit(b).alias("block_idx"),
                F.shiftright(F.col("simhash"), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("block_val"),
            )
            for b in range(blocks)
        ]
    )
    block_rows = reps.select(F.col(id_col), F.explode(slices).alias("_b")).select(
        id_col, "_b.block_idx", "_b.block_val"
    )
    simhash_report = _bucket_report(block_rows, id_col, ["block_idx", "block_val"])
    n_fingerprints = reps.count()
    sh.unpersist()

    # minhash LSH band buckets (the near-dedup candidate key)
    sig = dedup_ops.minhash_signatures(
        docs, id_col, text_col, num_hashes=bands * rows_per_band
    )
    band_rows = dedup_ops._band_rows(sig, id_col, bands, rows_per_band)
    minhash_report = _bucket_report(band_rows, id_col, ["band_idx", "band_hash"])

    return {
        "docs": n_docs,
        "exact_quotient": {
            "distinct_texts": int(q["distinct_texts"]),
            "families_ge2": int(q["families_ge2"]),
            "max_family": int(q["max_family"]),
        },
        "simhash_blocks": {
            "bits": bits,
            "blocks": blocks,
            "distinct_fingerprints": n_fingerprints,
            **simhash_report,
        },
        "minhash_bands": {
            "bands": bands,
            "rows_per_band": rows_per_band,
            **minhash_report,
        },
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--") and "=" in a
    )
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    report = audit(
        docs,
        id_col=opts.get("id-col", "doc_id"),
        text_col=opts.get("text-col", "text"),
        bits=int(opts.get("bits", 60)),
        blocks=int(opts.get("blocks", 4)),
        bands=int(opts.get("bands", 4)),
        rows_per_band=int(opts.get("rows-per-band", 4)),
    )
    report["sf_dir"] = sf_dir
    print(json.dumps(report))


if __name__ == "__main__":
    main()
