"""Composed sf10 curation measurement (VERDICT r11 ask 7).

The round-11 pieces — stage 0a URL guard, HTML extraction, language-ID
gate, quality floor, and the maintained NearDupIndex — are each measured
separately at sf10; this tool measures them COMPOSED, the shape a real
crawl-curation job runs: one CurationPipeline pass (0a -> 0 -> 1 -> 1c ->
PII) over the 500k-doc corpus, then the survivors streamed through ONE
NearDupIndex in batches (seed + flag/absorb loop), ending with a durable
save of the band index (round 12's persistence path).

Barrier interactions are where composition diverges from the sum of parts
(NOTES_r9 found a 16x win there), so per-stage wall comes from the
pipeline's own on_stage hook — each stage already ends in exactly one
count job, so the hook's deltas ARE the stage costs.

Inputs are synthesized deterministically from the documents table with
the suite's own idioms (suite/web._synthetic_url URLs; suite/text HTML
wrapper), so the composed run exercises the same branch-complete shapes
the oracles check.

Usage: python tools/measure_curation_composed.py [sf_dir] [n_batches]
(defaults: /tmp/sf10, 8 — seed batch + 7 absorbed)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_file_loader_spark.operators import dedup as dedup_ops  # noqa: E402
from etl_file_loader_spark.plans.curation import (  # noqa: E402
    CurationConfig,
    CurationPipeline,
)
from etl_file_loader_spark.session import get_spark  # noqa: E402
from etl_file_loader_spark.suite.text import _html_fixture_expr  # noqa: E402
from etl_file_loader_spark.suite.web import _synthetic_url  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("curation-composed")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    # synthesize the crawl-shaped inputs the suite oracles exercise:
    # branch-complete URLs + boilerplate-wrapped HTML around the real text
    docs = docs.withColumn(
        "url", _synthetic_url(F.col("doc_id"), F.col("source"))
    ).withColumn("text", _html_fixture_expr())

    from etl_file_loader_spark.operators import web as web_ops

    # block 3 of the 23 synthetic registrable domains (suite/web fixture)
    some_domains = [
        r.d
        for r in docs.limit(2000)
        .select(
            web_ops.registrable_domain(
                web_ops.url_parse(F.col("url")).getField("host")
            ).alias("d")
        )
        .distinct()
        .orderBy("d")
        .limit(3)
        .collect()
    ]

    stage_rows: list[tuple[str, int, float]] = []
    cfg = CurationConfig(
        url_col="url",
        blocked_domains=tuple(some_domains),
        domain_cap=40_000,
        html_extract=True,
        min_quality=0.3,
        # langid_keep covers all four fixture languages: the gate is
        # deliberately pass-through on this corpus (documents' text is not
        # one of the fixture langs), so the measured cost is the full NB
        # scoring projection + semi-join — the real per-doc work — while
        # selectivity stays a property the langid_fixture row verifies
        langid_models=_langid_models(spark),
        langid_keep=("aa", "bb", "cc", "dd"),
        scrub_pii=True,
        near_dedup=False,  # replaced by the maintained-index loop below
        shard_budget_tokens=100_000,
        # the synthesized corpus carries no lang column; shard by source
        # (pack_shards' scale guard refuses a global single-task sort)
        partition_cols=["source"],
    )
    pipe = CurationPipeline(
        cfg, on_stage=lambda n, c, s: stage_rows.append((n, c, s))
    )

    t0 = time.perf_counter()
    result = pipe.run(docs)
    survivors = result.packed.select("doc_id", "text").localCheckpoint(
        eager=True
    )
    t_pipeline = time.perf_counter() - t0

    # maintained near-dedup over the survivors: seed + flag/absorb loop
    t1 = time.perf_counter()
    batches = [
        survivors.filter(F.col("doc_id") % n_batches == k)
        for k in range(n_batches)
    ]
    idx = dedup_ops.NearDupIndex(batches[0], "doc_id", "text")
    n_flagged_dup = 0
    for b in batches[1:]:
        flags = idx.flag(b)
        n_flagged_dup += flags.filter(F.col("is_near_dup") == 1).count()
        idx.absorb(b)
    t_index = time.perf_counter() - t1

    t2 = time.perf_counter()
    save_path = tempfile.mkdtemp(prefix="curation_ndi_")
    idx.save(save_path)
    t_save = time.perf_counter() - t2

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "stages": [
                    {"stage": n, "docs": c, "sec": s} for n, c, s in stage_rows
                ],
                "pipeline_total_sec": round(t_pipeline, 1),
                "n_batches": n_batches,
                "near_dup_flagged": n_flagged_dup,
                "index_stream_sec": round(t_index, 1),
                "index_save_sec": round(t_save, 1),
                "total_sec": round(t_pipeline + t_index + t_save, 1),
            }
        )
    )
    spark.stop()


def _langid_models(spark) -> dict:
    """The pre-fitted NB language-ID models (suite/text._LANGID_MODELS,
    fitted offline by tools/fit_langid_weights.py) — fit cost is excluded
    from the composed measurement on purpose (models ship with a
    pipeline; they are not re-fit per corpus)."""
    from etl_file_loader_spark.suite.text import _LANGID_MODELS

    return _LANGID_MODELS


if __name__ == "__main__":
    main()
