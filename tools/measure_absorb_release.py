"""Long-stream evidence for maintained-index absorb: leak-free AND O(batch).

Round 12's probe established that localCheckpoint ENTRIES are
strong-referenced by SparkContext until an explicit RDD unpersist; round
13 released each superseded checkpoint inside absorb. Round 14 closes
the COST side of the same loop: the doc-proportional indexes
(NearDupIndex, BM25Index) used to rewrite their FULL state per absorb —
O(K·state) over K absorbs even for tiny batches — and now absorb through
the LSM-style TieredState (operators/tiered.py), checkpointing only the
batch's contribution with geometric cascade merges.

This tool records, over K >= 20 fixed-size absorbs per index:
- PER-ABSORB WALL SECONDS (the round-13 verdict's asked-for series):
  tiered behavior = flat floor with occasional logarithmically-spaced
  cascade spikes; the pre-round-14 behavior grew linearly with state.
- live tier count (bounded ~log2) and persistent-RDD count,
- block-manager storage bytes first/last (the round-13 leak check).

HLLIndex rides along as the register-bounded control: single-checkpoint
absorb, constant everything.

Usage: python tools/measure_absorb_release.py [sf_dir] [k_absorbs]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_file_loader_spark.operators import sketches  # noqa: E402
from etl_file_loader_spark.operators.dedup import NearDupIndex  # noqa: E402
from etl_file_loader_spark.operators.text import BM25Index  # noqa: E402
from etl_file_loader_spark.session import get_spark  # noqa: E402


def _mem_used(spark) -> int:
    """Bytes of storage memory in use across the block manager (driver =
    the only executor on local mode)."""
    status = spark.sparkContext._jsc.sc().getExecutorMemoryStatus()
    it = status.iterator()
    used = 0
    while it.hasNext():
        kv = it.next()
        total, free = kv._2()._1(), kv._2()._2()
        used += total - free
    return used


def _series(spark, index, batches, tiers_of):
    """Absorb every batch, timing each; sample tiers/RDDs/memory after."""
    sc = spark.sparkContext
    out = []
    for i, b in enumerate(batches, start=1):
        t0 = time.perf_counter()
        index.absorb(b)
        dt = time.perf_counter() - t0
        out.append(
            {
                "absorb": i,
                "sec": round(dt, 3),
                "tiers": tiers_of(index),
                "persistent_rdds": sc._jsc.sc().getPersistentRDDs().size(),
                "storage_mem_used": _mem_used(spark),
            }
        )
    return out


def _legacy_equiv_sec(index) -> float:
    """What ONE pre-round-14 absorb paid at the CURRENT state size: a
    full-state re-fold materialized into a fresh checkpoint (that was
    the old absorb's exact shape, every batch). Non-destructive — the
    probe checkpoint is released immediately."""
    from etl_file_loader_spark.operators.cache import release_local_checkpoint

    st = index._state
    t0 = time.perf_counter()
    probe = st._fold(st.view()).localCheckpoint(eager=True)
    dt = time.perf_counter() - t0
    release_local_checkpoint(probe)
    return round(dt, 3)


def _summarize(name, samples):
    secs = [s["sec"] for s in samples]
    half = len(secs) // 2
    return {
        "index": name,
        "k_absorbs": len(samples),
        "per_absorb_sec": secs,
        "tiers_series": [s["tiers"] for s in samples],
        "persistent_rdds_series": [s["persistent_rdds"] for s in samples],
        "storage_mem_first_last": [
            samples[0]["storage_mem_used"],
            samples[-1]["storage_mem_used"],
        ],
        # flat-cost verdict: the second half's MEDIAN must not exceed the
        # first half's by more than 50% (pre-fix it roughly doubled, since
        # state doubles across the stream); medians ignore cascade spikes
        "median_first_half_sec": round(sorted(secs[:half])[half // 2], 3),
        "median_second_half_sec": round(sorted(secs[half:])[(len(secs) - half) // 2], 3),
        "max_tiers": max(s["tiers"] for s in samples),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = get_spark("absorb-release")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    # fixed batch size: docs split into (4k) slices; seed takes 3k of
    # them so the standing state dwarfs every batch (the regime where
    # O(state)-per-absorb hurts and O(batch) shows as a flat series)
    slices = 4 * k
    doc_batches = [
        docs.filter(F.col("doc_id") % slices == (3 * k + i)) for i in range(k)
    ]
    ndi = NearDupIndex(docs.filter(F.col("doc_id") % slices < 3 * k), "doc_id", "text")
    ndi_s = _series(spark, ndi, doc_batches, lambda x: len(x._state._tiers))
    ndi_sum = _summarize("NearDupIndex", ndi_s)
    ndi_sum["legacy_absorb_equiv_sec"] = _legacy_equiv_sec(ndi)
    ndi.release()

    bmi = BM25Index(
        docs.filter(F.col("doc_id") % slices < 3 * k),
        "doc_id", "text", ["data", "model", "learn"],
    )
    bmi_s = _series(spark, bmi, doc_batches, lambda x: len(x._state._tiers))
    bmi_sum = _summarize("BM25Index", bmi_s)
    bmi_sum["legacy_absorb_equiv_sec"] = _legacy_equiv_sec(bmi)
    bmi.release()

    hll = sketches.HLLIndex(
        orders.filter(F.col("o_orderkey") % (k + 1) == 0),
        ["o_orderstatus"], "o_custkey",
    )
    hll_s = _series(
        spark,
        hll,
        [orders.filter(F.col("o_orderkey") % (k + 1) == i) for i in range(1, k + 1)],
        lambda x: 1,
    )
    hll_sum = _summarize("HLLIndex(control)", hll_s)
    hll.release()

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "k_absorbs": k,
                "indexes": [ndi_sum, bmi_sum, hll_sum],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
