"""Plan-shape regression tests: assert the load-bearing physical-plan
properties that make the suite scale — the checks that would have caught
round 1's double-banding regression and round 3's partsupp re-derivation.

All plans are built at sf0.001 (plan shape is scale-invariant; AQE may
re-plan exchanges at runtime, but the properties asserted here — no
cartesian products, broadcast hints surviving, single Arrow subtrees,
cache reuse — are visible in the initial physical plan).
"""

from __future__ import annotations

import pytest

from etl_file_loader_spark import suite

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = suite.QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


# The three digests cover all 43 folded member queries in three plans;
# the rest are the shape-critical individual operators.
_NO_CARTESIAN = [
    "tpch_digest",
    "analytics_digest",
    "corpus_digest",
    "q1_pricing_summary",
    "merge_upsert",
    "dedup_lsh_candidates",
    "dedup_embedding_pairs_lsh",
    "knn_join_lsh",
    "asof_join",
    "range_join_count",
    "similarity_topk",
    "validate_split",
]


@pytest.mark.parametrize("name", _NO_CARTESIAN)
def test_no_cartesian_product(spark, name):
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_q1_single_exchange(spark):
    """One data shuffle (the group-by hash exchange). The only other exchange
    allowed is the rangepartitioning that presents the 6-row output ordered."""
    plan = plan_of(spark, "q1_pricing_summary")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Exchange") <= 2, plan


def test_broadcast_hints_survive(spark):
    """Dimension sides must broadcast — a silent fallback to sort-merge on a
    dimension join would shuffle the fact table at 100 TB."""
    for name in ("q2_min_cost_supplier", "q3_top_orders", "q9_product_profit"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
            f"{name} lost its broadcast join:\n{plan}"
        )


def test_partsupp_derived_once(spark):
    """q2/q9/q11/q16/q20 share one persisted partsupp aggregate: their plans
    read InMemoryTableScan instead of re-aggregating lineitem."""
    # (q20 is not here: its quantity aggregate is date-filtered, a genuinely
    # different aggregate from the shared partsupp analog)
    for name in (
        "q2_min_cost_supplier",
        "q9_product_profit",
        "q11_important_values",
        "q16_supplier_part_relationships",
    ):
        plan = plan_of(spark, name)
        assert "InMemoryTableScan" in plan, f"{name} rebuilds partsupp:\n{plan}"


def _count_arrow_nodes(plan: str) -> int:
    # the minhash/banding signature engines are Arrow-batched python nodes;
    # Spark renders them as MapInPandas / ArrowEvalPython / MapInArrow
    return sum(plan.count(n) for n in ("MapInPandas", "ArrowEvalPython", "MapInArrow"))


def test_lsh_banding_subtree_executes_once(spark):
    """Round 1 regression: the banding subtree (minhash signature Arrow node)
    must appear exactly once in the LSH candidate plan — a second copy means
    the signature computation runs twice per query."""
    plan = plan_of(spark, "dedup_lsh_candidates")
    assert _count_arrow_nodes(plan) == 1, plan


def test_knn_lsh_arrow_nodes_bounded(spark):
    """knn_join_lsh: banding matmul + einsum rescore — exactly two Arrow
    subtrees (each executing once); more means a duplicated expensive stage.
    The banding side is persisted, so the banding node may also appear inside
    an InMemoryTableScan's cached plan; count live nodes only."""
    plan = plan_of(spark, "knn_join_lsh")
    assert _count_arrow_nodes(plan) <= 3, plan


def test_similarity_topk_no_exchange(spark):
    """Brute-force cosine top-k: narrow projection + TakeOrderedAndProject,
    zero shuffles."""
    plan = plan_of(spark, "similarity_topk")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange" not in plan, plan


def test_validate_split_scan_dominated(spark):
    """The flagship validation operator: one whole-stage-codegen'd projection
    over the scan — no exchange, no python nodes."""
    plan = plan_of(spark, "validate_split")
    assert "Exchange" not in plan, plan
    assert _count_arrow_nodes(plan) == 0, plan
    # toString() renders whole-stage-codegen spans as "*(N) " node prefixes
    assert "*(" in plan, plan


def test_salted_merge_adds_no_exchange(spark):
    """The deterministic merge salt re-keys the ONE join shuffle; it must not
    introduce any additional exchange (the salt is computed inline on both
    sides, not via a separate repartition)."""
    from pyspark.sql import functions as F

    from etl_file_loader_spark.functions import row_hash
    from etl_file_loader_spark.operators import publish
    from pyspark.sql import types as T

    fields = {"id": T.LongType(), "v": T.LongType()}

    def frame(fname, log):
        df = spark.range(1000).select("id", (F.col("id") * 2).alias("v"))
        return (
            df.withColumn("etl_row_hash", row_hash(fields))
            .withColumn("source_filename", F.lit(fname))
            .withColumn("file_load_log_id", F.lit(log).cast("long"))
        )

    target = (
        frame("t.csv", 1)
        .withColumn("etl_created_at", F.lit("2024-01-01 00:00:00").cast("timestamp"))
        .withColumn("etl_updated_at", F.lit(None).cast("timestamp"))
    )
    stage = frame("s.csv", 2)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plain = publish.merge_upsert(target, stage, ["id"], ["id", "v"])
        salted = publish.merge_upsert(
            target, stage, ["id"], ["id", "v"], salt_buckets=32
        )
        p1 = plain._jdf.queryExecution().executedPlan().toString()
        p2 = salted._jdf.queryExecution().executedPlan().toString()
        assert p1.count("Exchange") == p2.count("Exchange"), (p1, p2)
        assert "CartesianProduct" not in p2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# ---------------------------------------------------------------------------
# round-4 session-3 operator plan shapes
# ---------------------------------------------------------------------------


def test_quality_classifier_scan_shaped(spark):
    """Model-based filtering must stay a pure projection: the ONLY exchange
    allowed is the presentation sort — no aggregation or join shuffles."""
    plan = plan_of(spark, "quality_classifier")
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert plan.count("Exchange") <= 1, plan  # rangepartitioning orderBy
    assert "Join" not in plan, plan


def test_sequence_chunks_scan_shaped(spark):
    plan = plan_of(spark, "sequence_chunks")
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert "Join" not in plan, plan
    assert "Generate explode" in plan, plan  # the chunk explosion, nothing else


def test_packed_sequences_single_data_shuffle(spark):
    """One real exchange (the sequence-key aggregation); the window's
    per-language sort and the presentation sort are the only others. No
    joins, no per-group stream materialization."""
    plan = plan_of(spark, "packed_sequences")
    assert plan.count("Exchange hashpartitioning") <= 2, plan  # window + agg
    assert "Join" not in plan, plan
    assert "posexplode" in plan, plan


def test_packed_sequences_subword_same_shape(spark):
    """The subword tokenizer is pure column expressions (regexp_extract_all
    + nested transform/substring), so the subword variant keeps the base
    op's shape: at most window + agg exchanges, no joins, no Python UDFs
    in the plan."""
    plan = plan_of(spark, "packed_sequences_subword")
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_simhash_dedup_quotient_and_no_cartesian(spark):
    """The pairwise machinery must run on the fingerprint quotient (an
    aggregate over simhash feeds the candidate join) and never plan a
    cartesian product."""
    plan = plan_of(spark, "simhash_dedup")
    assert "CartesianProduct" not in plan, plan
    # the loser side unions member-losers (fingerprint groups) with
    # rep-losers (components) before the anti-join
    assert "Union" in plan and ("LeftAnti" in plan or "left_anti" in plan), plan


def test_pq_adc_no_vector_read(spark):
    """ADC scoring scans CODES, not vectors: the scored frame's scan must
    not read the embedding column."""
    from etl_file_loader_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    enc = sim.PQEncoder(m=8, ksub=8).fit(emb, "embedding", order_col="vec_id")
    codes = enc.encode(emb, "vec_id", "embedding")
    query = [0.1] * 64
    plan = (
        enc.adc_topk(codes, "vec_id", query, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("Exchange") == 0, plan
