"""End-to-end corpus curation driver: the training-data counterpart of the
ingestion ``Processor``.

One configured object chains the curation operators in the order a
pretraining pipeline actually runs them — quality filter (heuristic and/or
model-based) -> PII scrub -> near-dedup -> held-out split -> deterministic
shuffle -> token-budget shard packing -> on-disk shard layout — and reports
per-stage document counts so data loss is attributable.

Every stage is one of the already-verified operators; this module adds no
new distributed logic, only composition + accounting. Counts cost one job
per enabled stage (a count over the stage frame — bounded by the number of
stages, never per-row driver work).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_file_loader_spark.operators import dedup as dedup_ops
from etl_file_loader_spark.operators import sampling as sampling_ops
from etl_file_loader_spark.operators import text as text_ops


@dataclass
class CurationConfig:
    """Declarative curation recipe (every stage optional)."""

    id_col: str = "doc_id"
    text_col: str = "text"
    # stage 1: heuristic quality floor (None disables)
    min_quality: float | None = 0.5
    # stage 2: hashed linear classifier (milli-unit weights; None disables)
    classifier_weights_milli: list[int] | None = None
    classifier_bias_milli: int = 0
    classifier_threshold_milli: int = 0
    # stage 3: PII redaction
    scrub_pii: bool = True
    # stage 4: near-dedup (MinHash+LSH collapse on the exact-text quotient)
    near_dedup: bool = True
    minhash_hashes: int = 16
    lsh_bands: int = 4
    lsh_rows_per_band: int = 4
    # stage 5: held-out split (label -> fraction; None disables)
    split_fractions: dict[str, float] | None = None
    keep_splits: tuple[str, ...] = ("train",)
    # stage 6/7: deterministic shuffle + shard packing
    shuffle_seed: str = "shuffle"
    shard_budget_tokens: int = 100_000
    partition_cols: list[str] = field(default_factory=lambda: ["lang"])


@dataclass
class CurationResult:
    packed: DataFrame  # curated docs + n_tokens, split, shard_id
    stage_counts: dict[str, int]

    @property
    def kept_docs(self) -> int:
        return self.stage_counts["packed"]


class CurationPipeline:
    """Run a :class:`CurationConfig` over a documents frame.

    ``run`` returns the packed frame + per-stage counts; ``run_and_write``
    additionally persists the shard layout (data partitioned by
    (partition..., shard_id) + manifest) via ``write_training_shards``.
    """

    def __init__(self, config: CurationConfig):
        self.config = config

    def run(self, docs: DataFrame) -> CurationResult:
        c = self.config
        did, txt = c.id_col, c.text_col
        counts: dict[str, int] = {"input": docs.count()}
        cur = docs

        if c.min_quality is not None:
            cur = cur.filter(text_ops.quality_score(F.col(txt)) >= c.min_quality)
            counts["quality_filter"] = cur.count()

        if c.classifier_weights_milli is not None:
            scores = text_ops.classifier_score(
                cur,
                did,
                txt,
                weights_milli=c.classifier_weights_milli,
                bias_milli=c.classifier_bias_milli,
                threshold_milli=c.classifier_threshold_milli,
            )
            keep_ids = scores.filter(F.col("keep") == 1).select(did)
            cur = cur.join(keep_ids, did, "left_semi")
            counts["classifier_filter"] = cur.count()

        if c.scrub_pii:
            cur = cur.withColumn(txt, text_ops.scrub_pii(F.col(txt)))
            # redaction never drops rows; no count job needed

        if c.near_dedup:
            cur = dedup_ops.remove_near_duplicates(
                cur,
                did,
                txt,
                num_hashes=c.minhash_hashes,
                bands=c.lsh_bands,
                rows_per_band=c.lsh_rows_per_band,
            )
            counts["near_dedup"] = cur.count()

        if c.split_fractions is not None:
            cur = sampling_ops.hash_split(cur, did, c.split_fractions)
            cur = cur.filter(F.col("split").isin(list(c.keep_splits)))
            counts["split_kept"] = cur.count()

        with_tokens = cur.withColumn(
            "n_tokens", text_ops.token_count(F.col(txt)).cast("long")
        ).withColumn(
            "_sk", sampling_ops.shuffle_key(F.col(did), seed=c.shuffle_seed)
        )
        packed = sampling_ops.pack_shards(
            with_tokens,
            did,
            "n_tokens",
            budget=c.shard_budget_tokens,
            partition_cols=c.partition_cols,
            order_col="_sk",
        ).drop("_sk")
        counts["packed"] = packed.count()
        return CurationResult(packed=packed, stage_counts=counts)

    def run_and_write(self, docs: DataFrame, path: str) -> CurationResult:
        result = self.run(docs)
        sampling_ops.write_training_shards(
            result.packed, path, "n_tokens", self.config.partition_cols
        )
        return result
