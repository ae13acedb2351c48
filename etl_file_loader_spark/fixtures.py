"""Synthetic fixtures the testdata can't provide.

The driver-generated ``embeddings.parquet`` vectors are near-orthogonal
(structureless), which mathematically forces any >=90%-recall LSH banding
into ~89% candidate density (see NOTES_r2) — making the bucketed scale path
look like all-pairs. Real embedding corpora are clustered; this module
generates a deterministic mixture-of-Gaussians fixture so the ANN/near-dup
benches and gates can demonstrate the pruning win the bucketing exists for.

Driver-side generation is deliberate: the fixture is small (n*dim floats)
and must be bit-reproducible across runs (fixed seed, no Spark-side RNG
ordering dependence). At real scale you'd generate distributed (mapInPandas
over an id range with a per-partition seeded RNG) — the consumers only see
a DataFrame either way.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# fixture frames are deterministic pure functions of their params — reuse
# the built DataFrame per (application, params) so repeat calls skip the
# numpy generation + driver-side conversion (consumers: the pruning gate,
# the bench twin, tests)
_CACHE: dict[tuple, DataFrame] = {}
# LocalRelation plans embed the fixture data, so an unbounded keyed cache
# grows driver memory with every distinct param set — cap it (FIFO evict;
# nothing to unpersist, the frames are never .persist()ed).
_CACHE_MAX = 8


def clustered_embeddings(
    spark: SparkSession,
    n: int = 2000,
    dim: int = 64,
    k: int = 40,
    noise: float = 0.03,
    seed: int = 7,
) -> DataFrame:
    """Mixture-of-Gaussians embeddings: k unit centers, points = center +
    noise*N(0,I). At noise=0.03/dim=64 the expected intra-cluster cosine is
    ~0.94 and cross-cluster ~0 — clean separation for a 0.9 near-dup
    threshold, matching the (vec_id, embedding, label) schema of the
    testdata embeddings table."""
    import pandas as pd

    key = (spark.sparkContext.applicationId, n, dim, k, noise, seed)
    cached = _CACHE.get(key)
    if cached is not None:
        return cached
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(n) % k
    vecs = centers[labels] + noise * rng.standard_normal((n, dim))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    # pandas + Arrow path: one columnar batch transfer instead of per-row
    # Py4J serialization (order-of-magnitude faster driver-side for n=8000)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            # python floats: the non-Arrow createDataFrame fallback (sessions
            # without arrow.pyspark.enabled) type-rejects numpy scalars
            "embedding": [v.tolist() for v in vecs],
            "label": labels.astype(np.int32),
        }
    )
    # deliberately NOT .persist()ed: as a LocalRelation the plan keeps exact
    # size stats, so Catalyst broadcasts the fixture sides of the LSH joins;
    # an InMemoryRelation hides that and degrades them to sort-merge
    # (measured 3.3s -> 11.8s on the n=8000 LSH twin). The cache only avoids
    # regenerating numpy + the Arrow transfer on repeat calls.
    df = spark.createDataFrame(pdf, schema)
    while len(_CACHE) >= _CACHE_MAX:
        _CACHE.pop(next(iter(_CACHE)))
    _CACHE[key] = df
    return df
