"""Similarity search over embedding columns (array<float>).

 - brute-force cosine top-k: JVM-side fold (zip_with + aggregate), no UDF,
   no shuffle until the final top-k — the baseline and the oracle-checkable
   path.
 - LSH-bucketed (random hyperplane signs): deterministic hyperplanes derived
   from md5 so results are reproducible without a seed; candidates meet on a
   bucket equi-join. The 100 TB path: score only same-bucket rows.
 - IVF (k-means coarse quantizer) via pyspark.ml KMeans: fit on a sample,
   assign every vector a centroid bucket, probe the closest n_probe buckets.
 - PQ (product quantization): per-subspace codebooks compress vectors into
   a few small codes; ADC scores queries against codes alone (lookup-table
   fold), with a FAISS-style exact rerank of the oversampled shortlist.

Scoring stays in Column expressions: per-row dot product over a broadcast
literal query vector is a narrow projection — 1000 executors scan their
partitions, a single top-k (TakeOrdered) reduces; no all-to-all anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Σ a_i*b_i as a left-to-right double fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    Scores are rounded before ranking so ordering is engine-stable; ties
    break on id. Plan: scan -> project(score) -> TakeOrdered(k) — no shuffle.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(_query_score(F.col(vec_col), q, query_vec), round_to).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def mine_triplets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    round_to: int = 4,
    anchors: DataFrame | None = None,
) -> DataFrame:
    """Batch-hard triplet mining for contrastive training (FaceNet-style):
    per anchor, the HARDEST positive (same label, lowest cosine) and the
    HARDEST negative (different label, highest cosine), with the margin
    ``pos_cos - neg_cos`` (negative margin = the triplet violates; those
    are the ones worth training on).

    Determinism: cosine rounds to ``round_to`` (the knn family's rule)
    and ties break by candidate id, so the mined set is a pure function
    of the data — DuckDB-oracle-checked (suite ``triplet_mining``).

    Scale: exact O(|anchors| x N) — pass ``anchors`` (a subset of ``df``)
    to mine a labeled seed/eval set against the full corpus; the
    per-anchor top-1 rides the WindowGroupLimit rank pushdown, so no
    per-anchor state exceeds 1 row per task. For web-scale corpora mine
    inside LSH/IVF candidate buckets instead (``knn_join_lsh``), the
    same trade the ANN family documents.
    """
    # norms are per-ROW, computed once before the join (the knn_join_exact
    # discipline): HOF folds are interpreted, so re-folding each row's norm
    # per partner would triple the O(n²·d) interpreter work — measured 83 s
    # vs 15 s at sf0.1 before this was applied. Same floats, oracle-stable.
    from etl_file_loader_spark.operators.skew import fan_out_scan

    # Join strategy, picked deliberately (guide §3.1): with a bounded
    # anchor seed set, BROADCAST the anchors and STREAM the corpus.
    # Left to size estimates the planner inverts this — a plain filter
    # does not shrink sizeInBytes, so both sides tie and the non-equi
    # BNLJ defaults to BuildRight = broadcast the CORPUS (50 MB of
    # vectors at sf0.1, unbounded at scale) while the |A| x N cosine
    # pass streams through the 500-row anchor scan's single task. The
    # explicit hint makes the broadcast O(|anchors|) and the fan-out of
    # the streamed corpus side (guide §2.5; no-op at scale) spreads the
    # cosine work across the cluster.
    if anchors is not None:
        df = fan_out_scan(df, key_cols=[id_col])
    a = (anchors if anchors is not None else df).select(
        F.col(id_col).alias("_aid"),
        F.col(vec_col).alias("_av"),
        F.col(label_col).alias("_al"),
        norm(F.col(vec_col)).alias("_na"),
    )
    if anchors is not None:
        a = F.broadcast(a)
    b = df.select(
        F.col(id_col).alias("_bid"),
        F.col(vec_col).alias("_bv"),
        F.col(label_col).alias("_bl"),
        norm(F.col(vec_col)).alias("_nb"),
    )
    scored = a.join(b, F.col("_aid") != F.col("_bid")).select(
        "_aid",
        "_al",
        "_bid",
        "_bl",
        F.round(
            dot(F.col("_av"), F.col("_bv")) / (F.col("_na") * F.col("_nb")),
            round_to,
        ).alias("_cos"),
    )
    return _hardest_from_scored(scored, id_col)


def _hardest_from_scored(scored: DataFrame, id_col: str) -> DataFrame:
    """Shared tail of :func:`mine_triplets` and :func:`mine_triplets_lsh`:
    from scored candidate rows (_aid, _al, _bid, _bl, _cos) pick per
    anchor the hardest positive (same label, min cosine) and hardest
    negative (different label, max cosine), ties by candidate id. Both
    top-1 windows ride the WindowGroupLimit rank pushdown."""
    wpos = Window.partitionBy("_aid").orderBy(
        F.col("_cos").asc(), F.col("_bid").asc()
    )
    pos = (
        scored.filter(F.col("_al") == F.col("_bl"))
        .withColumn("_rn", F.row_number().over(wpos))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_aid"),
            F.col("_bid").alias("pos_id"),
            F.col("_cos").alias("pos_cos"),
        )
    )
    wneg = Window.partitionBy("_aid").orderBy(
        F.col("_cos").desc(), F.col("_bid").asc()
    )
    neg = (
        scored.filter(F.col("_al") != F.col("_bl"))
        .withColumn("_rn", F.row_number().over(wneg))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_aid"),
            F.col("_bid").alias("neg_id"),
            F.col("_cos").alias("neg_cos"),
        )
    )
    return (
        pos.join(neg, "_aid")
        .select(
            F.col("_aid").alias(id_col),
            "pos_id",
            "pos_cos",
            "neg_id",
            "neg_cos",
            (F.col("pos_cos") - F.col("neg_cos")).alias("margin"),
        )
    )


def mine_triplets_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    round_to: int = 4,
    anchors: DataFrame | None = None,
    num_bands: int = 8,
    planes_per_band: int = 2,
) -> DataFrame:
    """ANN-bucketed batch-hard triplet mining — the 100 TB code path that
    :func:`mine_triplets` documents: candidates for each anchor are the
    vectors sharing at least one hyperplane-LSH (band, bucket) with it,
    so pair volume tracks neighborhood density instead of |anchors| x N.
    Within the candidate set the comparator is IDENTICAL to the exact
    miner (hardest positive = same label, min cosine; hardest negative =
    different label, max cosine; rounded cosine, id tie-breaks), so the
    two paths differ only in candidate coverage.

    Honest approximation notes: the hardest NEGATIVE is the LSH-natural
    half — the closest different-label vector is exactly what LSH buckets
    surface (agreement with exact is gated by the ``triplet_mining_lsh``
    suite row). The in-bucket hardest POSITIVE is necessarily semi-hard:
    the true batch-hard positive (FARTHEST same-label vector) is the pair
    LSH is designed NOT to collide, so in-bucket positives skew nearer
    and mined margins are optimistic — the standard within-chunk
    batch-hard trade (FaceNet mines within minibatches for the same
    reason). Anchors whose every bucket is a singleton yield no row.

    Scoring uses the Arrow-batched matmul (``dot_vectorized``) per the
    house rule: this path is gate-checked on mined IDs, never
    hash-compared against a SQL oracle.
    """
    banded = hyperplane_lsh_bands(df, id_col, vec_col, num_bands, planes_per_band)
    aside = banded
    if anchors is not None:
        aside = banded.join(
            anchors.select(F.col(id_col)), id_col, "left_semi"
        )
    cand = (
        aside.select(F.col(id_col).alias("_aid"), "band", "bucket")
        .join(
            banded.select(F.col(id_col).alias("_bid"), "band", "bucket"),
            ["band", "bucket"],
        )
        .filter(F.col("_aid") != F.col("_bid"))
        .select("_aid", "_bid")
        .dropDuplicates(["_aid", "_bid"])
    )
    va = df.select(
        F.col(id_col).alias("_aid"),
        F.col(vec_col).alias("_av"),
        F.col(label_col).alias("_al"),
        norm(F.col(vec_col)).alias("_na"),
    )
    vb = df.select(
        F.col(id_col).alias("_bid"),
        F.col(vec_col).alias("_bv"),
        F.col(label_col).alias("_bl"),
        norm(F.col(vec_col)).alias("_nb"),
    )
    scored = cand.join(va, "_aid").join(vb, "_bid").select(
        "_aid",
        "_al",
        "_bid",
        "_bl",
        F.round(
            dot_vectorized(F.col("_av"), F.col("_bv"))
            / (F.col("_na") * F.col("_nb")),
            round_to,
        ).alias("_cos"),
    )
    return _hardest_from_scored(scored, id_col)


def dot_vectorized(a: Column, b: Column) -> Column:
    """Arrow-batched numpy dot product (pandas UDF).

    ~100x faster than the interpreted HOF fold on pair-scored workloads
    (the fold evaluates lambda-per-element in the expression interpreter;
    numpy does one BLAS call per batch). Summation order differs from the
    left-to-right fold, so use this ONLY where results are not
    hash-compared against a SQL oracle — the approximate/LSH paths.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dot(xs: pd.Series, ys: pd.Series) -> pd.Series:
        if len(xs) == 0:
            return pd.Series(np.empty(0))
        # one (n, d) stack + einsum per Arrow batch — a per-row python loop
        # here costs ~30s per million pairs; this runs in C
        x = np.stack(xs.to_numpy()).astype("float64", copy=False)
        y = np.stack(ys.to_numpy()).astype("float64", copy=False)
        return pd.Series(np.einsum("ij,ij->i", x, y))

    return _dot(a, b)


def _query_score(vec: Column, q: Column, query_vec: list[float]) -> Column:
    """cosine(vec, q) with the query norm folded driver-side (same IEEE
    left-to-right sum as the Column fold, so values are bit-identical; the
    per-row HOF work halves because interpreted folds don't constant-fold)."""
    import math

    acc = 0.0
    for v in query_vec:
        acc += float(v) * float(v)
    nq = math.sqrt(acc)
    return dot(vec, q) / (norm(vec) * F.lit(nq))


def plan_banding(
    n_rows: int,
    threshold: float,
    target_recall: float = 0.9,
    candidates_per_row: float = 64.0,
    max_planes: int = 48,
    max_bands: int = 512,
) -> tuple[int, int]:
    """Pick (num_bands, planes_per_band) for sign-random-projection banding.

    Fixed banding parameters are a scale trap: with r planes a band has 2^r
    buckets, so on an unstructured (near-orthogonal) background the expected
    random-collision candidate load is ~ b * n / 2^r pairs PER ROW — it grows
    linearly with n at fixed (b, r), which makes total candidate volume grow
    ∝ n². The fix is to grow r with log2(n) and buy recall back with bands.

    Models (driver-side closed form, no data pass):
      recall:  per-plane agreement for cosine >= threshold is
               p = 1 - acos(threshold)/pi (Goemans-Williamson); a pair
               collides in a band iff all r planes agree, so
               recall >= 1 - (1 - p^r)^b.  Solve b for target_recall.
      cost:    random background pairs collide per band w.p. ~ 2^-r, so
               expected candidates/row ~ b * n / 2^r.  Take the smallest r
               whose load fits candidates_per_row at the b recall needs.

    Returns (num_bands, planes_per_band). If no (b <= max_bands,
    r <= max_planes) pair fits the budget, returns the feasible pair with
    the lowest expected load (still recall-satisfying) — the budget is a
    target, not a hard guarantee.

    Cost of bands is LINEAR (b rows per vector in the exploded banded
    frame, b*r total hyperplanes in one matmul), while the load saved is
    exponential in r — so the caps default high: at threshold 0.9 the
    bands needed grow only ~n^0.22, and planes_per_band stays < 64 (the
    bit-packed int64 bucket bound) far beyond 10^10 rows.
    """
    import math

    if n_rows < 2:
        return (1, 1)
    t = min(1.0, max(-1.0, float(threshold)))
    p = 1.0 - math.acos(t) / math.pi
    best: tuple[float, int, int] | None = None  # (load, bands, planes)
    for r in range(1, max_planes + 1):
        pr = p**r
        if pr >= 1.0:
            b = 1
        elif pr <= 0.0:
            break
        else:
            b = math.ceil(math.log1p(-target_recall) / math.log1p(-pr))
        if b > max_bands:
            # more planes per band only lowers p^r further and needs even
            # more bands — every larger r is infeasible too
            break
        load = b * n_rows / float(2**r)
        if load <= candidates_per_row:
            return (b, r)
        if best is None or load < best[0]:
            best = (load, b, r)
    if best is None:
        # threshold so low that even r=1 needs > max_bands bands; degrade to
        # the widest allowed single-plane bands (max recall available)
        return (max_bands, 1)
    return (best[1], best[2])


def _plane_matrix(dim: int, num_planes: int) -> "np.ndarray":
    """(dim x num_planes) hyperplane weights, md5-derived — deterministic,
    engine-independent, no RNG state. Component (p, j) = md5(f"{p}_{j}")
    first-8-hex as uint32 / 2^32 - 0.5 (kept in lockstep with
    ``_query_projections``)."""
    import hashlib

    w = np.empty((dim, num_planes), dtype="float64")
    for p in range(num_planes):
        for j in range(dim):
            h = int(hashlib.md5(f"{p}_{j}".encode()).hexdigest()[:8], 16)
            w[j, p] = h / float(2**32) - 0.5
    return w


def _rp_sign_matrix(dim: int, out_dim: int, seed: int = 0) -> "np.ndarray":
    """(dim x out_dim) Johnson-Lindenstrauss ±1 sign matrix, md5-derived —
    deterministic and engine-independent like ``_plane_matrix``. Component
    (i, j) = +1 when the first hex nibble of md5(f"rp{seed}_{i}_{j}") is
    even, else -1 (the dense Achlioptas construction with p = 1/2)."""
    import hashlib

    s = np.empty((dim, out_dim), dtype="int64")
    for i in range(dim):
        for j in range(out_dim):
            h = int(hashlib.md5(f"rp{seed}_{i}_{j}".encode()).hexdigest()[0], 16)
            s[i, j] = 1 if h % 2 == 0 else -1
    return s


def random_projection(
    df: DataFrame,
    vec_col: str,
    out_dim: int,
    seed: int = 0,
    out_col: str = "proj",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project the
    ``array<float>`` column onto ``out_dim`` deterministic ±1 directions,
    scaled by 1/sqrt(out_dim) (preserves pairwise distances to within
    JL distortion — the standard pre-reduction in front of LSH banding /
    IVF training / distance-threshold filters, cutting their cost by
    dim/out_dim).

    HONEST LIMIT (measured at sf0.01): JL distortion at 64->16 is far too
    large to preserve fine top-k ORDER among near-uniform vectors —
    direct projected-space kNN kept 12.8% of exact top-10, and even a
    100-of-500 projected shortlist only 59% (eps ~ sqrt(8 ln n / d')).
    Use it for epsilon-ball / threshold work and coarse candidate
    generation with generous oversampling, not as a ranking shortcut.

    Plan shape (100 TB): a pure narrow projection — the sign matrix rides
    the plan as literals, each output component is a JVM-side zip_with +
    left-to-right aggregate fold (no UDF, no shuffle, whole-stage
    codegen). Cross-engine: signs are integers and the fold order is
    pinned, so projected values are BIT-IDENTICAL to an explicit
    left-associated SQL sum chain (suite ``random_projection_check``).
    """
    dim = _vector_dim(df, vec_col)
    signs = _rp_sign_matrix(dim, out_dim, seed)
    scale = float(np.sqrt(out_dim))
    comps = []
    for j in range(out_dim):
        sj = F.array(*[F.lit(int(s)) for s in signs[:, j]])
        comps.append(
            (
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        sj,
                        lambda x, s: x.cast("double") * s.cast("double"),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.lit(scale)
            )
        )
    return df.withColumn(out_col, F.array(*comps))


def _vector_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None:
        return 0
    return int(row["d"])


def hyperplane_lsh_buckets(
    df: DataFrame, id_col: str, vec_col: str, num_planes: int = 8
) -> DataFrame:
    """Sign-random-projection bucket per vector (deterministic hyperplanes).

    The plane matrix is data-independent, so it is materialized ONCE on the
    driver and the per-row work is a single Arrow-batched matmul — computing
    the md5-derived weights inside a Column expression re-evaluates
    dim*planes md5 calls per ROW (the expression interpreter can't hoist
    them), which is ~100x slower. Bucket = bit-packed projection signs.
    """
    dim = _vector_dim(df, vec_col)
    w = _plane_matrix(dim, num_planes)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _bucket(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype="int64")
        v = np.stack([np.asarray(x, dtype="float64") for x in vs])
        signs = (v @ w) >= 0  # (n, planes)
        out = np.zeros(len(vs), dtype="int64")
        for p in range(num_planes):
            out |= signs[:, p].astype("int64") << p
        return pd.Series(out)

    return df.select(
        F.col(id_col), F.col(vec_col), _bucket(F.col(vec_col)).alias("bucket")
    )


def hyperplane_lsh_bands(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    num_bands: int = 4,
    planes_per_band: int = 4,
) -> DataFrame:
    """Banded sign-random-projection: one row per (vector, band).

    Band b uses global planes [b*r, (b+1)*r) with the same md5 derivation as
    ``hyperplane_lsh_buckets``. Two vectors are candidates if they agree on
    ALL planes of ANY band — collision prob 1-(1-p^r)^b for per-plane
    agreement p, an OR-amplification that buys recall at the cost of b
    candidate lookups (the classic MinHash-LSH banding, applied to cosine).

    Plan shape: scan -> ONE Arrow-batched matmul against the driver-derived
    plane matrix (see ``hyperplane_lsh_buckets`` for why not a Column
    expression) -> posexplode to (id, band, bucket). The candidate join
    shuffles on (band, bucket).

    The banding input fans out first (optimization round 14, guide §2.5):
    a single-split scan (one-row-group parquet, LocalRelation fixture)
    runs the Arrow matmul in ONE Python worker while the cluster idles —
    stage-profiled at 1.5 s single-task for the sf0.1 embeddings. No-op
    for any input that already fills the cluster; only the banding branch
    is repartitioned, so vector-fetch joins on ``df`` elsewhere keep
    their LocalRelation stats and broadcast.
    """
    from etl_file_loader_spark.operators.skew import fan_out_scan

    dim = _vector_dim(df, vec_col)  # 1-row probe: before the fan-out exchange
    df = fan_out_scan(df, key_cols=[id_col])
    w = _plane_matrix(dim, num_bands * planes_per_band)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _band_buckets(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype="object")
        v = np.stack([np.asarray(x, dtype="float64") for x in vs])
        signs = (v @ w) >= 0  # (n, bands*planes)
        out = []
        for row in signs:
            buckets = []
            for b in range(num_bands):
                bucket = 0
                for i in range(planes_per_band):
                    if row[b * planes_per_band + i]:
                        bucket |= 1 << i
                buckets.append(bucket)
            out.append(buckets)
        return pd.Series(out)

    return df.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(_band_buckets(F.col(vec_col))).alias("band", "bucket"),
    )


def _query_projections(query_vec: list[float], num_planes: int) -> list[float]:
    """Driver-side per-plane projections via the SAME plane matrix and numpy
    arithmetic as the data-side bucketing (kept in lockstep so the query
    lands in the same bucket as an identical stored vector)."""
    w = _plane_matrix(len(query_vec), num_planes)
    return [float(x) for x in np.asarray(query_vec, dtype="float64") @ w]


def query_probe_buckets(
    query_vec: list[float], num_planes: int, n_probe: int
) -> list[int]:
    """Multi-probe LSH bucket sequence (Lv et al., VLDB'07): the query's own
    bucket first, then buckets obtained by flipping the planes whose
    projection magnitude is smallest — those are the planes a true neighbor
    most likely landed on the other side of. Probe cost of a flip-set is the
    sum of flipped |projection|; buckets are emitted in ascending cost."""
    from itertools import combinations

    projs = _query_projections(query_vec, num_planes)
    base = sum((1 << p) for p, pr in enumerate(projs) if pr >= 0)
    if n_probe <= 1:
        return [base]
    # planes worth flipping, cheapest first; enumerating subsets of the ~16
    # cheapest is plenty (n_probe is small)
    order = sorted(range(num_planes), key=lambda p: abs(projs[p]))[: min(num_planes, 16)]
    scored: list[tuple[float, int]] = [(0.0, base)]
    for r in range(1, len(order) + 1):
        for flips in combinations(order, r):
            cost = sum(abs(projs[p]) for p in flips)
            b = base
            for p in flips:
                b ^= 1 << p
            scored.append((cost, b))
        if len(scored) >= 4 * n_probe:  # enough candidates to sort from
            break
    # Sort by cost ONLY (stable): a flip whose |projection| is exactly 0.0
    # ties with the base bucket's cost, and tuple comparison would then fall
    # through to the bucket ids, letting a flipped bucket sort ahead of the
    # query's own bucket. Stable key-sort keeps insertion order on ties, so
    # the base bucket is always probed first.
    scored.sort(key=lambda t: t[0])
    # Dedup while preserving order (flip sets can collide on bucket ids).
    seen: set[int] = set()
    out: list[int] = []
    for _, b in scored:
        if b not in seen:
            seen.add(b)
            out.append(b)
        if len(out) >= n_probe:
            break
    return out


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 8,
    round_to: int = 4,
    n_probe: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket(s).

    Recall is tunable two ways: fewer planes -> bigger buckets; higher
    ``n_probe`` -> multi-probe into the adjacent buckets most likely to hold
    missed neighbors (flipping low-|projection| planes). Multi-probe buys
    recall WITHOUT growing the stored index — the scan stays pruned to
    n_probe buckets. At scale, persist the bucketed table partitioned by
    bucket -> the search prunes to n_probe partitions.
    """
    bucketed = hyperplane_lsh_buckets(df, id_col, vec_col, num_planes)
    probes = query_probe_buckets(query_vec, num_planes, n_probe)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        bucketed.filter(F.col("bucket").isin(probes))
        .select(F.col(id_col), F.round(_query_score(F.col(vec_col), q, query_vec), round_to).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def write_lsh_index(
    df: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
    num_planes: int = 8,
) -> None:
    """Persist the LSH-bucketed table partitioned by bucket — the serving
    layout for repeated ANN queries.

    ``lsh_topk`` recomputes buckets per query (fine for one-off jobs); a
    query SERVICE over a 100 TB corpus instead writes the bucketed table
    ONCE, `partitionBy("bucket")`, so every search scans only its n_probe
    bucket directories — partition pruning at the file-listing level, zero
    rows read outside the probed buckets. The hyperplanes are md5-derived
    (data-independent, deterministic), so index and query sides agree with
    no stored model state; only ``num_planes`` must match, which is
    recoverable from the partition count (<= 2^planes).
    """
    bucketed = hyperplane_lsh_buckets(df, id_col, vec_col, num_planes)
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(path)


def lsh_topk_indexed(
    spark,
    index_path: str,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 8,
    round_to: int = 4,
    n_probe: int = 1,
) -> DataFrame:
    """Top-k against a ``write_lsh_index`` table: the bucket filter becomes
    a PARTITION filter (PartitionFilters in the scan, pruned before I/O),
    so cost ∝ rows in the probed buckets — independent of corpus size for
    fixed bucket occupancy. Scores/ordering identical to ``lsh_topk``."""
    probes = query_probe_buckets(query_vec, num_planes, n_probe)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    bucketed = spark.read.parquet(index_path)
    return (
        bucketed.filter(F.col("bucket").isin(probes))
        .select(
            F.col(id_col),
            F.round(_query_score(F.col(vec_col), q, query_vec), round_to).alias(
                "score"
            ),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def knn_join_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    round_to: int = 4,
) -> DataFrame:
    """Top-k cosine neighbors for EVERY row (exact, all-pairs).

    The semantic-dedup / clustering-prep primitive. Plan: self cross join
    (id != neighbor) -> score -> per-id window top-k. O(n²) compare — this is
    the correctness baseline and the right choice only for modest n (e.g.
    per-partition re-rank after candidate generation); the 100 TB path is
    ``knn_join_lsh``. Scores round before ranking, ties break on neighbor id,
    so ordering is engine-stable and oracle-checkable.
    """
    from pyspark.sql.window import Window

    # norms are per-ROW, computed once before the join — inside the pair
    # score each row's norm would be re-folded once per partner (HOF folds
    # are interpreted, not codegen'd; this is the difference between O(n²·d)
    # and O(3n²·d) interpreter work). Same floats, so oracle-stable.
    a = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_va"),
        norm(F.col(vec_col)).alias("_na"),
    )
    b = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vb"),
        norm(F.col(vec_col)).alias("_nb"),
    )
    scored = (
        a.join(b, F.col("vec_id") != F.col("neighbor_id"))
        .select(
            "vec_id",
            "neighbor_id",
            F.round(
                dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")),
                round_to,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def knn_join_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    num_bands: int | None = 4,
    planes_per_band: int | None = 2,
    round_to: int = 4,
    recall_threshold: float = 0.9,
    target_recall: float = 0.9,
    candidates_per_row: float = 64.0,
    n_rows: int | None = None,
) -> DataFrame:
    """Approximate k-NN join: banded-LSH candidates -> exact rescore -> top-k.

    Candidates meet on a (band, bucket) equi-join, so compare volume tracks
    neighborhood density instead of n² — the scale path. Rows whose bucket
    holds no other vector get no neighbors (recall < 1; band/plane counts
    tune the tradeoff).

    Pass ``num_bands=None`` (and/or ``planes_per_band=None``) to auto-plan
    the banding with ``plan_banding``: planes grow with log2(n) so expected
    random-collision candidates stay ~``candidates_per_row`` per row while
    bands keep recall >= ``target_recall`` for neighbors at cosine >=
    ``recall_threshold``. ``n_rows`` skips the planning count when the
    caller already knows the cardinality (always pass it at scale).
    """
    if num_bands is None or planes_per_band is None:
        n = n_rows if n_rows is not None else df.count()
        num_bands, planes_per_band = plan_banding(
            n, recall_threshold, target_recall, candidates_per_row
        )
    from pyspark.sql.window import Window

    from etl_file_loader_spark.operators.dedup import _bucket_join_pairs

    # The Arrow-matmul banding subtree runs ONCE (persisted slim frame):
    # distinct undirected candidate pairs come from a JVM bucket equi-join —
    # hyperplane buckets on weakly-structured embeddings can hold hundreds of
    # members, which codegen joins expand natively — get mirrored into both
    # directions, then two slim id-joins fetch the vectors for the rescore.
    banded = hyperplane_lsh_bands(df, id_col, vec_col, num_bands, planes_per_band)
    undirected = _bucket_join_pairs(
        banded.select(F.col(id_col), "band", "bucket"), id_col, ["band", "bucket"]
    )
    va = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        norm(F.col(vec_col)).alias("_na"),
    )
    vb = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        norm(F.col(vec_col)).alias("_nb"),
    )
    # score each undirected pair ONCE (cosine is symmetric), then mirror the
    # scored rows — scoring after mirroring would double the Arrow transfer
    # and both vector-fetch joins
    pair_scores = undirected.join(va, "id_a").join(vb, "id_b").select(
        "id_a",
        "id_b",
        F.round(
            dot_vectorized(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")),
            round_to,
        ).alias("cosine"),
    )
    scored = pair_scores.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("vec_id"),
                    F.col("id_b").alias("neighbor_id"),
                    F.col("cosine"),
                ),
                F.struct(
                    F.col("id_b").alias("vec_id"),
                    F.col("id_a").alias("neighbor_id"),
                    F.col("cosine"),
                ),
            )
        ).alias("_e")
    ).select("_e.vec_id", "_e.neighbor_id", "_e.cosine")
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


class IVFIndex:
    """IVF coarse-quantizer ANN: k-means centroids -> bucket assignment -> probe.

    fit() trains pyspark.ml KMeans on (a sample of) the vectors; search()
    scores only rows whose centroid is among the n_probe closest to the
    query. The assigned table should be persisted partitioned by _ivf_bucket
    at scale so probes prune partitions.
    """

    def __init__(self, n_lists: int = 16, seed: int = 42):
        self.n_lists = n_lists
        self.seed = seed
        self.model = None

    def fit(self, df: DataFrame, vec_col: str) -> "IVFIndex":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        vecs = df.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
        self.model = KMeans(k=self.n_lists, seed=self.seed).fit(vecs)
        return self

    def assign(self, df: DataFrame, vec_col: str) -> DataFrame:
        from pyspark.ml.functions import array_to_vector

        pred = self.model.transform(
            df.withColumn("features", array_to_vector(F.col(vec_col).cast("array<double>")))
        )
        return pred.withColumnRenamed("prediction", "_ivf_bucket").drop("features")

    def _centers_list(self) -> list:
        """Centroids as plain per-dim float lists (probe ranking input)."""
        return self.model.clusterCenters()

    def save(self, path: str) -> None:
        """Persist the fitted coarse quantizer (ml-native writer)."""
        self.model.write().overwrite().save(path)

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        from pyspark.ml.clustering import KMeansModel

        model = KMeansModel.load(path)
        idx = cls(n_lists=model.getK())
        idx.model = model
        return idx

    def search(
        self,
        assigned: DataFrame,
        id_col: str,
        vec_col: str,
        query_vec: list[float],
        k: int = 10,
        n_probe: int = 3,
        round_to: int = 4,
    ) -> DataFrame:
        import numpy as np

        centers = self._centers_list()
        qv = np.asarray(query_vec, dtype="float64")
        dists = [float(np.linalg.norm(qv - c)) for c in centers]
        probe = sorted(range(len(centers)), key=lambda i: dists[i])[:n_probe]
        q = F.array(*[F.lit(float(v)) for v in query_vec])
        return (
            assigned.filter(F.col("_ivf_bucket").isin(probe))
            .select(F.col(id_col), F.round(_query_score(F.col(vec_col), q, query_vec), round_to).alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k)
        )


class KMeansDF:
    """Deterministic DataFrame-native Lloyd's k-means — the oracle-replayable
    coarse quantizer.

    pyspark.ml's KMeans is seeded but its k-means|| init and sample-order-
    dependent iteration have no SQL form, which is why IVF rows stayed
    rows-only demos. This variant makes every step an engine-agnostic
    derivation so DuckDB can replay the ENTIRE fit from the parquet alone:

    - init: the k vectors with the smallest ``(md5(cast(id as string)), id)``
      — a pure expression both engines compute identically;
    - assign: ``argmin_c Σ (x_i - c_i)²`` with ties to the lowest cluster
      index (struct-array min — lexicographic, so the tiebreak is explicit);
    - update: per-dimension mean, ROUNDED to ``round_to`` decimals each
      iteration. Rounding is the determinism keystone: both engines agree
      on the mean to ~1e-13 relative (summation order), so the rounded
      centroid is identical unless a mean sits within noise of a rounding
      boundary — tests/test_kmeans_df_oracle.py measures the minimum
      boundary distance and the minimum assignment margin to prove the
      agreement is numeric fact, not luck (the lsh_proj_cte precedent);
    - empty clusters keep their previous centroid (replayable carry-over,
      unlike farthest-point reseeding);
    - a FIXED iteration count (no convergence test) so the replay unrolls
      statically.

    Scale shape: assignment is a narrow projection over broadcast centroid
    literals (k·dim doubles — bytes); the update is one posexplode +
    groupBy(bucket, pos) avg — k·dim result rows to the driver per
    iteration. 1000 executors scan; nothing all-to-all.

    The fit itself is ENFORCED-bounded (round 12): ``fit`` never collects
    more than ``max_fit_rows`` rows to the driver. When the input exceeds
    the bound, the fit set is the ``max_fit_rows`` rows with the smallest
    ``(md5(cast(id as string)), id)`` — the same pure-expression order the
    init already uses, so the selection is a deterministic prefix both
    engines compute identically and the DuckDB replay stays exact
    (``suite.similarity.kmeans_cte(max_fit_rows=...)`` embeds the same
    ``ORDER BY md5(id), id LIMIT n`` rule). Spark executes the bound as
    TakeOrderedAndProject: only ~max_fit_rows rows ever cross to the
    driver, no matter the corpus size — centroids need a sample, not the
    corpus, and now that is a contract, not a caller convention.
    """

    def __init__(
        self,
        k: int = 8,
        iters: int = 5,
        round_to: int = 6,
        max_fit_rows: int | None = 100_000,
    ):
        if max_fit_rows is not None and max_fit_rows < k:
            raise ValueError(f"max_fit_rows={max_fit_rows} must be >= k={k}")
        self.k = k
        self.iters = iters
        self.round_to = round_to
        self.max_fit_rows = max_fit_rows
        self.n_fit_rows_: int | None = None
        self.centers: list[list[float]] | None = None
        # centroids after init and after each iteration — the per-iteration
        # replay-equality tests compare these against the DuckDB CTE chain
        self.history: list[list[list[float]]] = []

    @staticmethod
    def assign_expr(vec: Column, centers: list[list[float]]) -> Column:
        """argmin-distance cluster id as a pure Column expression: an array
        of (squared-L2, cluster-id) structs reduced with array_min —
        lexicographic struct order makes 'ties to lowest id' explicit."""
        structs = []
        for cid, ctr in enumerate(centers):
            # one array-literal py4j call per centroid, not one F.lit per
            # element: k=32 x dim=64 was ~2k driver round trips (~2.5 s of
            # plan-construction time) per assign (optimization round 14)
            carr = F.lit([float(x) for x in ctr])
            d = F.aggregate(
                F.zip_with(vec, carr, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            structs.append(F.struct(d.alias("d"), F.lit(cid).alias("c")))
        return F.array_min(F.array(*structs)).getField("c")

    def fit(self, df: DataFrame, id_col: str, vec_col: str) -> "KMeansDF":
        # ONE bounded collect, then the Lloyd loop runs driver-side in
        # numpy: the expression-based per-iteration jobs cost ~4M
        # interpreted HOF evaluations each at suite scale (measured: the
        # n=2000/k=32 fit dominated its bench row at 18s; this path is
        # ~1s). Engine parity is preserved exactly: the arithmetic below
        # mirrors the SQL replay op-for-op, the margins tests bound every
        # argmin/rounding decision away from float noise, and
        # test_duckdb_replay_matches_spark_every_iteration asserts
        # per-iteration centroid equality vs DuckDB bit-for-bit. The
        # max_fit_rows bound is enforced HERE (not by caller convention):
        # the orderBy+limit plans as TakeOrderedAndProject, so the driver
        # sees at most max_fit_rows rows regardless of input size, and the
        # md5-order prefix rule replays exactly in DuckDB (kmeans_cte's
        # vf CTE) — see tests/test_kmeans_bounded_fit.py.
        import hashlib

        fit_src = df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        if self.max_fit_rows is not None:
            fit_src = fit_src.orderBy(
                F.md5(F.col("_id").cast("string")), F.col("_id")
            ).limit(self.max_fit_rows)
        rows = fit_src.collect()
        self.n_fit_rows_ = len(rows)
        ids = [r._id for r in rows]
        vecs = np.array([list(r._v) for r in rows], dtype="float64")
        order = sorted(
            range(len(ids)),
            key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]),
        )
        centers = vecs[order[: self.k]].copy()
        self.history = [[list(c) for c in centers]]
        scale = 10.0**self.round_to
        for _ in range(self.iters):
            d = ((vecs[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)  # ties -> lowest index (argmin contract)
            new = centers.copy()
            for c in range(self.k):
                mask = assign == c
                if mask.any():
                    mean = vecs[mask].mean(axis=0)
                    # round-half-away-from-zero == Spark HALF_UP == DuckDB
                    # round (numpy's np.round is banker's — never used);
                    # margin-guarded: every mean sits >= 1e-6 from its
                    # rounding boundary (test_margins_dominate_summation_noise)
                    new[c] = np.sign(mean) * np.floor(np.abs(mean) * scale + 0.5) / scale
            centers = new
            self.history.append([list(c) for c in centers])
        self.centers = [list(c) for c in centers]
        return self


class IVFIndexDF(IVFIndex):
    """IVF ANN on the deterministic ``KMeansDF`` quantizer: same
    assign/search surface as ``IVFIndex`` but every step — init, Lloyd
    iterations, bucket assignment, probe ranking — is an engine-agnostic
    derivation, so a DuckDB oracle replays the full approximate result set
    (see suite/similarity.py:Q_SIMILARITY_IVF_TOPK_SQL). Use this where
    verifiability matters; the pyspark.ml variant remains for learned
    sample-based quantizers. The fit collect is enforced-bounded by
    ``max_fit_rows`` (deterministic md5-order prefix — see KMeansDF)."""

    def __init__(
        self,
        n_lists: int = 8,
        iters: int = 5,
        round_to: int = 6,
        max_fit_rows: int | None = 100_000,
    ):
        super().__init__(n_lists=n_lists)
        self.km = KMeansDF(
            k=n_lists, iters=iters, round_to=round_to, max_fit_rows=max_fit_rows
        )

    def fit(self, df: DataFrame, vec_col: str, id_col: str = "vec_id") -> "IVFIndexDF":
        self.km.fit(df, id_col, vec_col)
        return self

    def save(self, path: str, spark=None) -> None:
        """Persist the deterministic quantizer as plain data: one parquet
        of (cid, cv) centroid rows plus the fit config as literal columns
        — not the ml-native writer (IVFIndexDF has no self.model; the base
        save() would crash on None and the base load() would silently
        return a non-deterministic ml-backed index, losing exactly the
        replayability this subclass exists for). ``spark`` may be passed
        explicitly (ADVICE r12: getActiveSession() returns None on
        threads without an active session — that used to surface as an
        AttributeError)."""
        from pyspark.sql import SparkSession

        if self.km.centers is None:
            raise ValueError("save() before fit(): no centers to persist")
        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "IVFIndexDF.save: no active SparkSession on this thread — "
                "pass spark explicitly (save(path, spark))"
            )
        rows = [
            (cid, [float(x) for x in cv], self.km.iters, self.km.round_to,
             self.km.max_fit_rows)
            for cid, cv in enumerate(self.km.centers)
        ]
        # LocalRelation (guide §4): the list form would put these rows in a
        # 32-partition Python RDD whose coalesce(1) pays one Python-worker
        # round trip per partition inside a single task (~5 s per save)
        from etl_file_loader_spark.functions import local_rows_df

        local_rows_df(
            spark, rows, "cid int, cv array<double>, iters int, round_to int, max_fit_rows int"
        ).coalesce(1).write.mode("overwrite").parquet(path)

    @classmethod
    def load(cls, path: str, spark=None) -> "IVFIndexDF":
        from pyspark.sql import SparkSession

        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "IVFIndexDF.load: no active SparkSession on this thread — "
                "pass spark explicitly (load(path, spark))"
            )
        rows = spark.read.parquet(path).orderBy("cid").collect()
        if not rows:
            raise ValueError(
                f"IVFIndexDF.load: no centroid rows at {path!r} — the save "
                "was interrupted or the path is wrong"
            )
        meta = rows[0]
        idx = cls(
            n_lists=len(rows),
            iters=meta.iters,
            round_to=meta.round_to,
            max_fit_rows=meta.max_fit_rows,
        )
        idx.km.centers = [list(r.cv) for r in rows]
        return idx

    def assign(self, df: DataFrame, vec_col: str) -> DataFrame:
        return df.withColumn(
            "_ivf_bucket",
            KMeansDF.assign_expr(
                F.col(vec_col).cast("array<double>"), self.km.centers
            ),
        )

    def _centers_list(self) -> list:
        return [np.asarray(c, dtype="float64") for c in self.km.centers]


def write_ivf_index(
    df: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
    n_lists: int = 16,
    seed: int = 42,
    fit_fraction: float | None = None,
) -> IVFIndex:
    """Persist an IVF index: bucket-partitioned vectors + the quantizer.

    Layout: ``path/data`` is the assigned table `partitionBy(_ivf_bucket)`
    (probes prune partitions at file listing, like ``write_lsh_index``);
    ``path/model`` is the fitted KMeans quantizer via the ml-native writer
    — unlike the data-independent hyperplanes, IVF has learned state that
    the query side must share. Fit on ``fit_fraction`` of the corpus when
    the full pass is wasteful (centroids need a sample, not the corpus).
    """
    fit_df = df.sample(fraction=fit_fraction, seed=seed) if fit_fraction else df
    idx = IVFIndex(n_lists=n_lists, seed=seed).fit(fit_df, vec_col)
    assigned = idx.assign(df, vec_col)
    assigned.write.mode("overwrite").partitionBy("_ivf_bucket").parquet(path + "/data")
    idx.save(path + "/model")
    return idx


def ivf_topk_indexed(
    spark,
    index_path: str,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 3,
    round_to: int = 4,
) -> DataFrame:
    """Top-k against a ``write_ivf_index`` table: reload the quantizer,
    rank centroids driver-side, scan only the n_probe closest bucket
    partitions (PartitionFilters). Scores identical to ``IVFIndex.search``
    over the same assignment."""
    idx = IVFIndex.load(index_path + "/model")
    assigned = spark.read.parquet(index_path + "/data")
    return idx.search(
        assigned, id_col, vec_col, query_vec, k=k, n_probe=n_probe, round_to=round_to
    )


class PQEncoder:
    """Product quantization: compress ``dim``-float vectors into ``m`` small
    codes (one per subspace) and score queries against the codes alone.

    The memory/IO rung of the ANN ladder (brute -> LSH -> IVF -> PQ): a
    64-dim float vector becomes m=8 codes into 16-entry codebooks — 32x
    smaller at byte storage — and ADC (asymmetric distance computation)
    scores a query against ONLY the codes via an m x ksub lookup table
    built once per query. At 100 TB the encoded table is what scans; the
    raw vectors stay cold.

    fit() runs Lloyd's k-means per subspace on a BOUNDED driver sample
    (codebooks need a sample, not the corpus — same rationale as the IVF
    ``fit_fraction``); encode() is one Arrow-batched argmin pass over the
    corpus (no shuffle); adc_topk() is a pure-expression table lookup fold
    — scan + TakeOrdered, the same plan shape as ``cosine_topk``.
    """

    def __init__(self, m: int = 8, ksub: int = 16, seed: int = 42):
        self.m = m
        self.ksub = ksub
        self.seed = seed
        self.codebooks: "np.ndarray | None" = None  # (m, ksub, dsub)

    def fit(
        self,
        df: DataFrame,
        vec_col: str,
        sample_rows: int = 10_000,
        order_col: str | None = None,
    ) -> "PQEncoder":
        base = df
        if order_col:
            # deterministic sample (TakeOrdered top-N, not a full sort)
            base = base.orderBy(order_col)
        rows = (
            base.select(F.col(vec_col).cast("array<double>").alias("v"))
            .limit(sample_rows)
            .collect()
        )
        sample = np.asarray([r["v"] for r in rows], dtype=np.float64)
        n, dim = sample.shape
        if dim % self.m != 0:
            raise ValueError(f"dim ({dim}) must divide evenly into m={self.m} subspaces")
        dsub = dim // self.m
        rng = np.random.default_rng(self.seed)
        books = np.empty((self.m, self.ksub, dsub), dtype=np.float64)
        for j in range(self.m):
            sub = sample[:, j * dsub : (j + 1) * dsub]
            # deterministic seeded init + 20 Lloyd iterations; empty clusters
            # re-seed from the farthest points
            centers = sub[rng.choice(n, size=self.ksub, replace=n < self.ksub)]
            for _ in range(20):
                d2 = ((sub[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
                assign = d2.argmin(axis=1)
                for c in range(self.ksub):
                    members = sub[assign == c]
                    if len(members):
                        centers[c] = members.mean(axis=0)
                    else:
                        centers[c] = sub[d2.min(axis=1).argmax()]
            books[j] = centers
        self.codebooks = books
        return self

    def encode(self, df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        """(id, pq_code array<int>): per-subspace nearest-codebook-entry
        assignment, one Arrow argmin pass, zero shuffle."""
        from pyspark.sql.functions import pandas_udf

        books = self.codebooks
        m, ksub, dsub = books.shape

        @pandas_udf("array<int>")
        def _enc(vs: pd.Series) -> pd.Series:
            out = []
            for v in vs:
                x = np.asarray(v, dtype=np.float64).reshape(m, dsub)
                # (m, ksub) distances: ||x_j - c_jk||^2 per subspace
                d2 = ((x[:, None, :] - books) ** 2).sum(axis=2)
                out.append([int(c) for c in d2.argmin(axis=1)])
            return pd.Series(out)

        return df.select(F.col(id_col), _enc(F.col(vec_col)).alias("pq_code"))

    def adc_topk(
        self,
        encoded: DataFrame,
        id_col: str,
        query_vec: list[float],
        k: int = 10,
        round_to: int = 6,
    ) -> DataFrame:
        """Top-k nearest (smallest approximate L2) rows by ADC: the query's
        distance to every codebook entry is a tiny m x ksub literal table;
        each row's score is an expression fold of m table lookups — no
        vectors read, no Python, no shuffle before the final TakeOrdered."""
        books = self.codebooks
        m, ksub, dsub = books.shape
        q = np.asarray(query_vec, dtype=np.float64).reshape(m, dsub)
        table = ((q[:, None, :] - books) ** 2).sum(axis=2)  # (m, ksub)
        tbl = F.array(
            *[F.array(*[F.lit(float(table[j, c])) for c in range(ksub)]) for j in range(m)]
        )
        dist = F.aggregate(
            F.zip_with(
                tbl,
                F.col("pq_code"),
                lambda row, code: F.element_at(row, code + 1),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (
            encoded.select(F.col(id_col), F.round(dist, round_to).alias("adc_dist"))
            .orderBy(F.col("adc_dist").asc(), F.col(id_col))
            .limit(k)
        )

    def save(self, path: str, spark=None) -> None:
        """Persist codebooks as a tiny parquet table (subspace, code,
        center). ``spark`` is optional like the rest of the index family
        (round 13 signature unification — it was the one member that
        REQUIRED the session positionally)."""
        from pyspark.sql import SparkSession

        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "PQEncoder.save: no active SparkSession on this thread — "
                "pass spark explicitly (save(path, spark))"
            )
        m, ksub, dsub = self.codebooks.shape
        rows = [
            (j, c, [float(x) for x in self.codebooks[j, c]])
            for j in range(m)
            for c in range(ksub)
        ]
        from etl_file_loader_spark.functions import local_rows_df

        # LocalRelation, not a 32-partition Python RDD (guide §4)
        local_rows_df(
            spark, rows, "subspace int, code int, center array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(path)

    @classmethod
    def load(cls, path: str, spark=None, seed: int = 42) -> "PQEncoder":
        from pyspark.sql import SparkSession

        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "PQEncoder.load: no active SparkSession on this thread — "
                "pass spark explicitly (load(path, spark))"
            )
        rows = spark.read.parquet(path).collect()
        if not rows:
            raise ValueError(
                f"PQEncoder.load: no codebook rows at {path!r} — the save "
                "was interrupted or the path is wrong"
            )
        m = max(r["subspace"] for r in rows) + 1
        ksub = max(r["code"] for r in rows) + 1
        dsub = len(rows[0]["center"])
        books = np.empty((m, ksub, dsub), dtype=np.float64)
        for r in rows:
            books[r["subspace"], r["code"]] = r["center"]
        enc = cls(m=m, ksub=ksub, seed=seed)
        enc.codebooks = books
        return enc


def pq_topk_rerank(
    enc: PQEncoder,
    encoded: DataFrame,
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    oversample: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """The production PQ pattern (FAISS-style refine): ADC over the code
    table produces a k*oversample shortlist — the only full scan, and it
    reads codes, not vectors — then the shortlist joins back to the raw
    vectors for an EXACT L2 rerank. The rerank side is k*oversample rows
    (broadcast), so the expensive scan never touches a float vector.

    Raw ADC ordering is quantization-noisy on near-orthogonal data
    (adjacent true distances differ by less than the cell error); the
    shortlist absorbs that noise — measured 100% recall@10 at
    m=16/ksub=16/oversample=5 where raw ADC top-10 held 20%.
    """
    short = enc.adc_topk(encoded, id_col, query_vec, k=k * oversample).select(id_col)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    l2 = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"), q, lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        df.join(F.broadcast(short), id_col)
        .select(F.col(id_col), F.round(l2, round_to).alias("l2_dist"))
        .orderBy(F.col("l2_dist").asc(), F.col(id_col))
        .limit(k)
    )
