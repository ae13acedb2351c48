"""Corpus sampling & shard packing (training-data pipeline extensions).

Two operations every large-scale LLM data pipeline needs between curation
and training:

- **Deterministic stratified sampling**: keep a per-stratum fraction of
  documents (e.g. rebalance languages) WITHOUT randomness — membership is a
  pure function of the document id, so reruns, backfills, and incremental
  loads select the same rows. Spark plan: one filter, zero shuffles; the
  predicate pushes into the scan.

- **Shard packing**: assign documents to fixed token-budget shards in a
  deterministic order — the unit of work for tokenizer/training jobs.
  Spark plan: prefix-sum over a window; with ``partition_cols`` the window
  runs per partition (parallel, the 100 TB path — shards are then named
  (partition, local_shard)); without, a single global ordering (small-corpus
  path, documented single-partition window).

No randomness anywhere: both are reproducible functions of the data, which
is what makes them DuckDB-oracle-checkable row for row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_file_loader_spark.functions import local_rows_df, tokens

# one part in _SAMPLE_DENOM resolution for sampling rates
_SAMPLE_DENOM = 10_000


def sample_key(id_col: Column) -> Column:
    """Deterministic pseudo-uniform key in [0, 10000) from a document id.

    md5-derived (portable: DuckDB computes the identical value as
    ``('0x' || substr(md5(x), 1, 8))::BIGINT % 10000``), uniform enough for
    rate selection, and independent of row order or partitioning.
    """
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(_SAMPLE_DENOM))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep ~rate fraction of each stratum, deterministically by id.

    ``rates`` maps stratum value -> fraction in [0, 1]; unlisted strata get
    ``default_rate``. A document is kept iff sample_key(id) < rate * 10000,
    so the same document is kept in every rerun and in any engine computing
    the same md5 — no RNG, no seed plumbing, no shuffle. At 100 TB this is
    a scan-side filter with zero data movement.
    """
    expr: Column = F.lit(int(default_rate * _SAMPLE_DENOM))
    for value, rate in sorted(rates.items()):
        expr = F.when(
            F.col(strata_col) == value, F.lit(int(rate * _SAMPLE_DENOM))
        ).otherwise(expr)
    return df.filter(sample_key(F.col(id_col)) < expr)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic and
    engine-replayable: Efraimidis-Spirakis exponential races.

    Each row gets key = ln(u) / w with u the md5-derived uniform of its
    id — equivalently an Exp(w) race where the k SMALLEST arrival times
    win, expressed as top-k by key (ln(u) < 0, so dividing by a larger
    weight pulls the key toward 0). Selection probability is exactly
    proportional to weight under sequential removal — the classic A-ES
    result — yet there is no RNG: the same ids win in every rerun and in
    any engine computing the same md5 (the suite oracle replays the full
    selection; ties broken by id).

    Rows with weight <= 0 are excluded (their race never finishes).

    Plan shape: the row_number filter compiles to WindowGroupLimit, so
    every map task pre-keeps only its local top-k per group BEFORE the
    exchange — the same rank-pushdown the KMV sketch build rides; shuffle
    volume is ~k rows per group regardless of input size. The
    training-mix use case: per-domain / per-language document draws
    proportional to quality or inverse-frequency weights.
    """
    from etl_file_loader_spark.operators.sketches import kmv_hash

    u = (kmv_hash(F.col(id_col)) + F.lit(1)).cast("double") / F.lit(
        float(1 << 60)
    )
    key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(*(group_cols or [])).orderBy(
        F.col("_ws_key").desc(), F.col(id_col)
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_ws_key", key)
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
        .drop("_ws_key")
    )


def shuffle_key(id_col: Column, seed: str = "shuffle") -> Column:
    """Deterministic pseudorandom ordering key for training-data shuffling.

    Training wants documents decorrelated from ingest order (source, crawl
    date, URL locality); a distributed engine wants NO global random state.
    Ordering by ``md5(seed|id)`` gives every engine the same permutation —
    reshardable, resumable, seed-controlled. 16 hex chars -> a 63-bit key,
    collision-negligible; ties (if any) break on the id downstream.

    At scale: never globally sort by this key — partition by its high bits
    (or pack per partition) so the "shuffle" is a partition assignment plus
    small per-partition sorts, the standard shuffled-shard layout.
    """
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + "|"), id_col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Deterministic dataset splitting: add a ``split`` label ('train' /
    'valid' / ...) from contiguous hash-key ranges.

    ``fractions`` maps label -> fraction; labels claim ranges of
    ``sample_key`` in the dict's iteration order, so a document's label is
    a pure function of its id — stable across reruns, engines, and corpus
    growth (new docs never move old docs between splits, the property that
    keeps a held-out set held out). Fractions may sum to < 1: the remainder
    gets a NULL label (not selected), which composes splitting with
    sampling in one pass. The salt decorrelates this key from
    ``stratified_sample``'s (same md5 scheme, different input).

    Scan-side projection — zero shuffles, zero data movement at any scale.
    """
    key = sample_key(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
    expr: Column = F.lit(None).cast("string")
    cum = 0.0
    branches: list[tuple[int, str]] = []
    for label, frac in fractions.items():
        cum += frac
        branches.append((int(round(cum * _SAMPLE_DENOM)), label))
    for hi, label in reversed(branches):
        expr = F.when(key < hi, F.lit(label)).otherwise(expr)
    return df.withColumn("split", expr)


def weighted_repeat(
    df: DataFrame,
    id_col: str,
    weight: Column,
    salt: str = "rep",
) -> DataFrame:
    """Deterministic non-integer upsampling: repeat each row
    floor(w) + Bernoulli(frac(w)) times, adding an ``_epoch`` copy index.

    The mixture-weighting primitive for training-data assembly ("see
    Wikipedia 2.4 epochs, CommonCrawl 0.7"): the fractional part resolves
    per document through the salted hash key, so exactly ~frac(w) of the
    affected docs gain the extra copy, the SAME docs every run. w < 1 is
    downsampling (some docs drop to 0 copies), w > 1 upsampling — one op
    covers the whole mixture schedule.

    One projection + one explode; output rows ∝ Σ w_i. No shuffle. Copies
    carry ``_epoch`` (1-based) so downstream shuffling/packing can spread
    epochs apart.
    """
    key = sample_key(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
    w = weight.cast("double")
    n_copies = (
        F.floor(w).cast("long")
        + (key < F.round((w - F.floor(w)) * _SAMPLE_DENOM)).cast("long")
    )
    seq = F.when(n_copies >= 1, F.sequence(F.lit(1).cast("long"), n_copies)).otherwise(
        F.array().cast("array<long>")
    )
    return df.withColumn("_epoch", F.explode(seq))


def pack_shards(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    partition_cols: list[str] | None = None,
    allow_global_sort: bool = False,
    order_col: str | None = None,
) -> DataFrame:
    """Assign each doc a ``shard_id``: sequential fixed-token-budget packing.

    Docs are taken in ascending ``id_col`` order; a doc belongs to the shard
    its EXCLUSIVE prefix token sum falls in (``floor(prefix_sum / budget)``)
    — the streaming packer: a shard closes once its budget is crossed, and
    the straddling doc stays in the shard it started in. Deterministic, so
    shard manifests are reproducible.

    Partitioned packing is the default and the 100 TB path: with
    ``partition_cols`` (e.g. language, date) the window parallelizes across
    partitions and shard ids are per-partition counters (name shards
    (partition..., shard_id)). The global variant orders the whole frame in
    ONE window partition — a single-task sort that cannot scale — so it
    must be opted into explicitly with ``allow_global_sort=True``
    (small-corpus / oracle-twin use only).

    ``order_col`` overrides the packing order (e.g. a ``shuffle_key``
    column for decorrelated training order); ``id_col`` stays the
    tiebreak, keeping manifests deterministic under key collisions.
    """
    order = [order_col, id_col] if order_col else [id_col]
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(*order)
    elif allow_global_sort:
        w = Window.orderBy(*order)
    else:
        raise ValueError(
            "pack_shards without partition_cols is a single-task global sort; "
            "pass partition_cols (scale path) or allow_global_sort=True "
            "(small corpora only)"
        )
    prefix = F.coalesce(
        F.sum(F.col(token_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return df.withColumn(
        "shard_id", F.floor(prefix / F.lit(budget)).cast("long")
    )


# sentences: maximal runs of non-terminators plus their trailing [.!?]+ —
# RE2/Java-compatible (no lookbehind), shared verbatim with the oracle
SENTENCE_PATTERN = r"[^.!?]+[.!?]*"


def sentence_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 64,
    overlap: int = 1,
) -> DataFrame:
    """Sentence-aware retrieval chunking (the RAG splitter): pack
    CONSECUTIVE sentences greedily into chunks of at most ``max_tokens``
    whitespace tokens, each next chunk re-starting at the previous
    chunk's last ``overlap`` sentences (context carry-over). A sentence
    longer than the budget gets its own chunk — progress is guaranteed.
    Complements ``sequence_chunks`` (fixed token windows, mid-sentence
    cuts): this one never splits a sentence.

    Plan shape: sentence extraction + token counting are JVM HOF
    expressions over the scan; ONLY the greedy walk (inherently
    sequential per doc, integer-arithmetic) is Python — an Arrow-batched
    pandas UDF mapping the per-doc token-count array to (start, end)
    boundary structs. Explode + JVM slice/md5 finish the chunks. Zero
    shuffles — scan-shaped at any corpus size.

    Cross-engine: the oracle replays the walk exactly (per-start max-end
    table over prefix sums + a recursive CTE), so chunk boundaries,
    token counts, and chunk md5s are value-verified (suite
    ``sentence_chunks_check``).
    """
    from pyspark.sql.functions import pandas_udf

    if max_tokens < 1 or overlap < 0:
        raise ValueError("max_tokens must be >= 1 and overlap >= 0")

    sents = F.filter(
        F.regexp_extract_all(F.col(text_col), F.lit(SENTENCE_PATTERN), 0),
        lambda s: F.trim(s) != "",
    )
    tok_counts = F.transform(sents, lambda s: F.size(tokens(s)))

    budget, o = max_tokens, overlap

    @pandas_udf("array<struct<start:int,end:int>>")
    def _bounds(tcs: pd.Series) -> pd.Series:
        out = []
        for tc in tcs:
            if tc is None:
                out.append([])
                continue
            bounds = []
            i, n = 0, len(tc)
            while i < n:
                j, s = i, int(tc[i])
                while j + 1 < n and s + int(tc[j + 1]) <= budget:
                    j += 1
                    s += int(tc[j])
                bounds.append((i, j))
                if j == n - 1:
                    break  # last sentence covered: no overlap-only tail chunk
                nxt = j - o + 1
                i = nxt if nxt > i else j + 1
            out.append(bounds)
        return pd.Series(out)

    base = df.select(
        F.col(id_col),
        sents.alias("_sents"),
        tok_counts.alias("_tc"),
    ).withColumn("_b", _bounds(F.col("_tc")))
    ex = base.select(
        id_col,
        "_sents",
        "_tc",
        F.posexplode("_b").alias("chunk_idx", "_bd"),
    )
    start1 = F.col("_bd.start") + 1  # slice is 1-based
    length = F.col("_bd.end") - F.col("_bd.start") + 1
    chunk_sents = F.slice("_sents", start1, length)
    chunk_tc = F.slice("_tc", start1, length)
    return ex.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        length.cast("long").alias("n_sentences"),
        F.aggregate(
            chunk_tc, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("n_tokens"),
        F.md5(F.array_join(chunk_sents, "|")).alias("chunk_md5"),
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    len_col: str,
    bucket_edges: list[int],
    batch_size: int,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Length-bucketed batching (the padding-efficiency trick every
    variable-length trainer uses): assign each row to a length bucket
    (``bucket`` = number of edges <= length), then form fixed-size
    batches WITHIN a bucket in deterministic id order — batch peers have
    similar lengths, so padding to the batch max wastes far less than
    batching across the whole length distribution.

    Adds ``bucket`` and ``batch_idx``. One window shuffle keyed on
    (partition_cols + bucket); at corpus scale pass shard/stream
    partition columns so no single window partition holds the corpus —
    the same contract as ``pack_shards``.
    """
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    b = F.lit(0)
    for e in bucket_edges:
        b = b + (F.col(len_col) >= F.lit(e)).cast("int")
    parts = list(partition_cols or [])
    w = Window.partitionBy(*parts, "bucket").orderBy(id_col)
    return (
        df.withColumn("bucket", b.cast("long"))
        .withColumn(
            "batch_idx",
            ((F.row_number().over(w) - 1) / F.lit(batch_size)).cast("long"),
        )
    )


def padding_stats(
    batched: DataFrame, len_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Per-batch padding accounting for a ``length_bucketed_batches``
    output: rows, max/sum length, and ``padding_frac`` = wasted fraction
    of the padded token rectangle ((max*n - sum) / (max*n) — integers
    then ONE division, cross-engine exact)."""
    keys = [*(group_cols or []), "bucket", "batch_idx"]
    agg = batched.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max(len_col).alias("max_len"),
        F.sum(len_col).alias("sum_len"),
    )
    rect = F.col("max_len") * F.col("n_rows")
    return agg.select(
        *keys,
        "n_rows",
        "max_len",
        "sum_len",
        ((rect - F.col("sum_len")).cast("double") / rect.cast("double")).alias(
            "padding_frac"
        ),
    )


def sequence_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int = 128,
    stride: int | None = None,
    tokenizer=None,
) -> DataFrame:
    """Split each document's token stream into fixed-length training
    sequences: chunk i covers tokens [i*stride, i*stride + seq_len).

    The tokenize-and-chunk step between curation and ``pack_shards``:
    ``stride == seq_len`` (default) gives non-overlapping chunks, a smaller
    stride gives overlapping context windows. Chunk starts advance while
    they remain inside the doc, so the final chunk may be short (no
    padding here — padding policy belongs to the collator). Empty docs
    yield no chunks.

    One projection + one explode; output rows ∝ corpus tokens / stride,
    zero shuffles — scan-shaped at any corpus size. Chunks carry a
    deterministic ``chunk_md5`` so downstream exact-dedup can run at
    sequence granularity (the RefinedWeb recipe).

    ``tokenizer`` (functions.tokenizers protocol) controls what a "token"
    is; default whitespace. Subword tokenizers make ``chunk_tokens`` a
    real training-token budget instead of a word count.
    """
    if stride is None:
        stride = seq_len
    if seq_len < 1 or stride < 1:
        raise ValueError(f"seq_len ({seq_len}) and stride ({stride}) must be >= 1")
    tok = tokenizer.tokens if tokenizer is not None else tokens
    base = df.select(
        F.col(id_col), tok(F.col(text_col)).alias("_toks")
    ).select(F.col(id_col), "_toks", F.size("_toks").alias("_n"))
    ex = base.filter(F.col("_n") > 0).select(
        F.col(id_col),
        "_toks",
        F.explode(
            F.sequence(
                F.lit(0), F.floor((F.col("_n") - 1) / F.lit(stride)).cast("int")
            )
        ).alias("chunk_idx"),
    )
    chunk = F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1, seq_len)
    return ex.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


def packed_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int = 128,
    partition_cols: list[str] | None = None,
    order_col: str | None = None,
    allow_global_sort: bool = False,
    boundary: str = "<|endofdoc|>",
    tokenizer=None,
) -> DataFrame:
    """GPT-style packed pretraining sequences: concatenate documents in
    training order with a boundary token after each, then emit fixed-length
    sequences that CROSS document boundaries (no padding waste — every
    sequence except the last is exactly ``seq_len`` tokens).

    This differs from :func:`sequence_chunks` (per-doc chunks, short tails)
    the way real pretraining data loaders differ from per-example batching:
    the token stream is continuous. The distributed formulation avoids any
    per-group materialization of the stream: a window prefix-sum gives each
    doc its global token offset, one explode emits (global_pos, token), and
    one shuffle on the sequence index reassembles fixed-length sequences —
    cost ∝ corpus tokens, parallel across ``partition_cols`` groups
    (language/source streams), never a single concatenated buffer.

    Like :func:`pack_shards`, the global variant is a single-task sort and
    must be opted into (``allow_global_sort=True``); ``order_col`` (e.g. a
    ``shuffle_key``) controls training order with ``id_col`` as tiebreak.

    Output per (partition..., seq_idx): token count, distinct docs spanned,
    and an order-sensitive content digest.

    ``tokenizer`` (functions.tokenizers protocol) controls the token
    stream; default whitespace. With a subword tokenizer the packed
    sequences carry real training-token budgets (the oracle-checked
    SubwordTokenizer keeps the layout cross-engine value-verifiable).

    Balance note (measured, tools/audit_partitions.py at sf1): the
    prefix-sum window partitions by ``partition_cols`` ALONE, and Catalyst
    correctly reuses that partitioning for the sequence aggregation (a
    hash(partition_cols) layout already co-locates every (partition,
    seq_idx) group — one shuffle, not two). The flip side: partition load
    tracks per-stream token mass (a 40%-English corpus puts 40% of the
    work in one partition, measured max/mean 2.07). The window's whole-
    stream ordering makes this inherent to the stream key — at scale pick
    ``partition_cols`` fine enough to bound any one stream (e.g.
    (lang, source) or (lang, date_bucket)), which multiplies parallelism
    while keeping each training stream contiguous and deterministic.
    """
    from etl_file_loader_spark.operators.skew import fan_out_scan

    # tokenization runs scan-side, BEFORE the prefix-sum window's
    # exchange: a single-split scan would tokenize the whole corpus in
    # one task (one Python worker under a subword tokenizer) — guide
    # §2.5, no-op at scale
    df = fan_out_scan(df, key_cols=[id_col])
    order = [order_col, id_col] if order_col else [id_col]
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(*order)
    elif allow_global_sort:
        w = Window.orderBy(*order)
    else:
        raise ValueError(
            "packed_sequences without partition_cols is a single-task global "
            "sort; pass partition_cols (scale path) or allow_global_sort=True "
            "(small corpora only)"
        )
    parts = [F.col(c) for c in (partition_cols or [])]
    keep = [F.col(id_col), *parts, *([F.col(order_col)] if order_col else [])]
    tok = tokenizer.tokens if tokenizer is not None else tokens
    base = df.select(
        *keep,
        F.concat(tok(F.col(text_col)), F.array(F.lit(boundary))).alias("_t2"),
    ).withColumn("_n", F.size("_t2"))
    off = base.withColumn(
        "_off",
        F.coalesce(
            F.sum("_n").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        ),
    )
    ex = off.select(
        F.col(id_col),
        *parts,
        F.col("_off"),
        F.posexplode(F.col("_t2")).alias("_pos", "_tok"),
    ).select(
        F.col(id_col),
        *parts,
        (F.col("_off") + F.col("_pos")).alias("_gpos"),
        F.col("_tok"),
    )
    seq = ex.select(
        F.col(id_col),
        *parts,
        F.floor(F.col("_gpos") / F.lit(seq_len)).cast("long").alias("seq_idx"),
        F.pmod(F.col("_gpos"), F.lit(seq_len)).cast("long").alias("_spos"),
        F.col("_tok"),
    )
    grouped = seq.groupBy(*(partition_cols or []), "seq_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct(F.col(id_col)).cast("long").alias("n_docs"),
        F.sort_array(
            F.collect_list(F.struct(F.col("_spos").alias("p"), F.col("_tok").alias("t")))
        ).alias("_toks"),
    )
    return grouped.select(
        *(partition_cols or []),
        "seq_idx",
        "n_tokens",
        "n_docs",
        F.md5(
            F.concat_ws(" ", F.transform(F.col("_toks"), lambda s: s["t"]))
        ).alias("seq_md5"),
    )


def cluster_balanced_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    target_per_cluster: int,
    n_clusters: int = 16,
    seed: int = 42,
    fit_fraction: float | None = None,
) -> DataFrame:
    """Diversity-preserving selection: k-means cluster the embedding space,
    then keep ~``target_per_cluster`` docs from EVERY cluster — big dense
    clusters (boilerplate, template text) downsample hard while rare
    regions keep everything.

    The cluster-balanced sampling recipe from dataset-curation work
    (SemDeDup's cousin: equalize representation instead of deleting
    near-dups). Mechanics: coarse quantizer fit on a sample, one assign
    pass, per-cluster keep rate min(1, target/size) resolved through the
    deterministic hash key — so reruns and engines agree doc-by-doc. The
    rate table is n_clusters rows (broadcast); the corpus path is scan +
    broadcast join + filter, no shuffle of kept data.

    Output: input rows (kept only) + ``_cluster`` id.
    """
    from etl_file_loader_spark.operators.similarity import IVFIndex

    fit_df = df.sample(fraction=fit_fraction, seed=seed) if fit_fraction else df
    idx = IVFIndex(n_lists=n_clusters, seed=seed).fit(fit_df, vec_col)
    assigned = idx.assign(df, vec_col).withColumnRenamed("_ivf_bucket", "_cluster")
    sizes = assigned.groupBy("_cluster").agg(F.count(F.lit(1)).alias("_m"))
    rates = sizes.select(
        "_cluster",
        F.least(
            F.lit(_SAMPLE_DENOM),
            F.ceil(F.lit(target_per_cluster * _SAMPLE_DENOM) / F.col("_m")).cast("int"),
        ).alias("_rate"),
    )
    keyed = assigned.join(F.broadcast(rates), "_cluster")
    return keyed.filter(
        sample_key(F.concat(F.lit("cbs|"), F.col(id_col).cast("string"))) < F.col("_rate")
    ).drop("_rate")


def write_training_shards(
    packed: DataFrame,
    path: str,
    token_col: str,
    partition_cols: list[str] | None = None,
) -> None:
    """Persist a ``pack_shards`` output as the on-disk training layout:
    data partitioned by (partition..., shard_id) plus a ``_manifest``
    table (doc/token counts per shard — the tokenizer work list).

    A trainer reading one shard filters on ``shard_id`` (and stream keys),
    which Spark resolves as PartitionFilters at file listing — the read
    cost is one shard's files, independent of corpus size. This is the
    hand-off point: everything upstream (dedup, filtering, splitting,
    shuffling, packing) ends in this directory.
    """
    keys = [*(partition_cols or []), "shard_id"]
    packed.write.partitionBy(*keys).mode("overwrite").parquet(f"{path}/data")
    shard_manifest(packed, token_col, partition_cols).write.mode("overwrite").parquet(
        f"{path}/_manifest"
    )


def read_shard(spark, path: str, shard_id: int, **partition_values) -> DataFrame:
    """Read one training shard via partition-pruned scan (PartitionFilters,
    never a full-corpus listing). ``partition_values`` filter the stream
    keys (e.g. ``lang="en"``)."""
    df = spark.read.parquet(f"{path}/data").filter(F.col("shard_id") == shard_id)
    for k, v in partition_values.items():
        df = df.filter(F.col(k) == v)
    return df


def shard_manifest(
    packed: DataFrame, token_col: str, partition_cols: list[str] | None = None
) -> DataFrame:
    """Per-shard rollup: doc count + token total (the tokenizer work list)."""
    keys = [*(partition_cols or []), "shard_id"]
    return (
        packed.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.col(token_col)).cast("long").alias("tokens"),
        )
        .orderBy(*keys)
    )


def temperature_mixture(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    size_col: str,
    alpha: float = 0.5,
    budget: float | None = None,
    max_epochs: float | None = None,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-based domain mixture with an epoch cap — the UniMax /
    multilingual alpha-sampling schedule (Conneau-Lample temperature
    sampling; Chung et al. 2023 UniMax caps): resample each domain toward

        ``p_d ∝ T_d^alpha``   (T_d = the domain's total ``size_col``)

    so low-resource domains are boosted and high-resource ones tempered
    (alpha = 1 keeps natural proportions, alpha -> 0 approaches uniform),
    with ``max_epochs`` bounding any domain's repeat factor (the UniMax
    rule: never see a corpus more than N times, spend the leftover budget
    elsewhere). The per-domain weight is ``B * T_d^alpha / Σ T^alpha /
    T_d`` (B = ``budget``, default the corpus's own total size), applied
    through :func:`weighted_repeat`'s deterministic per-doc Bernoulli.

    Cross-engine determinism discipline: domain totals are EXACT integer
    sums; the normalizer folds ``T^alpha`` over the ascending-domain
    array (canonical order); alpha = 0.5 uses ``sqrt`` (IEEE-exact in
    every engine, unlike ``pow``'s 1-ulp license — the suite oracle runs
    this alpha); the weight is ONE left-to-right double expression.

    Plan shape (100 TB): one map-side-combinable aggregate to |domains|
    rows, a 1-row canonical fold, two broadcasts back — the corpus itself
    is never shuffled; the repeat explode is a narrow projection.
    Output: input columns + ``_mix_w`` (the applied weight) + ``_epoch``.
    """
    totals = df.groupBy(domain_col).agg(
        F.sum(F.col(size_col).cast("long")).alias("_T")
    )
    arr = totals.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(domain_col).alias("d"), F.col("_T").alias("t")))
        ).alias("_ds")
    )
    if alpha == 0.5:
        powf = lambda c: F.sqrt(c)  # noqa: E731 — sqrt is IEEE-exact; pow is not
    else:
        powf = lambda c: F.pow(c, F.lit(float(alpha)))  # noqa: E731
    scal = arr.select(
        F.aggregate(
            F.col("_ds"), F.lit(0.0), lambda a, s: a + powf(s["t"].cast("double"))
        ).alias("_norm"),
        F.aggregate(
            F.col("_ds"), F.lit(0).cast("long"), lambda a, s: a + s["t"]
        ).alias("_G"),
    )
    wtab = totals.crossJoin(F.broadcast(scal))
    b = F.lit(float(budget)) if budget is not None else F.col("_G").cast("double")
    w = (
        b
        * powf(F.col("_T").cast("double"))
        / F.col("_norm")
        / F.col("_T").cast("double")
    )
    if max_epochs is not None:
        w = F.least(w, F.lit(float(max_epochs)))
    wtab = wtab.select(F.col(domain_col), w.alias("_mix_w"))
    joined = df.join(F.broadcast(wtab), domain_col)
    return weighted_repeat(joined, id_col, F.col("_mix_w"), salt=salt)


# Supported magnitude ceiling for mixture_waterfill's exact-integer
# threshold math: with milli weights (Σw <= 1000) every cross-multiply
# stays <= 1000 * 9e15 = 9e18 < int64 max, so the capping predicate and
# the floor-division allocation are EXACT in both engines — the same
# ceiling discipline as sketches.QUANTILE_MAX_IV.
WATERFILL_MAX_TOKENS = 9_000_000_000_000_000  # 9e15


def mixture_waterfill(
    df: DataFrame,
    domain_col: str,
    size_col: str,
    weights_milli: dict[str, int] | DataFrame,
    budget: int,
) -> DataFrame:
    """Allocate a token ``budget`` across domains toward TARGET mixture
    weights, respecting per-domain availability — the waterfilling data-
    mixing solver (the step between "we want 50% en / 20% de / ..." and
    what the corpus can actually supply). Domains whose fair share
    exceeds their supply are CAPPED at it; the freed budget redistributes
    proportionally among the rest, recursively, until a fixpoint.

    Closed form instead of the textbook loop: sort positive-weight
    domains by fill ratio avail/w ascending; a domain caps iff it caps at
    the threshold its prefix implies —

        ``avail * (W - W_prev) <= w * max(budget - A_prev, 0)``

    (A_prev/W_prev = exclusive prefix sums of avail/weight in that
    order). Capping is prefix-closed under this order (capping a domain
    only RAISES the water level for the rest), so a running-AND over the
    sorted prefix turns the per-row test into the exact fixpoint set —
    one aggregate + one register-sized window, no iteration, no driver
    loop. Uncapped domains then split the remaining budget by weight:
    ``alloc = (w * B_rem) div W_rem`` (floor division; the <= |domains|
    rounding residue is documented, not redistributed).

    Exactness contract: weights are MILLI integers (each >= 0, sum in
    (0, 1000]); ``size_col`` sums and ``budget`` must stay <=
    WATERFILL_MAX_TOKENS (9e15). Then every comparison and division is
    exact int64 in Spark AND DuckDB — the whole allocation replays
    bit-for-bit in SQL. The sort key is the ratio as one double divide
    (deterministic IEEE op, identical in both engines), tie-broken by
    domain. ``weights_milli`` may also be a DataFrame of
    (``domain_col``, ``w_milli``) for table-resident mixture specs —
    same contract, validated with one register-sized aggregate.

    Plan shape (100 TB): one map-side-combinable aggregate to |domains|
    rows; everything after runs over that register-sized frame (the
    single-partition window is |domains| rows — the temperature_mixture
    precedent). The corpus itself is never shuffled. Output: one row per
    domain — ``avail``, ``w_milli``, ``capped`` (int), ``alloc``,
    ``rate`` (alloc/avail, 6 dp; the per-domain keep rate to feed
    :func:`stratified_sample` / :func:`weighted_repeat`).
    """
    budget = int(budget)
    if not 0 <= budget <= WATERFILL_MAX_TOKENS:
        raise ValueError(
            f"budget must be in [0, {WATERFILL_MAX_TOKENS}]: {budget}"
        )
    spark = df.sparkSession
    if isinstance(weights_milli, DataFrame):
        # table-resident mixture spec (large domain sets): columns
        # (domain_col, w_milli). The exactness contract still needs
        # Σw in (0, 1000] — validated with ONE register-sized aggregate
        # (1-row collect, audit precedent).
        wdf = weights_milli.select(
            F.col(domain_col), F.col("w_milli").cast("long").alias("w_milli")
        )
        chk = wdf.agg(
            F.sum("w_milli").alias("s"),
            F.min("w_milli").alias("mn"),
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(domain_col)).alias("nd"),
        ).collect()[0]
        if chk["mn"] is not None and chk["mn"] < 0:
            raise ValueError("weights_milli must be >= 0")
        if chk["s"] is None or not 0 < chk["s"] <= 1000:
            raise ValueError(
                "weights_milli must sum in (0, 1000] for exact int64 "
                f"math: {chk['s']}"
            )
        if chk["n"] != chk["nd"]:
            # ADVICE r13: duplicate domain rows pass the sum check but
            # fan out the totals join — double-counted avail/weight in
            # the window math and duplicate output rows, silently
            raise ValueError(
                "weights_milli has duplicate domain rows: "
                f"{chk['n']} rows over {chk['nd']} distinct {domain_col}"
            )
    else:
        ws = {str(k): int(v) for k, v in weights_milli.items()}
        if any(v < 0 for v in ws.values()):
            raise ValueError("weights_milli must be >= 0")
        wsum = sum(ws.values())
        if not 0 < wsum <= 1000:
            raise ValueError(
                f"weights_milli must sum in (0, 1000] for exact int64 math: {wsum}"
            )
        wdf = local_rows_df(
            spark, list(ws.items()), "domain string, w_milli long"
        ).withColumnRenamed("domain", domain_col)
    totals = df.groupBy(domain_col).agg(
        F.sum(F.col(size_col).cast("long")).alias("avail")
    )
    # ADVICE r13: budget is range-checked above but per-domain avail was
    # not — a domain above 9e15 silently overflows the avail*(W-W_prev)
    # cross-multiply (wrong cap decisions, no error). Guard in the same
    # pass (no extra job): the expression raises from the executor the
    # moment an over-ceiling sum materializes, mirroring the
    # quantile_histogram magnitude-clamp discipline with raise instead
    # of saturate (a saturated avail would silently mis-allocate).
    avail_checked = F.when(
        F.col("avail") > F.lit(WATERFILL_MAX_TOKENS),
        F.raise_error(
            F.concat(
                F.lit("mixture_waterfill: domain "),
                F.col(domain_col).cast("string"),
                F.lit(
                    f" avail exceeds WATERFILL_MAX_TOKENS"
                    f" ({WATERFILL_MAX_TOKENS}): "
                ),
                F.col("avail").cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.col("avail"))
    j = totals.join(F.broadcast(wdf), domain_col, "left").select(
        domain_col,
        avail_checked.alias("avail"),
        F.coalesce(F.col("w_milli"), F.lit(0)).cast("long").alias("w_milli"),
    )
    pos = j.filter(F.col("w_milli") > 0)
    zero = j.filter(F.col("w_milli") <= 0)
    ratio = F.col("avail").cast("double") / F.col("w_milli").cast("double")
    order = [ratio.asc(), F.col(domain_col).asc()]
    w_prev = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_run = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    b = F.lit(budget)
    staged = (
        pos.withColumn("_a_prev", F.coalesce(F.sum("avail").over(w_prev), F.lit(0)))
        .withColumn("_w_prev", F.coalesce(F.sum("w_milli").over(w_prev), F.lit(0)))
        .withColumn("_w_tot", F.sum("w_milli").over(w_all))
        .withColumn(
            "_pred",
            (
                F.col("avail") * (F.col("_w_tot") - F.col("_w_prev"))
                <= F.col("w_milli") * F.greatest(b - F.col("_a_prev"), F.lit(0))
            ).cast("int"),
        )
        .withColumn("capped", F.min("_pred").over(w_run))
        .withColumn("_cap_a", F.sum(F.col("capped") * F.col("avail")).over(w_all))
        .withColumn("_cap_w", F.sum(F.col("capped") * F.col("w_milli")).over(w_all))
    )
    b_rem = b - F.col("_cap_a")
    w_rem = F.col("_w_tot") - F.col("_cap_w")
    alloc = F.when(F.col("capped") == 1, F.col("avail")).otherwise(
        F.when(w_rem <= 0, F.lit(0)).otherwise(
            F.expr("(w_milli * _b_rem) div _w_rem")
        )
    )
    raced = (
        staged.withColumn("_b_rem", b_rem)
        .withColumn("_w_rem", w_rem)
        .withColumn("alloc", alloc)
        .select(domain_col, "avail", "w_milli", "capped", "alloc")
    )
    out = raced.unionByName(
        zero.select(
            domain_col,
            "avail",
            "w_milli",
            F.lit(0).alias("capped"),
            F.lit(0).cast("long").alias("alloc"),
        )
    )
    rate = F.when(
        F.col("avail") > 0,
        F.round(F.col("alloc").cast("double") / F.col("avail").cast("double"), 6),
    ).otherwise(F.lit(0.0))
    return out.withColumn("rate", rate)


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------


def _dsir_features(df: DataFrame, id_col: str, text_col: str, num_buckets: int) -> DataFrame:
    """(id, bkt) stream of hashed unigram + bigram features: the published
    DSIR featurization (hashed n-grams, n in {1,2}) with the house
    md5-prefix->int64 bucket idiom (bit-identical in DuckDB)."""
    from etl_file_loader_spark.functions import bind_once, token_hash32

    from etl_file_loader_spark.operators.skew import fan_out_scan

    # single-split scans run the whole feature explode in one task
    # (guide §2.5; no-op at scale)
    df = fan_out_scan(df, key_cols=[id_col])

    def feats(t: Column) -> Column:
        unis = F.transform(t, lambda w: F.lower(w))
        bis = F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat_ws(
                    " ", F.lower(F.element_at(t, i)), F.lower(F.element_at(t, i + 1))
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(unis, bis)

    toks = tokens(F.col(text_col))
    return df.select(
        F.col(id_col), F.explode(bind_once(toks, feats)).alias("_f")
    ).select(
        F.col(id_col), (token_hash32(F.col("_f")) % num_buckets).alias("_bkt")
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023): score every raw
    document by how target-like its hashed-n-gram profile is,

        log w(d) = sum_f c_f(d) * (ln p_target(f) - ln q_raw(f))

    under Laplace-``alpha``-smoothed bag-of-features models
    ``p(f) = (c_f + alpha) / (T + alpha*B)`` fit on the target and raw
    corpora respectively. Features are hashed unigrams + bigrams (the
    published featurization) in ``num_buckets`` buckets.

    Plan at 100 TB: two feature-count aggregates (shuffle ∝ corpus
    tokens, map-side combine), whose results are BOUNDED by B buckets —
    the log-ratio table broadcasts; per-doc scoring is one
    groupBy(id, bkt) count plus a broadcast join and an in-place fold, so
    no token-keyed shuffle join ever happens (contrast unigram_logprob's
    vocab join: the hash trick is what buys the bounded table).

    Cross-engine: fold in ascending-bucket order (canonical float
    summation, same discipline as the LM ladder); md5-prefix buckets are
    bit-identical in DuckDB; log-ratios are pure ln/arithmetic on
    identical doubles. Output: (id, n_feats, log_weight) for EVERY raw
    doc (featureless docs score 0.0 — the empty product).
    """
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    tgt = _dsir_features(target, id_col, text_col, num_buckets)
    rawf = _dsir_features(raw, id_col, text_col, num_buckets)

    # Each corpus is featurized ONCE (optimization round 14, guide §1.2 /
    # §2.4): totals derive from the bucket counts (sum over buckets ==
    # feature count) and the raw bucket counts derive from the per-doc
    # profile (sum of per-doc counts per bucket == bucket count) — exact
    # integer algebra, identical values. Spark has no common-subtree
    # sharing, so the OLD independent aggregates re-ran the explode per
    # consumer (raw 3x: cq + tq + prof; target 2x: ct + tt); derived
    # aggregates sit ABOVE their parent's exchange, which ReuseExchange
    # dedupes — one explode per corpus in the executed plan.
    prof = rawf.groupBy(id_col, "_bkt").agg(F.count(F.lit(1)).alias("_m"))
    ct = tgt.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_ct"))
    cq = prof.groupBy("_bkt").agg(F.sum("_m").cast("long").alias("_cq"))
    tt = ct.agg(F.sum("_ct").cast("long").alias("_tt"))
    tq = cq.agg(F.sum("_cq").cast("long").alias("_tq"))

    ab = float(alpha) * num_buckets
    lr_tab = (
        ct.join(cq, "_bkt", "full_outer")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tq))
        .select(
            F.col("_bkt"),
            (
                F.log(
                    (F.coalesce(F.col("_ct"), F.lit(0)).cast("double") + F.lit(float(alpha)))
                    / (F.col("_tt").cast("double") + F.lit(ab))
                )
                - F.log(
                    (F.coalesce(F.col("_cq"), F.lit(0)).cast("double") + F.lit(float(alpha)))
                    / (F.col("_tq").cast("double") + F.lit(ab))
                )
            ).alias("_lr"),
        )
    )

    doc = (
        prof.join(F.broadcast(lr_tab), "_bkt")
        .groupBy(id_col)
        .agg(
            F.sum("_m").cast("long").alias("n_feats"),
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("_bkt").cast("long").alias("bkt"),
                        F.col("_m").cast("long").alias("m"),
                        F.col("_lr").alias("lr"),
                    )
                )
            ).alias("_profile"),
        )
    )
    lw = F.aggregate(
        F.col("_profile"),
        F.lit(0.0),
        lambda acc, s: acc + s["m"].cast("double") * s["lr"],
    )
    scored = doc.select(
        F.col(id_col), F.col("n_feats"), F.round(lw, 6).alias("log_weight")
    )
    base = raw.select(F.col(id_col))
    return base.join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    num_buckets: int = 1024,
    alpha: float = 1.0,
    seed: str = "dsir",
) -> DataFrame:
    """DSIR selection: Gumbel-top-k resampling over :func:`dsir_weights`
    — sampling k docs WITHOUT replacement with probability ∝ w(d) equals
    taking the top k by ``log w(d) + Gumbel(0,1)`` (the Gumbel-max
    trick). The Gumbel draw is DETERMINISTIC: u from the doc id's
    md5-prefix (the house uniform idiom), g = -ln(-ln(u)) — reruns and
    both engines select the identical sample.

    Returns every raw doc with its selection key and a ``selected`` flag
    (the flag is a broadcast semi-probe against the top-k id set, and the
    top-k itself is a TakeOrderedAndProject — no global sort, no global
    window; at 100 TB the only added cost over scoring is one k-row
    broadcast). Keys are rounded to 6 places with doc-id tie-break so the
    cut is engine-stable.
    """
    from etl_file_loader_spark.functions import token_hash32

    if k < 1:
        raise ValueError("k must be >= 1")
    w = dsir_weights(raw, target, id_col, text_col, num_buckets, alpha)
    h = token_hash32(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed))
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.round(F.col("log_weight") - F.log(-F.log(u)), 6)
    keyed = w.select(
        F.col(id_col), "n_feats", "log_weight", key.alias("sel_key")
    )
    topk = (
        keyed.orderBy(F.col("sel_key").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col).alias("_sel_id"))
    )
    return keyed.join(
        F.broadcast(topk),
        keyed[id_col] == F.col("_sel_id"),
        "left",
    ).select(
        F.col(id_col),
        "n_feats",
        "log_weight",
        "sel_key",
        F.col("_sel_id").isNotNull().cast("int").cast("long").alias("selected"),
    )
