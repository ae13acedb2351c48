"""Regenerate PLANS.md: formatted physical plans of the plan-shape-critical
queries with the properties each plan must exhibit at 100 TB."""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_file_loader_spark import suite  # noqa: E402
from etl_file_loader_spark.session import get_spark  # noqa: E402

COMMENTARY = {
    "q1_pricing_summary": (
        "Scan-side: PushedFilters on l_shipdate + 7/11-column ReadSchema "
        "(pruning). One hash-partition exchange on the group keys after "
        "map-side partial aggregation — shuffled bytes ∝ distinct groups (6), "
        "not rows."
    ),
    "q5_local_supplier_volume": (
        "Dimension chain (region→nation, customer, supplier) broadcasts "
        "(BroadcastHashJoin / BroadcastExchange). At test scale even orders "
        "broadcasts, leaving ONE exchange total (the aggregate); at 100 TB "
        "cost stats flip lineitem⋈orders to a sort-merge join on orderkey — "
        "the plan Catalyst picks either way is the right one for the size."
    ),
    "merge_upsert": (
        "The MERGE rewrite: both sides exchange on the grain key once "
        "(sort-merge or shuffled-hash per AQE), then a single projection "
        "applies the hash-guarded update/insert/keep branches. At scale the "
        "target side's shuffle disappears if the table is bucketed by grain."
    ),
    "dedup_lsh_candidates": (
        "Minhash (one Arrow batch node) → band explode → ONE groupBy on "
        "(band_idx, band_hash) collecting member ids → pair explosion from "
        "the sorted arrays. The signature subtree appears exactly once and "
        "shuffles once; there is no self-join and no all-pairs stage — "
        "candidate volume is bounded by bucket collisions."
    ),
    "knn_join_lsh": (
        "Banding matmul (one Arrow node over a persisted slim frame) → JVM "
        "bucket equi-join for candidates → one einsum rescore per undirected "
        "pair → explode to both directions → per-id window top-k. The "
        "expensive subtrees (matmul, rescore) each appear once; candidate "
        "volume tracks bucket density, not n²."
    ),
    "q6_forecast_revenue": (
        "Every predicate (date range, discount band, quantity cap) lands in "
        "PushedFilters; ReadSchema is 4 of 11 columns; no exchange except "
        "the single-row final aggregate. The canonical scan-dominated plan."
    ),
    "stratified_sample": (
        "Sampling is a scan-side filter on an md5-derived key — zero "
        "shuffles before the tiny count aggregate, zero data movement for "
        "dropped strata. Rerun-stable with no RNG state."
    ),
    "shard_packing": (
        "Prefix-sum window PARTITIONED BY lang: one hash exchange on the "
        "partition key, per-partition sort, running sum — packing "
        "parallelizes across partitions instead of a global single-task "
        "sort."
    ),
    "asof_join": (
        "Union of tagged sides → single hash exchange on the key → one sort "
        "within partitions → running last(_r, ignorenulls). No range-join "
        "row explosion; window state is a single row."
    ),
    "similarity_topk": (
        "Narrow projection (fold-based dot product) → TakeOrderedAndProject: "
        "each partition computes local top-k, driver merges k·partitions "
        "rows. No exchange at all."
    ),
    "validate_split": (
        "The flagship validation operator: scan → ONE whole-stage-codegen'd "
        "projection (try_cast + error-array concat — no higher-order "
        "functions, which would break codegen) → zero exchanges. The errors "
        "column prunes away entirely for consumers that only read validity."
    ),
    "duplicated_windows": (
        "Exact substring-duplication stats. The exploded (doc, window) "
        "subtree appears twice — once to derive the duplicated-gram set, "
        "once as the probe side — deliberately recomputed from the scan "
        "rather than persisted: at 100 TB a corpus-sized intermediate is "
        "exactly what you don't materialize. All exchanges are key-shaped "
        "(gram, then doc_id), none row-shaped; the dup-gram set broadcasts "
        "at test scale and AQE flips it to a gram-keyed shuffled hash join "
        "at 100 TB. No pairwise stage anywhere."
    ),
    "semantic_dedup_clustered": (
        "Three bounded jobs: ml.KMeans fit on a cached SAMPLE (never the "
        "corpus); assign = one projection adding the bucket; dedup = "
        "within-cluster candidate pairs (self equi-join on the bucket over "
        "a persisted slim frame — pair volume Σ m_c²), Arrow einsum "
        "rescore, min-label components, LEFT ANTI of the small loser set "
        "(AQE broadcasts; the corpus never shuffles). Same tail shape as "
        "near_dedup_corpus with the k-means bucket replacing the band."
    ),
    "dedup_incremental_near": (
        "Delta-vs-corpus near-dedup (the streaming face shares the "
        "design): the corpus collapses to its band index (one row per "
        "distinct (band_idx, band_hash), min owner id) — the persisted "
        "artifact, size ∝ distinct content. Per batch: Arrow minhash "
        "projection (no shuffle) -> band explode -> flag join against the "
        "index (broadcast while small, band-keyed SMJ later — never keyed "
        "on rows). Nothing scales with history."
    ),
    "unigram_logprob": (
        "LM fit + score in one plan: explode -> vocab count (1 shuffle) -> "
        "token join back (AQE broadcast here; token-keyed SMJ at vocab "
        "scale with stream-side skew split for Zipf-hot tokens) -> per-doc "
        "aggs -> 1-row total via a bounded cross join -> left join to "
        "reinstate empty docs. ~5 real shuffles, all keyed on token or "
        "doc id — ∝ corpus tokens, which is what an LM pass costs."
    ),
    "packed_sequences": (
        "Window prefix-sum (per-language sort, parallel across "
        "partitions) -> posexplode of positioned tokens -> two-phase "
        "aggregate on (lang, seq_idx) -> ONE real exchange on the sequence "
        "key + the presentation sort. No per-group stream materialization "
        "anywhere; Generate feeds partial aggregation inside one stage."
    ),
    "simhash_dedup": (
        "Arrow fingerprint projection (no shuffle) -> fingerprint-quotient "
        "groupBy -> blocked candidates over DISTINCT fingerprints (join "
        "variant, streams template buckets) -> hamming rescore -> "
        "min-label components (localCheckpoint-bounded) -> loser union -> "
        "LeftAnti against the corpus scan (AQE broadcasts the small loser "
        "side). Every pairwise stage sees distinct content, not corpus "
        "rows."
    ),
    "packed_sequences_subword": (
        "Round 5: the subword tokenizer (regexp_extract_all + nested "
        "transform/substring) stays pure column expressions — no Python "
        "eval nodes anywhere. Catalyst reuses the prefix-sum window's "
        "partition_cols exchange for the sequence aggregation (hash(lang) "
        "already co-locates every (lang, seq_idx) group), so the whole "
        "layout costs the window exchange + the presentation sort and "
        "nothing else."
    ),
    "quality_classifier": (
        "Round 5 (fitted weights): the model rides the plan as a literal "
        "array; scoring is one scan-shaped projection (hash indices + "
        "integer aggregate fold) with zero exchanges before the "
        "presentation sort — classifier filtering at scan speed "
        "regardless of corpus size, fitted or hand-set weights alike."
    ),
    "multimodal_decode_real": (
        "Round 5: the REAL PNG decode is one Arrow mapInPandas node over "
        "the binary scan — a narrow projection with zero shuffles; decode "
        "parallelism equals scan parallelism at any corpus size. The "
        "closed-form fixture oracle proves the node's output values, the "
        "plan proves its cost shape."
    ),
    "near_dedup_corpus": (
        "End-to-end near-dedup: Arrow signature node (once) → banded bucket "
        "STAR edges (round 6: each member joins its bucket's min id — "
        "identical connectivity to the clique at O(members) edges; 13x at "
        "sf10's dense duplicate families) → min-label components "
        "(localCheckpoint-bounded lineage) → LEFT ANTI join of the loser "
        "set against the corpus scan — the loser side is small, so AQE "
        "broadcasts it; the corpus never shuffles."
    ),
    "html_extract": (
        "Round 6: HTML→text extraction is ONE projection over the documents "
        "scan (regex chains + array higher-order functions, no Python, no "
        "exchange before the presentation sort) — boilerplate removal at "
        "scan speed; cost ∝ input bytes, the 100 TB web-crawl front door."
    ),
    "packed_sequences_greedy": (
        "Round 6: the learned-vocab layout adds exactly one plan element "
        "over the subword twin — an ArrowEvalPython (pandas_udf) tokenizer "
        "node in the scan projection (the vocab rides the closure; greedy "
        "matching is per-row, no shuffle). Downstream stays the single "
        "seq-keyed exchange the packed layout always had. The vocab FIT is "
        "a separate one-shot aggregation bounded by vocab_size rows to the "
        "driver — the same artifact shape a BPE trainer ships."
    ),
    "packed_sequences_bpe": (
        "Round 8: same single seq-keyed exchange as the other packed "
        "layouts; the only additions are the one-shot merges FIT (a word "
        "count aggregate whose driver collect is bounded by max_words "
        "TakeOrdered — 2M default) and an ArrowEvalPython BPE encode node "
        "with a per-batch word cache in the scan projection. Serving "
        "shuffles nothing extra; fit shuffle ∝ distinct words."
    ),
    "scd2_merge": (
        "Round 8: Type-2 SCD merge — ONE equi-join between the is_current "
        "slice and the batch (AQE broadcasts small batches; shuffle ∝ "
        "current keys + batch rows); history is a pass-through union no "
        "shuffle ever touches. Both sides pre-project into disjoint "
        "attribute names so the incremental self-application loop "
        "(current = scd2_apply(current, ...)) never hits Spark's "
        "self-join ambiguity."
    ),
    "cdc_apply": (
        "Round 8: CDC apply-changes merge — one window shuffle on the keys "
        "over the CHANGE BATCH only (latest change per key: seq desc, "
        "delete-beats-upsert, row-hash tie-break) + ONE full-outer "
        "equi-join against the target (AQE broadcasts small deduped "
        "batches). Stale changes (seq <= target seq) are ignored, so "
        "replaying a batch is a no-op — idempotent recovery without a "
        "target-side window or second pass."
    ),
    "ngram_novelty": (
        "Round 8: n-gram novelty — scan-side gram HOF -> (doc, gram) and "
        "gram-corpus hash aggs (map-side partials) -> one join back on "
        "the gram -> exact-integer per-doc ratio. Shuffle ∝ distinct "
        "grams, the contamination/span-dedup shape; Zipf-hot grams ride "
        "AQE. The 'fraction of text duplicated elsewhere' quality signal "
        "at RefinedWeb scale."
    ),
    "audio_fingerprint_real": (
        "Round 8: audio energy-difference fingerprint — REAL stdlib WAV "
        "decode, exact integer PCM recovery (the [-1,1) normalization "
        "divides by a power of two, multiplying back is lossless), "
        "frame energies + rising-energy bits + zero-crossing count in "
        "pure integer math; one mapInPandas node, zero shuffle. The "
        "audio twin of image_dhash: near-dup = banded hamming on the "
        "energy hash."
    ),
    "image_dhash_real": (
        "Round 8: perceptual dHash — REAL stdlib PNG decode + integer "
        "gray + nearest 8x8 lattice + 56 difference bits, one "
        "mapInPandas node over the binary column, zero shuffle (the "
        "multimodal rides-the-scan shape). 56 bits, not 64: engines "
        "disagree on int64 overflow (DuckDB errors where Java wraps), "
        "so bit 63 stays unused. Dedup on the hash = exact group-by; "
        "near-dup = banded hamming, the simhash machinery."
    ),
    "table_diff": (
        "Round 8: row-level snapshot diff — ONE full-outer equi-join on "
        "the keys (the same cost as the MERGE it audits; zero shuffle on "
        "bucketed snapshots), per-column null-safe compare + conditional "
        "array assembly in the scan-side projection. The reconciliation "
        "tool: added/removed/changed/unchanged per key with the exact "
        "changed-column list."
    ),
    "length_bucketed_batches": (
        "Round 8: length-bucketed batching — bucket assignment is a "
        "scan-side comparison sum; ONE window shuffle keyed on "
        "(lang, bucket) assigns deterministic batch indexes; padding "
        "accounting is a hash agg with integers-then-one-division. At "
        "corpus scale the partition columns keep any single window "
        "partition shard-sized (the pack_shards contract). Pinned win: "
        "interleaved bimodal lengths pad ~47% unbucketed, 0% bucketed."
    ),
    "triplet_mining": (
        "Round 8: batch-hard triplet mining — exact O(|anchors| x N): a "
        "500-anchor seed set scores against the full corpus (JVM-fold "
        "cosine with per-ROW norms precomputed before the join — "
        "re-folding norms per pair measured 83 s vs 33 s at sf0.1; the "
        "seed-set shape then cut it to 12 s), per-anchor hardest pos/neg "
        "via row_number <= 1 so WindowGroupLimit keeps top-1 partials "
        "below the exchange. At web scale, mine inside LSH/IVF candidate "
        "buckets (knn_join_lsh) — the documented ANN-family trade."
    ),
    "char_entropy": (
        "Round 8: character entropy — explode chars -> (doc, char) hash "
        "agg -> per-doc fold over the char-ASC-sorted profile (canonical "
        "summation order; result rounded past 1-ulp ln libm drift). "
        "Scan+agg shape, shuffle ∝ distinct (doc, char) pairs."
    ),
    "streaming_sessionize": (
        "Round 8: the CUSTOM stateful operator — applyInPandasWithState "
        "gap sessionization, shuffled on the session key so state is "
        "partition-local (scales with distinct users, not events). "
        "Driver-checked by sentinel-closing every session inside the "
        "data batches (ProcessingTimeTimeout streams never self-"
        "terminate: the engine schedules empty batches forever, so the "
        "harness polls the sink to a stable drained count, then stops). "
        "Emitted sessions equal the batch lag-window oracle exactly."
    ),
    "cms_heavy_hitters": (
        "Round 8: count-min sketch — explode to depth cells per record "
        "(scan-shaped) then ONE hash agg whose map-side partials collapse "
        "to <= depth*width cells per task: the shuffle is O(d*w) "
        "regardless of data size, and the sketch broadcasts for point "
        "queries (min over depth cells — never undercounts). "
        "Deterministic md5 row hashes make cells, merge, and estimates "
        "exactly oracle-replayable — the mergeable frequency complement "
        "to KMV's distinct counting."
    ),
    "sentence_chunks_check": (
        "Round 8: sentence-aware RAG chunking — sentence extraction and "
        "token counting are JVM HOF expressions over the scan; ONLY the "
        "inherently-sequential greedy walk is Python (ArrowEvalPython "
        "over the per-doc token-count ARRAY, integers in/boundary structs "
        "out — tiny batches); explode + JVM slice/md5 finish. Zero "
        "shuffles: scan-shaped at any corpus size."
    ),
    "phrase_search": (
        "Round 8: positional inverted index + exact phrase search — index "
        "build is posexplode + ONE (term, doc) hash agg (map-side "
        "partials, shuffle ∝ postings; Zipf-hot terms ride salting or a "
        "stopword drop); each phrase term is an equality point-lookup on "
        "the index (partition-pruned when term-partitioned), k-1 "
        "doc-level equi-joins, match positions via JVM array_intersect "
        "of shifted position lists — no position explode, no window."
    ),
    "streaming_dedup_events": (
        "Round 8: REAL streaming watermarked dedup — two file-stream "
        "sources unioned (every event duplicated), event-time watermark, "
        "dropDuplicatesWithinWatermark keeps one row per key with state "
        "that EXPIRES past the watermark (plain dropDuplicates grows "
        "state forever); availableNow drives to an append memory sink "
        "whose rollup must equal the batch rollup of the original "
        "events. At 100 TB/day the bounded-state property IS the "
        "operator; the plan (shown for the batch rollup half) rides on "
        "streaming state store internals for the dedup."
    ),
    "kmv_distinct_check": (
        "Round 8: KMV distinct sketch — dedup hash agg (map-side "
        "partials) then per-group k-smallest via row_number, which "
        "WindowGroupLimit pushes BELOW the exchange (each task pre-keeps "
        "its local k smallest), then one group agg packing k longs. "
        "Per-group state is k longs at ANY cardinality; merge cost ∝ "
        "groups * k. Deterministic md5 hashing makes sketch, merge, and "
        "estimate exactly replayable cross-engine — the auditable "
        "alternative to the engine-internal HLL gate."
    ),
    "incremental_agg_check": (
        "Round 8: incremental aggregate maintenance — two base/delta hash "
        "aggs (map-side partials) + ONE group-sized merge agg over the "
        "unioned states. At 100 TB the base state is a TABLE, not a "
        "recompute: refresh cost = agg(delta) + a merge whose shuffle is "
        "proportional to GROUP COUNT, never fact rows. Decimal sums make "
        "the merge exact (the oracle recomputes from scratch and must "
        "match bit-for-bit)."
    ),
    "unicode_normalize_check": (
        "Round 8: Unicode NFC normalize + control strip — ONE "
        "ArrowEvalPython node (vectorized batches; Spark has no built-in "
        "normalizer) inside a scan-shaped projection, control strip is a "
        "JVM regexp; zero shuffle besides the presentation sort. At "
        "100 TB this is the same rides-the-scan shape as the codec UDFs."
    ),
    "zorder_layout_check": (
        "Round 8: z-order layout — the oracle-checked exact path uses two "
        "global rank windows (verification scale only; the plan should "
        "show the single-partition sorts honestly). The 100 TB path "
        "swaps in quantile_buckets (approxQuantile sketch -> literal "
        "boundary array -> narrow comparison-count, NO window) and pays "
        "ONE repartitionByRange(zval) shuffle — the same cost as any "
        "global sort, after which parquet min/max stats prune on every "
        "z-ordered column (pinned by the pruning behavioral test: a "
        "y-slice touches >=12/16 files x-sorted vs <=8 z-ordered)."
    ),
    "random_projection_check": (
        "Round 8: JL random projection — a PURE narrow projection: the "
        "±1 sign matrix rides the plan as literals, each component is a "
        "JVM-side zip_with + left-fold inside whole-stage codegen; zero "
        "shuffle, zero Python. At 100 TB this is the cheap pre-reduction "
        "in front of LSH banding / IVF training; measured honestly: on "
        "the near-uniform synthetic embeddings 64->16 keeps only ~13% of "
        "exact top-10 rank order (0.59 with a 100-of-500 shortlist), so "
        "it is a distance-threshold / candidate tool here, not a ranker."
    ),
    "packed_sequences_wordpiece": (
        "Round 8: WordPiece packed layout — fit is ONE distributed "
        "word-count aggregation (shuffle ∝ distinct words, bounded top-K "
        "driver collect), serving is an ArrowEvalPython greedy "
        "longest-match node with a per-batch word cache in the scan "
        "projection; the packing tail is the shared single-exchange "
        "cumulative-offset shape of the other three tokenizers."
    ),
    "profile_orders": (
        "Round 8: generic table profiler — pass 1 is ONE scalar aggregate "
        "(map-side partials, 1-row exchange) for counts + typed min/max; "
        "pass 2 unpivots via stack (scan-shaped, no Python) into ONE "
        "(col, value) hash agg, then two tiny per-column rollups (distinct "
        "count; max-count + min-value = deterministic mode). NO window "
        "over a column's values anywhere, so a unique-key column never "
        "lands in a single task."
    ),
    "c4_filter": (
        "Round 8: the published C4 line/page cleaning rules as ONE "
        "scan-shaped projection — line filters + kept-text rebuild + page "
        "flags are a single bind-once'd HOF over the split line array. No "
        "UDF, no shuffle; scan speed at 100 TB."
    ),
    "dsir_selection": (
        "Round 8: DSIR — two feature-count aggregates (shuffle ~ corpus "
        "tokens with map-side combine) reduce to a BOUNDED bucket table "
        "(256 rows) whose log-ratio join broadcasts; per-doc scoring is "
        "groupBy(id, bkt) + broadcast join + in-place ascending-bucket "
        "fold — the hash trick means no token-keyed shuffle join exists "
        "anywhere. Selection = TakeOrderedAndProject top-k + a k-row "
        "broadcast semi-probe: no global sort, no global window."
    ),
    "bm25_retrieval": (
        "Round 8: fixed-query BM25 — per-term tf via in-place filters over "
        "the bound lowercased token array (terms are literals: no explode, "
        "no vocabulary join), corpus stats (N, sum dl, per-term df) as ONE "
        "scalar-aggregate row broadcast back, then TakeOrderedAndProject "
        "for the top-k (per-partition heaps, k rows to the driver — no "
        "global sort exchange). One scan + Q counters: the minimal "
        "fixed-query retrieval shape at 100 TB."
    ),
    "gopher_repetition_rules": (
        "Round 8: the FULL published Gopher repetition table. Line/paragraph "
        "signals are in-place sorted-array folds on the scan branch (zero "
        "shuffle); the nine n-gram signals share ONE explode of (n, pos, "
        "gram) structs into a groupBy(doc, n, gram) count with map-side "
        "partial aggregation (shuffle ~ 9x corpus tokens), then ONE "
        "per-(doc, n) reduce computing both the top-gram and coverage "
        "signals, one per-doc pivot, one join (a branch per signal would "
        "re-run the explode: no common-plan sharing). Counting never "
        "happens in task memory, so million-token docs cannot blow an "
        "executor — the same aggregate discipline as the LM count tables."
    ),
    "gopher_quality": (
        "Round 8: the published Gopher document-shape rules as ONE "
        "scan-shaped projection — two bind-once'd HOF folds (word stats, "
        "line stats) and a conjunctive keep over the ROUNDED ratios. No "
        "UDF, no shuffle; at 100 TB this runs at scan speed beside the "
        "other quality signals."
    ),
    "packed_sequences_unigram": (
        "Round 8: same single seq-keyed exchange as the other packed "
        "layouts; the fit adds TWO map-side-combinable aggregates (word "
        "counts + substring seed counts, shuffle ∝ distinct keys) and a "
        "bounded driver Viterbi over the word table (max_words top-K, 2M "
        "default — the HF/SentencePiece trainer-table split); serving is "
        "an ArrowEvalPython Viterbi node with a per-batch word cache. "
        "Integer milli-log-prob scores keep the DP argmax engine-exact."
    ),
    "temperature_mixture": (
        "Round 8: UniMax/alpha-sampling mixture — the corpus is NEVER "
        "shuffled: one map-side-combinable aggregate to |domains| rows, a "
        "1-row canonical fold for the normalizer (sqrt for alpha=0.5: "
        "IEEE-exact cross-engine, unlike pow), two broadcasts back, then "
        "the weighted_repeat explode as a narrow projection. Output rows "
        "∝ Σ capped weights."
    ),
    "kn_bigram_logprob": (
        "Round 8: Kneser-Ney smoothing costs LESS than the bigram MLE rung "
        "despite the richer model — ctx/follower-type/predecessor-type "
        "counts all derive from the bigram TYPE table (rows ∝ distinct "
        "bigrams, not tokens), so the explode stream is aggregated exactly "
        "once; the total-types scalar broadcasts. One explode shuffle + "
        "type-table aggregates + key-join back + one per-doc canonical "
        "fold. Zipf-hot contexts ride AQE skew-split like the other rungs."
    ),
    "span_dedup": (
        "Round 8: exact-substring SPAN removal. One posexplode (rows ∝ "
        "corpus tokens) -> ONE map-side-combinable gram aggregate carrying "
        "(count, min (doc,pos)) so 'first occurrence' costs nothing extra "
        "-> gram-keyed join back restricted to duplicated grams (Zipf-hot "
        "boilerplate grams ride AQE skew-join) -> island merge + rebuild "
        "in a single doc-keyed sort shared by the whole window chain. No "
        "pairwise comparison, no driver state; the rebuild is a pure HOF "
        "filter over the token array against the per-doc span list."
    ),
    "trigram_logprob": (
        "Round 8: order-3 rung of the LM ladder — three event explodes "
        "(shuffle ∝ corpus tokens) feed five count aggregates, key-joined "
        "back to the trigram stream, then ONE per-doc aggregate folding "
        "the count profile in canonical order. Zipf-hot context keys ride "
        "AQE skew-split like the bigram; no driver-side state at all (the "
        "\"model\" stays distributed as count tables)."
    ),
    "curation_text_signals": (
        "Round 9: the fused shared-gram-table stage. ONE explode + "
        "groupBy(doc, n, gram) builds the count table (the ~9x-token "
        "shuffle every n-gram signal needs), persisted via InMemoryRelation "
        "so the repetition chain, the novelty corpus-count join, the "
        "span-dedup first-occurrence join, and the broadcast contamination "
        "probe all read it WITHOUT re-exploding — at sf0.1 the whole stage "
        "costs ~1s more than gopher_repetition_rules alone vs 26.6s for "
        "the four independents. At 100 TB the persist becomes a written "
        "parquet stage; plan shape is unchanged."
    ),
    "triplet_mining_lsh": (
        "Round 9: ANN-bucketed batch-hard mining gate. The exact side is "
        "the bounded |anchors| x N BroadcastNestedLoopJoin; the LSH side "
        "replaces it with a (band, bucket) hash equi-join (candidates ∝ "
        "neighborhood density), one Arrow matmul for the banding, and the "
        "same WindowGroupLimit top-1 pushdown below the exchange. The gate "
        "joins both paths' outputs — at 100 TB only the LSH side runs."
    ),
    "fuzzy_match_parts": (
        "Round 10: exact edit-distance self-join (PassJoin with the "
        "multi-match-aware refinement). O(d^2) substrings per record "
        "(never per-char), candidates meet on the (segment, La, i) "
        "equi-join — the plan must show a hash join on (_la, _i, _seg) "
        "with the banded levenshtein(…, 2) FUSED into the join condition "
        "(raw candidates verified in-stage, never shuffled; only verified "
        "pairs reach the distinct's exchange), and the only crossJoin the "
        "provably-tiny <=2d-length bucket. The probe side repartitions to "
        "session parallelism (guarded), the r10 fix that took the FULL "
        "20k-part sf0.1 workload from 216.8 s to 19 s against its own "
        "8.79M-pair answer. The all-pairs oracle proves the blocking "
        "lossless — exact fuzzy matching, the ER primitive engines "
        "usually approximate."
    ),
    "jaccard_join_prefix": (
        "Round 10: exact shingle-Jaccard self-join, PPJoin prefix + "
        "positional filters. The plan must show the prefix join keyed on "
        "the exploded rare-prefix token (posexplode carries the ordinal "
        "for the positional bound — a plain Filter above the join, no "
        "extra shuffle), then the verify joins fetching the per-doc "
        "sorted set arrays by id. Measured: 6.7x over the inverted-index "
        "join at 5k boilerplate-heavy docs, DNF>560s vs 15.3s at 50k "
        "(NOTES_r10 §4); on hot-shingle-free corpora the inverted join "
        "wins 1.5x — both trades stated in the docstring."
    ),
    "bloom_semi_join": (
        "Round 10: bloom-pruned semi-join, probe rebuilt after the sf10 "
        "measurement (39.1s -> 4.1s, NOTES_r10 §13). The membership test "
        "is a pure Filter ON THE SCAN of the big side (no UDF, no shuffle "
        "— the shape of an engine-pushed runtime filter): an unrolled "
        "conjunction of k bit-tests (forall runs interpreted), each a "
        "byte-slice substring of ONE binary words literal + hex/conv + "
        "bit_get (a literal-ARRAY carrier cost grew linearly with filter "
        "size). Downstream the semi-join sees only bloom survivors: "
        "shuffled bytes track |matches| + FP rate, never |big|. At 100 TB "
        "this is THE join-pruning idiom; the exact join guarantees the "
        "result equals the plain semi-join — a contract that holds for "
        "ANY hash family, which is how bloom_semi_join_fast (xxhash64 "
        "positions, 4.3x cheaper probe) keeps a full SQL oracle."
    ),
    "fuzzy_link_tiers": (
        "Round 11: tiered d=0->1->2 record-linkage resolution. The final "
        "plan is deliberately SHALLOW — a union of three checkpointed "
        "per-tier top-1 frames feeding the histogram aggregate — because "
        "each tier ran EAGERLY at construction: tier 0 a lowercase hash "
        "equi-join (no segments, no levenshtein), tiers 1-2 the PassJoin "
        "probe over ONLY the anti-joined remainder, each topped by the "
        "WindowGroupLimit rank pushdown. The localCheckpoint per tier is "
        "the r9 lineage rule (the union + next tier's anti-join would "
        "otherwise re-run every earlier tier per consumer). Measured "
        "5.4x over single-shot at sf1 on a 60/20/10/10 mostly-clean feed "
        "(NOTES_r11 §4): verify work tracks the DIRTY fraction."
    ),
    "fuzzy_link_incremental": (
        "Round 11: standing-master incremental linkage (LinkageIndex). "
        "Both feeds' tier plans read the master base from ONE "
        "InMemoryRelation (the pinned lowered/repartitioned base built "
        "once); segments are recomputed per link ON PURPOSE — a cached "
        "exploded-segment table measured SLOWER than recomputation "
        "(40.4 s vs 36.6 s at sf1) because it pays memory-format "
        "serialization and breaks the codegen fusion that pipelines "
        "segment generation into the candidate join (NOTES_r11 §7b). At "
        "100 TB the base becomes a bucketed parquet write; plan shape per "
        "feed is unchanged."
    ),
    "langid_fixture": (
        "Round 9: multiclass hashed-NB language ID over the learnable "
        "fixture. Scan-side pure expressions end to end: ONE aliased "
        "tokenize+md5 feature array per doc (computed once, not once per "
        "language — the bind-expensive-aliases rule), four exact int64 "
        "milli-unit HOF sums, argmax CASE chain; no shuffle except the "
        "presentation sort. Scoring at 100 TB is scan speed; the FIT is "
        "one groupBy(feature, lang) whose result is dim x n_langs rows."
    ),
    "url_canonical": (
        "Round 11: URL canonicalization. The property is ONE regex "
        "execution per row: a single regexp_replace packs all six groups "
        "into a \\x01-delimited string (the |^.*$ alternation handles "
        "non-URLs with empty fields, so NO conditional guards exist — "
        "conditional branches are excluded from codegen subexpression "
        "elimination, the measured sf10 rule), and every downstream "
        "component access is an unconditional array get that CSE "
        "deduplicates. Pure projection — no exchange anywhere."
    ),
    "domain_guard": (
        "Round 11: blocklist anti-join -> per-domain cap -> rollup. The "
        "properties: the blocklist side is a BroadcastExchange (executors "
        "prune locally), and the cap's row_number filter compiles to "
        "WindowGroupLimit with a PARTIAL stage BELOW the exchange — each "
        "map task pre-keeps <= cap rows per domain, so a mega-domain "
        "(60M rows in ONE domain, measured 21.1 s at sf10) never "
        "creates a straggler; shuffle volume ~ cap x domains."
    ),
    "weighted_sample_check": (
        "Round 11: Efraimidis-Spirakis weighted sampling. Same "
        "WindowGroupLimit partial-below-exchange shape as domain_guard: "
        "the exponential-race key is a pure expression (md5 -> ln/w), "
        "each map task pre-keeps its local top-k per group, ~k rows per "
        "group reach the exchange at any input size."
    ),
    "hll_distinct_check": (
        "Round 11: portable HLL. Register build is one hash aggregation "
        "(groupBy group+bucket, max(rho)) with map-side partial max — "
        "shuffle bounded by groups x m registers regardless of row "
        "count; the estimate is a second tiny agg over <= m rows per "
        "group with the harmonic sum in exact int64. No windows, no "
        "collects except the bounded register table."
    ),
    "quantile_hist_check": (
        "Round 12: portable quantile sketch. The histogram build is one "
        "hash aggregation (groupBy group+sign+exp+prefix, count) with "
        "map-side partials — the bucket id is pure string/int math on the "
        "scan, and the shuffle is bounded by the register count "
        "(decades x 9*10^(sig-1) per group) regardless of row count. The "
        "estimate's window runs over REGISTERS, never rows; the only "
        "row-proportional work in this suite row is the independent "
        "true-rank verification (row_number over the group), which is the "
        "CHECK, not the operator."
    ),
    "quantile_index_stream": (
        "Round 12: maintained quantile registers. Each absorb is one "
        "register-bounded sum-merge (union + groupBy over state rows); "
        "per-epoch lineage stays one union deep behind the "
        "localCheckpoint. The stream also writes + reloads the state "
        "parquet mid-run (the durability boundary) — at cluster scale "
        "that write IS the per-epoch artifact. The estimate explodes the "
        "quantile list against the totals and brackets every (group, q) "
        "in ONE join — plan size O(1) in the quantile count. Round 13: "
        "the DUMPED plan is a union of four Scan ExistingRDD nodes — each "
        "epoch's snapshot materializes eagerly at snapshot time (absorb "
        "now RELEASES the superseded checkpoint, so a lazy cross-epoch "
        "union would reference freed blocks); the per-epoch work "
        "described above runs during construction, before this plan."
    ),
    "cms_index_stream": (
        "Round 12: maintained count-min cells. The per-epoch work is a "
        "depth-wide explode on the batch scan collapsing to <= depth x "
        "width cells in map-side partials, then a cell-keyed sum-merge "
        "over state rows; the candidate probe broadcasts the sketch and "
        "min-reduces per item. Nothing in the plan grows with stream "
        "history — cells are a fixed matrix forever. Round 13: the dumped "
        "plan shows the union of materialized epoch snapshots (see "
        "quantile_index_stream note)."
    ),
    "quantile_trim_band": (
        "Round 13: per-group quantile band filter. MUST-KEEP properties: "
        "(a) the estimate's totals REUSE the register exchange "
        "(ReusedExchange on the histogram aggregation) so the whole "
        "sketch side costs ONE source scan; (b) the final band join is "
        "BroadcastHashJoin with BuildRight = the |groups|-row bounds "
        "frame (pinned by an explicit broadcast() — at sf0.01 the "
        "optimizer otherwise broadcast the CORPUS side, a choice that "
        "inverts catastrophically at 100 TB); (c) the band predicate is "
        "fused into the join condition, so survivors never materialize "
        "out-of-band. Two source scans total — the floor for any "
        "data-dependent threshold."
    ),
    "mixture_waterfill_alloc": (
        "Round 13: waterfilling budget allocation. One map-side-"
        "combinable aggregate reduces the corpus to |domains| rows; "
        "every window after it (exclusive prefix sums, the running-AND "
        "capping fixpoint, the global remainder sums) runs over that "
        "register-sized frame — the single-partition exchange is "
        "|domains| rows by construction, never data. The corpus itself "
        "is never shuffled and never rescanned; all threshold math is "
        "exact int64 (milli weights), so the plan contains no UDF and "
        "no float-order hazard."
    ),
    "bm25_index_stream": (
        "Round 13: maintained fixed-query BM25 postings. Per-epoch work "
        "during construction: tokenize ONLY the new batch into postings "
        "rows (one narrow projection, no explode — per-term tf is an "
        "in-place filter over the bound token array), score = one "
        "scalar-aggregate stats row broadcast back over stored longs. "
        "Round 14: the absorb CHECKPOINTS only the batch tier too "
        "(TieredState, identity fold) — per-absorb cost is O(batch) "
        "rows materialized, with geometric cascade merges bounding the "
        "postings union at O(log) tiers (per-absorb wall time measured "
        "flat over 24 absorbs, ABSORB_r14.json). No text is re-read "
        "after its one absorb — at 100 TB a standing query scores from "
        "postings, never re-tokenizes. The dumped plan is the union of "
        "materialized epoch snapshots (see quantile_index_stream note)."
    ),
    "near_dedup_index_stream_flag": (
        "Round 14 plan audit of the TIERED maintained near-dedup probe: "
        "NearDupIndex.flag() against a 2-tier state (seed + one absorbed "
        "batch). The property at 100 TB: the index side is a plain Union "
        "of checkpointed RDD scans — NO re-fold, NO extra exchange "
        "beyond the probe equi-join's own shuffle; the per-doc min over "
        "the join result subsumes the cross-tier re-min, so tiering "
        "adds zero operators to the probe beyond the union arms. The "
        "absorb that built tier 2 checkpointed ONLY the batch's band "
        "rows (the O(batch) contract measured in ABSORB_r14.json)."
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-dump")
    out = [
        "# PLANS — physical-plan audit of the shape-critical queries",
        "",
        f"Generated by `tools/dump_plans.py` against `{sf_dir}`. For each",
        "query: the property the plan must keep at 100 TB, then the plan.",
        "",
    ]
    def _near_dedup_flag_plan(spark, sf_dir):
        from pyspark.sql import functions as F

        from etl_file_loader_spark.operators.dedup import NearDupIndex

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # seed = 75% of docs; the absorbed batch is 1% so the cascade
        # does NOT merge it into the base — the dumped plan must show
        # the genuine multi-tier union the probe join sees mid-stream
        idx = NearDupIndex(docs.filter(F.col("doc_id") % 4 != 3), "doc_id", "text")
        idx.absorb(docs.filter(F.col("doc_id") % 100 == 3))
        assert len(idx._state._tiers) == 2
        return idx.flag(docs.filter(F.col("doc_id") % 100 == 7))

    # plan-only entries: shapes worth auditing that are not themselves
    # registered suite queries (the suite row materializes its epochs, so
    # the interesting probe-join plan would not appear in its dump)
    PLAN_ONLY = {"near_dedup_index_stream_flag": _near_dedup_flag_plan}

    for name, note in COMMENTARY.items():
        df = PLAN_ONLY.get(name, suite.QUERIES.get(name))(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree + scan details, trim the verbose node dumps
        tree_end = plan.index("\n\n(1)") if "\n\n(1)" in plan else len(plan)
        tree = plan[:tree_end]
        scan_lines = [
            line
            for line in plan.splitlines()
            if line.startswith(("PushedFilters", "ReadSchema", "Location"))
        ]
        out += [f"## {name}", "", note, "", "```"]
        out += [tree.rstrip(), ""]
        out += scan_lines
        out += ["```", ""]
    Path("PLANS.md").write_text("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
