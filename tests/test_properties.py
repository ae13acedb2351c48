"""Property-based tests (hypothesis) for hashing / validation / serial dates.

Spark round-trips are expensive per example, so properties run on small
max_examples with batched inputs: generate a list of values, run ONE Spark
job over all of them, compare against a pure-Python model.
"""

import hashlib
from datetime import date, timedelta

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_file_loader_spark.functions import row_hash

text_values = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(codec="ascii", exclude_characters="|\x00"),
        max_size=20,
    ),
)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(text_values, text_values, st.integers(-(2**31), 2**31)), min_size=1, max_size=20))
def test_row_hash_matches_python_model(spark, rows):
    """md5('|'.join(sorted-by-name rendered values, null->''))."""
    df = spark.createDataFrame(rows, "b string, a string, n long")
    fields = {"a": T.StringType(), "b": T.StringType(), "n": T.LongType()}
    got = [r["h"] for r in df.select(row_hash(fields).alias("h")).collect()]
    for (b, a, n), h in zip(rows, got):
        joined = "|".join(["" if a is None else a, "" if b is None else b, str(n)])
        assert h == hashlib.md5(joined.encode()).hexdigest()


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(0, 200000), min_size=1, max_size=50))
def test_excel_serial_date_matches_python(spark, serials):
    from etl_file_loader_spark.functions import excel_serial_to_date

    df = spark.createDataFrame([(s,) for s in serials], "serial long")
    got = [
        r["d"]
        for r in df.select(
            excel_serial_to_date(F.col("serial")).alias("d")
        ).collect()
    ]
    for s, d in zip(serials, got):
        assert d == date(1899, 12, 30) + timedelta(days=s)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.integers(-(10**12), 10**12).map(str),
            st.text(alphabet="abc.-", max_size=6),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_try_cast_long_error_capture(spark, raws):
    """A non-null raw that fails the long-cast is always captured as exactly
    one cast_error; parseable raws produce the parsed value and no error."""
    from etl_file_loader_spark.config import FieldSpec, SourceConfig
    from etl_file_loader_spark.operators import validate as V

    cfg = SourceConfig(
        name="p", file_pattern="*", file_format="csv",
        fields=[FieldSpec("x", T.LongType(), nullable=True)], grain=["x"],
    )
    df = spark.createDataFrame([(r,) for r in raws], "x string")
    out = V.validate(df, cfg).select("x", F.size(V.ERRORS_COL).alias("n")).collect()
    for raw, row in zip(raws, out):
        if raw is None:
            assert row["n"] == 0
        else:
            try:
                expected = int(raw)
            except ValueError:
                expected = None
            if expected is None:
                assert row["n"] == 1
            else:
                assert row["n"] == 0 and row["x"] == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(st.integers(1, 30), st.integers(0, 100)), min_size=1, max_size=25),
    st.lists(st.tuples(st.integers(1, 30), st.integers(0, 100)), min_size=1, max_size=25),
)
def test_merge_upsert_invariants(spark, target_rows, stage_rows):
    """Merge invariants for any target/stage: result keys = union of keys;
    changed rows take stage values + updated_at; unchanged keep target."""
    from pyspark.sql import functions as F

    from etl_file_loader_spark.functions import row_hash
    from etl_file_loader_spark.operators import publish

    # dedupe keys within each side (grain holds per side by contract)
    t_map = dict(target_rows)
    s_map = dict(stage_rows)
    fields = {"k": T.LongType(), "v": T.LongType()}

    def frame(m, fname, log):
        df = spark.createDataFrame([(k, v) for k, v in m.items()], "k long, v long")
        return (
            df.withColumn("etl_row_hash", row_hash(fields))
            .withColumn("source_filename", F.lit(fname))
            .withColumn("file_load_log_id", F.lit(log).cast("long"))
        )

    target = (
        frame(t_map, "t.csv", 1)
        .withColumn("etl_created_at", F.lit("2024-01-01 00:00:00").cast("timestamp"))
        .withColumn("etl_updated_at", F.lit(None).cast("timestamp"))
    )
    stage = frame(s_map, "s.csv", 2)
    merged = publish.merge_upsert(
        target, stage, ["k"], ["k", "v"], now=F.lit("2024-06-01 00:00:00").cast("timestamp")
    )
    rows = {r["k"]: r for r in merged.collect()}
    assert set(rows) == set(t_map) | set(s_map)
    for k, r in rows.items():
        in_t, in_s = k in t_map, k in s_map
        if in_s and (not in_t or t_map[k] != s_map[k]):
            assert r["v"] == s_map[k] and r["source_filename"] == "s.csv"
        else:
            assert r["v"] == t_map[k] and r["source_filename"] == "t.csv"
        if in_t and in_s and t_map[k] != s_map[k]:
            assert r["etl_updated_at"] is not None
        else:
            assert r["etl_updated_at"] is None
        assert (str(r["etl_created_at"]) == "2024-01-01 00:00:00") == in_t


def test_query_probe_buckets_properties():
    """Pure-logic invariants of multi-probe LSH bucket generation."""
    from hypothesis import given, settings, strategies as st

    from etl_file_loader_spark.operators.similarity import query_probe_buckets

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(st.floats(-10, 10, allow_nan=False), min_size=2, max_size=16),
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=32),
    )
    def check(vec, planes, n_probe):
        probes = query_probe_buckets(vec, planes, n_probe)
        assert 1 <= len(probes) <= n_probe
        assert len(set(probes)) == len(probes)          # no duplicate buckets
        assert all(0 <= b < (1 << planes) for b in probes)
        base = query_probe_buckets(vec, planes, 1)[0]
        assert probes[0] == base                        # own bucket probes first

    check()


def test_pack_shards_invariants(spark):
    """Streaming-packer invariants over random token sequences."""
    from hypothesis import given, settings, strategies as st

    from etl_file_loader_spark.operators import sampling

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=40),
        st.integers(min_value=100, max_value=2000),
    )
    def check(token_counts, budget):
        rows = [(i, t) for i, t in enumerate(token_counts)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        packed = sorted(
            ((r["doc_id"], r["shard_id"]) for r in
             sampling.pack_shards(df, "doc_id", "n_tokens", budget,
                                  allow_global_sort=True).collect())
        )
        shard_of = dict(packed)
        # shard ids are non-decreasing in doc order and start at 0
        ids = [shard_of[i] for i in range(len(token_counts))]
        assert ids[0] == 0
        assert all(a <= b for a, b in zip(ids, ids[1:]))
        # a shard's token total never exceeds budget + its straddling doc:
        # every doc in a shard STARTS strictly inside the budget window, so
        # only the LAST doc (the straddler) can carry the total past it
        totals: dict[int, int] = {}
        lasts: dict[int, int] = {}
        for i, t in enumerate(token_counts):
            s = shard_of[i]
            lasts[s] = t
            totals[s] = totals.get(s, 0) + t
        for s, total in totals.items():
            assert total - lasts[s] < budget
        # python model equivalence: exclusive prefix sum // budget
        prefix = 0
        for i, t in enumerate(token_counts):
            assert shard_of[i] == prefix // budget
            prefix += t

    check()


def test_sample_key_uniformity_and_determinism(spark):
    """The md5-derived sampling key covers [0, 10000) roughly uniformly."""
    from pyspark.sql import functions as F

    from etl_file_loader_spark.operators.sampling import sample_key

    df = spark.range(20000).select(sample_key(F.col("id")).alias("k"))
    stats = df.agg(
        F.min("k").alias("lo"), F.max("k").alias("hi"), F.avg("k").alias("mean")
    ).collect()[0]
    assert 0 <= stats["lo"] < 200 and 9800 < stats["hi"] < 10000
    assert 4700 < stats["mean"] < 5300
    # rate monotonicity: a higher rate keeps a superset of a lower rate
    ids = spark.range(2000).select(F.col("id"))
    kept_30 = {r["id"] for r in ids.filter(sample_key(F.col("id")) < 3000).collect()}
    kept_60 = {r["id"] for r in ids.filter(sample_key(F.col("id")) < 6000).collect()}
    assert kept_30 <= kept_60
    assert 400 <= len(kept_30) <= 800 and 1000 <= len(kept_60) <= 1400


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_line_dedup_invariants(spark, texts):
    """line_dedup properties on arbitrary ASCII docs: (1) idempotent —
    re-deduping the cleaned corpus changes nothing; (2) kept_lines <=
    n_lines; (3) every distinct non-blank line survives exactly once
    corpus-wide."""
    from etl_file_loader_spark.operators.text import line_dedup

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = line_dedup(df, "doc_id", "text").collect()
    assert all(r["kept_lines"] <= r["n_lines"] for r in out)
    surviving = [
        ln
        for r in out
        if r["cleaned_text"]
        for ln in r["cleaned_text"].split("\n")
        if ln.strip()
    ]
    assert len(surviving) == len(set(surviving))
    original_nonblank = {
        ln for t in texts for ln in t.split("\n") if ln.strip()
    }
    assert set(surviving) == original_nonblank
    # idempotence
    cleaned = spark.createDataFrame(
        [(r["doc_id"], r["cleaned_text"]) for r in out], "doc_id long, text string"
    )
    again = {r["doc_id"]: r["cleaned_text"] for r in line_dedup(cleaned, "doc_id", "text").collect()}
    assert again == {r["doc_id"]: r["cleaned_text"] for r in out}


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40),
        min_size=1,
        max_size=10,
    ),
    st.integers(2, 4),
)
def test_duplicated_windows_bounds(spark, texts, window):
    """0 <= dup_windows <= n_windows; a doc with a unique text and no
    shared windows reports dup_share 0; duplicated docs report share 1."""
    from etl_file_loader_spark.operators.text import duplicated_window_stats

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = duplicated_window_stats(df, "doc_id", "text", window=window).collect()
    for r in out:
        assert 0 <= r["dup_windows"] <= r["n_windows"]
        if r["n_windows"] == 0:
            assert r["dup_share"] == 0.0
    # exact duplicate doc pair -> all their windows are duplicated
    dup = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b a b a b")], "doc_id long, text string"
    )
    for r in duplicated_window_stats(dup, "doc_id", "text", window=2).collect():
        assert r["dup_share"] == 1.0


# ---------------------------------------------------------------------------
# round-4 session-3: classifier python-model equivalence + packed-sequence
# stream conservation
# ---------------------------------------------------------------------------

_words = st.text(alphabet=st.characters(codec="ascii", min_codepoint=33, max_codepoint=126), min_size=1, max_size=8)
_docs_texts = st.lists(
    st.lists(_words, min_size=0, max_size=12).map(" ".join), min_size=1, max_size=12
)


@settings(max_examples=8, deadline=None)
@given(_docs_texts)
def test_classifier_score_matches_python_model(spark, texts):
    """logit = bias + sum(w[md5_hash(lower(tok)) % dim]) / (1000 * n)."""
    from etl_file_loader_spark.operators.text import classifier_score

    dim = 16
    weights = [((i * 97) % 700) - 350 for i in range(dim)]
    bias_milli = 120
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["logit"])
        for r in classifier_score(df, "doc_id", "text", weights, bias_milli).collect()
    }
    for i, t in rows:
        toks = t.strip().split() if t.strip() else []
        s = sum(
            weights[int(hashlib.md5(w.lower().encode()).hexdigest()[:8], 16) % dim]
            for w in toks
        )
        expect = (
            bias_milli / 1000.0
            if not toks
            else bias_milli / 1000.0 + s / (1000.0 * len(toks))
        )
        assert got[i][0] == len(toks)
        assert got[i][1] == expect  # bit-exact: int sum + one division + one add


@settings(max_examples=8, deadline=None)
@given(_docs_texts)
def test_packed_sequences_conserve_the_stream(spark, texts):
    """Σ sequence tokens == Σ (doc tokens + 1 boundary); every sequence
    except the final one per partition is exactly seq_len."""
    from etl_file_loader_spark.operators.sampling import packed_sequences

    seq_len = 7
    rows = [(i, t, "x") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = sorted(
        packed_sequences(df, "doc_id", "text", seq_len=seq_len, partition_cols=["lang"]).collect(),
        key=lambda r: r["seq_idx"],
    )
    stream_len = sum(len(t.strip().split()) + 1 if t.strip() else 1 for t in texts)
    assert sum(r["n_tokens"] for r in out) == stream_len
    assert [r["seq_idx"] for r in out] == list(range(len(out)))
    for r in out[:-1]:
        assert r["n_tokens"] == seq_len
    assert out[-1]["n_tokens"] == stream_len - seq_len * (len(out) - 1)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e9,
            max_value=1e9,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([1, 250, 500, 900, 990]),
)
def test_quantile_sketch_error_bound_property(spark, values, qm):
    """Round-12 portable quantile sketch: for ARBITRARY finite doubles,
    the estimate at any quantile stays within the documented guarantee
    of the true rank value — |est - true| <= |true|/10^(sig-1) + bucket
    quantization slack (2/unit_scale covers the cent-floor on both the
    value and the bucket edge). One Spark job per example (batched
    values), pure-Python rank model."""
    from etl_file_loader_spark.operators import sketches

    df = spark.createDataFrame([(1, float(v)) for v in values], ["g", "v"])
    hist = sketches.quantile_histogram(df, ["g"], "v")
    est_rows = sketches.quantile_estimate(hist, ["g"], [qm]).collect()
    assert len(est_rows) == 1
    est, n = est_rows[0].est, est_rows[0].n
    assert n == len(values)
    ordered = sorted(values)
    true = ordered[(qm * n + 999) // 1000 - 1]
    tol = abs(true) * 0.011 + 0.02 + 2.0 / 100.0
    assert abs(est - true) <= tol, (values, qm, est, true)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0, max_value=1e7, allow_nan=False, allow_infinity=False),
        min_size=2,
        max_size=40,
    )
)
def test_quantile_merge_equals_one_shot_property(spark, values):
    """Sum-merge over ANY 2-way split equals the one-shot histogram
    (register-for-register)."""
    from etl_file_loader_spark.operators import sketches

    rows = [(1, i, float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, ["g", "i", "v"])
    one = sketches.quantile_histogram(df, ["g"], "v")
    parts = [
        sketches.quantile_histogram(df.filter(F.col("i") % 2 == k), ["g"], "v")
        for k in range(2)
    ]
    merged = sketches.quantile_hist_merge(parts, ["g"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, one.collect())
    )
