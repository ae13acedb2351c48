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


def _md5_uniform_grid(tag: str, rows: int, cols: int) -> "np.ndarray":
    """(rows, cols) matrix of md5-derived uniforms in [0, 1): cell (r, c)
    = first-8-hex of md5("{tag}_{r}_{c}") / 2^32 — the house portable
    idiom (the hyperplane-LSH plane matrix's sibling), so any SQL engine
    re-derives the identical values."""
    import hashlib

    out = np.empty((rows, cols), dtype="float64")
    for r in range(rows):
        pfx = f"{tag}_{r}_"
        for c in range(cols):
            out[r, c] = (
                int(hashlib.md5(f"{pfx}{c}".encode()).hexdigest()[:8], 16)
                / 4294967296.0
            )
    return out


def clustered_embeddings(
    spark: SparkSession,
    n: int = 2000,
    dim: int = 64,
    k: int = 40,
    noise: float = 0.03,
    seed: int = 7,
) -> DataFrame:
    """Clustered-mixture embeddings: k centers, points = center +
    centered-uniform noise whose std is ``noise`` RELATIVE to the
    expected center norm — intra-cluster cosine ~0.95+, cross-cluster ~0:
    clean separation for a 0.9 near-dup threshold, matching the
    (vec_id, embedding, label) schema of the testdata embeddings table.

    Round 11: every value is an md5 derivation (``_md5_uniform_grid``) —
    center (c, j) = u("ctr{seed}_c_j") - 0.5, point (i, j) =
    float32(center(i % k, j) + (u("pt{seed}_i_j") - 0.5) * noise*sqrt(dim))
    — so the fixture DATA itself replays in SQL
    (suite/similarity.py:clustered_fixture_cte) and the rows that run on
    it carry FULL value oracles; the previous numpy-RNG mixture had no
    SQL form, which was the only reason the *_clustered rows stayed
    rows-only demos. Deliberately NO normalization anywhere: u is exact
    in double (int32 / 2^32), so every component is ONE correctly-rounded
    add of identical inputs — BIT-IDENTICAL across engines with zero
    summation-order exposure (a norm would reintroduce an
    order-dependent reduction). Cosine consumers normalize internally,
    so the geometry is unchanged by the missing unit-norm.
    """
    import pandas as pd

    key = (spark.sparkContext.applicationId, n, dim, k, noise, seed)
    cached = _CACHE.get(key)
    if cached is not None:
        return cached
    centers = _md5_uniform_grid(f"ctr{seed}", k, dim) - 0.5
    labels = np.arange(n) % k
    # centered uniform scaled so noise std relative to E[|center|]
    # (= sqrt(dim/12)) equals ``noise``: S = noise*sqrt(12)*sqrt(dim/12)
    scale = noise * float(np.sqrt(float(dim)))
    noise_m = (_md5_uniform_grid(f"pt{seed}", n, dim) - 0.5) * scale
    vecs = (centers[labels] + noise_m).astype(np.float32)
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


def media_png_corpus(spark: SparkSession, n: int = 200) -> DataFrame:
    """REAL PNG payloads with closed-form pixel contents, so the stdlib
    decoder's output is cross-engine value-verifiable: image i is
    (4 + i%13) x (3 + i%7) RGB with pixel value
    ``(i*31 + y*7 + x*3 + c) % 256`` — a formula DuckDB re-evaluates from
    ``range()`` without ever decoding a byte. Scanline filter ``i % 5``
    exercises every decoder branch (None/Sub/Up/Average/Paeth); the
    mean_pixel the decode reports is an exact int/int quotient, so the
    oracle matches bit-for-bit, proving the zlib+unfilter pipeline
    recovers the exact pixel buffer."""
    import pandas as pd

    from etl_file_loader_spark.operators import codecs

    key = (spark.sparkContext.applicationId, "media_png", n)
    cached = _CACHE.get(key)
    if cached is not None:
        return cached
    payloads = []
    for i in range(n):
        w, h = 4 + i % 13, 3 + i % 7
        y, x, c = np.meshgrid(
            np.arange(h), np.arange(w), np.arange(3), indexing="ij"
        )
        px = ((i * 31 + y * 7 + x * 3 + c) % 256).astype(np.uint8)
        payloads.append(codecs.png_encode(px, filter_type=i % 5))
    pdf = pd.DataFrame(
        {"media_id": np.arange(n, dtype=np.int64), "content": payloads}
    )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(pdf, schema)
    while len(_CACHE) >= _CACHE_MAX:
        _CACHE.pop(next(iter(_CACHE)))
    _CACHE[key] = df
    return df


def media_wav_corpus(spark: SparkSession, n: int = 200) -> DataFrame:
    """REAL PCM-16 WAV payloads with closed-form samples: clip i has
    ``64 + i%50`` mono frames at ``8000 + i`` Hz, sample t =
    ``((i*7 + t*13) % 65536) - 32768``. The decoder's RMS over
    [-1,1)-normalized samples is sqrt(sum(v^2)/2^30 / n) — every partial
    sum is a dyadic rational exactly representable in float64 (v^2 needs
    30 mantissa bits, n < 2^7 adds 7), so the value is identical across
    engines and summation orders, and DuckDB recomputes it from
    ``range()`` without a codec."""
    import pandas as pd

    from etl_file_loader_spark.operators import codecs

    key = (spark.sparkContext.applicationId, "media_wav", n)
    cached = _CACHE.get(key)
    if cached is not None:
        return cached
    payloads = []
    for i in range(n):
        frames = 64 + i % 50
        t = np.arange(frames, dtype=np.int64)
        v = ((i * 7 + t * 13) % 65536) - 32768
        payloads.append(codecs.wav_encode(8000 + i, v.astype("<i2")))
    pdf = pd.DataFrame(
        {"media_id": np.arange(n, dtype=np.int64), "content": payloads}
    )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(pdf, schema)
    while len(_CACHE) >= _CACHE_MAX:
        _CACHE.pop(next(iter(_CACHE)))
    _CACHE[key] = df
    return df


def media_jpeg_corpus(spark: SparkSession, n: int = 60) -> DataFrame:
    """REAL JPEG payloads (round 6; progressive added round 7) with
    id-derived solid colors, so the stdlib JPEG decoder is gate-verifiable
    without any codec on the oracle side: image i is a solid (r,g,b) =
    ((i*37)%256, (i*59)%256, (i*83)%256) rectangle of 16*(1 + i%3) x
    16*(1 + i%2) pixels, quality 85 + 5*(i%3), 4:2:0-subsampled for odd i,
    and PROGRESSIVE (SOF2, the full DC/AC first + refinement scan script)
    for every fifth id — the mix a real crawl delivers. A solid color is
    DC-only in every 8x8 block, so the lossy cycle reproduces it to within
    ~1 pixel unit (tolerance 2 in the gate covers chroma quantization +
    rounding); dims and decode_ok are exact. The final row (media_id = n)
    is a corrupt JPEG that must degrade to decode_ok=false."""
    import pandas as pd

    from etl_file_loader_spark.operators import jpeg as jpegc

    key = (spark.sparkContext.applicationId, "media_jpeg", n)
    cached = _CACHE.get(key)
    if cached is not None:
        return cached
    payloads = []
    for i in range(n):
        w, h = 16 * (1 + i % 3), 16 * (1 + i % 2)
        color = ((i * 37) % 256, (i * 59) % 256, (i * 83) % 256)
        img = np.full((h, w, 3), color, dtype=np.uint8)
        codec = jpegc.jpeg_encode_progressive if i % 5 == 4 else jpegc.jpeg_encode
        payloads.append(codec(img, quality=85 + 5 * (i % 3), subsample=bool(i % 2)))
    payloads.append(b"\xff\xd8\xff\xe0\x00\x10JFIF\x00" + b"\x55" * 48)
    pdf = pd.DataFrame(
        {"media_id": np.arange(n + 1, dtype=np.int64), "content": payloads}
    )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(pdf, schema)
    while len(_CACHE) >= _CACHE_MAX:
        _CACHE.pop(next(iter(_CACHE)))
    _CACHE[key] = df
    return df


def langid_corpus(
    spark: SparkSession,
    n: int = 2000,
    langs: tuple[str, ...] = ("aa", "bb", "cc", "dd"),
    vocab: int = 40,
    shared: int = 20,
) -> DataFrame:
    """LEARNABLE language-ID fixture (VERDICT r8 ask 6): the driver-made
    documents table shares one vocabulary across languages (TESTDATA.md —
    ``lang`` is unlearnable from its text), so this fixture provides
    per-language DISJOINT vocab strata a hashed n-gram classifier can
    actually learn, with enough noise to keep it non-trivial.

    Doc i: ``lang = langs[i % len(langs)]``, ``20 + i % 5`` tokens.
    Token j draws ``h = int(md5('lid:i:j')[:8], 16)`` and is

    - ``zz_(h % shared)``      when ``j % 3 == 0``  (language-neutral filler),
    - ``L_(h % vocab)`` for ``L = langs[h % len(langs)]``
                               when ``j % 7 == 1``  (cross-language noise),
    - ``lang_(h % vocab)``     otherwise            (own-language stratum).

    Every choice is md5 arithmetic on (i, j), so a DuckDB oracle
    regenerates the corpus exactly from ``range()`` — the
    ``langid_fixture`` suite query value-checks per-doc predictions
    end-to-end. Driver-side generation for bit-reproducibility, same as
    the media corpora (bounded n)."""
    import hashlib

    import pandas as pd

    key = (spark.sparkContext.applicationId, "langid", n, langs, vocab, shared)
    cached = _CACHE.get(key)
    if cached is not None:
        return cached
    rows = []
    for i in range(n):
        lang = langs[i % len(langs)]
        toks = []
        for j in range(20 + i % 5):
            h = int(hashlib.md5(f"lid:{i}:{j}".encode()).hexdigest()[:8], 16)
            if j % 3 == 0:
                toks.append(f"zz_{h % shared}")
            elif j % 7 == 1:
                toks.append(f"{langs[h % len(langs)]}_{h % vocab}")
            else:
                toks.append(f"{lang}_{h % vocab}")
        rows.append((i, lang, " ".join(toks)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = spark.createDataFrame(pdf, schema)
    while len(_CACHE) >= _CACHE_MAX:
        _CACHE.pop(next(iter(_CACHE)))
    _CACHE[key] = df
    return df


def media_png_neardup_corpus(spark: SparkSession, n_pairs: int = 40) -> DataFrame:
    """REAL PNG pairs for perceptual near-dup detection: media 2i and 2i+1
    share per-pixel md5-derived content (``B = md5int('img:i:y:x') % 256``,
    channels B/B+1/B+2 mod 256 — "random" images, so distinct pairs land
    ~28 bits apart on the 56-bit dHash), and the odd member bumps the base
    by +5 on the sparse lattice ``(y*13 + x*17) % 23 == 0`` — a small
    perceptual perturbation that flips only a few difference bits, like a
    recompression would. Everything is closed-form md5 arithmetic on
    (pair, y, x), so the oracle recomputes both members' hashes AND the
    pair hamming without decoding a byte (suite ``image_dedup_pairs``).
    Dims vary per pair (4 + i%13) x (3 + i%7), shared within a pair."""
    import hashlib

    import pandas as pd

    from etl_file_loader_spark.operators import codecs

    key = (spark.sparkContext.applicationId, "media_png_neardup", n_pairs)
    cached = _CACHE.get(key)
    if cached is not None:
        return cached
    payloads = []
    for m in range(2 * n_pairs):
        i, bump = m // 2, m % 2
        w, h = 4 + i % 13, 3 + i % 7
        px = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                b = int(
                    hashlib.md5(f"img:{i}:{y}:{x}".encode()).hexdigest()[:8], 16
                ) % 256
                if bump and (y * 13 + x * 17) % 23 == 0:
                    b = (b + 5) % 256
                for c in range(3):
                    px[y, x, c] = (b + c) % 256
        payloads.append(codecs.png_encode(px, filter_type=m % 5))
    pdf = pd.DataFrame(
        {"media_id": np.arange(2 * n_pairs, dtype=np.int64), "content": payloads}
    )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(pdf, schema)
    while len(_CACHE) >= _CACHE_MAX:
        _CACHE.pop(next(iter(_CACHE)))
    _CACHE[key] = df
    return df
