"""Multimodal plumbing: binary media columns, fake-codec decode demos.

Split from the monolithic suite.py (round 4); unit text unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from etl_file_loader_spark.suite._shared import ORACLES, QUERIES, _t


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata (byte length + derived dims), no decode."""
    docs = _t(spark, sf_dir, "documents")
    content = F.col("text").cast("binary")
    byte_len = F.length(content).cast("long")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        byte_len.alias("byte_len"),
        (byte_len % 640).cast("long").alias("fake_width"),
        (byte_len % 480).cast("long").alias("fake_height"),
    )


Q_MULTIMODAL_META_SQL = """
SELECT doc_id AS media_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
       CAST(octet_length(CAST(text AS BLOB)) % 640 AS BIGINT) AS fake_width,
       CAST(octet_length(CAST(text AS BLOB)) % 480 AS BIGINT) AS fake_height
FROM documents ORDER BY media_id
"""


def q_multimodal_decode_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode of deterministic fake image payloads (rows-only)."""
    import pandas as pd

    from etl_file_loader_spark.operators import multimodal as mm

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), "n_chars"
    )

    def pack(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": [
                        mm.pack_fake_image(int(m), int(n) % 640 + 1, int(n) % 480 + 1)
                        for m, n in zip(pdf["media_id"], pdf["n_chars"])
                    ],
                }
            )

    media = docs.mapInPandas(pack, "media_id long, content binary")
    return mm.decode_image(media, fake=True)


# Cross-engine oracle for the fake image decode: the payload is a pure
# function of (doc_id, n_chars), so DuckDB recomputes the decoder's exact
# arithmetic — width/height from n_chars, the 64-byte (doc_id*31+i)%256 body
# via an uncorrelated range(0,64) cross join (body length is always <=64),
# and mean_pixel as the same int/int true division (bit-identical doubles).
Q_MULTIMODAL_DECODE_FAKE_SQL = """
WITH base AS (
  SELECT doc_id AS media_id,
         CAST(n_chars % 640 + 1 AS INT) AS width,
         CAST(n_chars % 480 + 1 AS INT) AS height
  FROM documents
), body AS (
  SELECT media_id, width, height,
         LEAST(CAST(width AS BIGINT) * height, 64) AS blen
  FROM base
), sums AS (
  SELECT b.media_id, b.width, b.height, b.blen,
         SUM((b.media_id * 31 + t.i) % 256) AS s
  FROM body b, range(0, 64) t(i)
  WHERE t.i < b.blen
  GROUP BY ALL
)
SELECT media_id, width, height,
       CAST(s AS DOUBLE) / blen AS mean_pixel, TRUE AS decode_ok
FROM sums
"""


# ---------------------------------------------------------------------------
# multimodal audio
# ---------------------------------------------------------------------------


def q_audio_decode_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode of deterministic fake audio payloads (rows-only).

    Same Arrow-batched plumbing as the image path: binaries stream through
    per-partition batch iterators, no shuffle, schema fixed up front.
    """
    import pandas as pd

    from etl_file_loader_spark.operators import multimodal as mm

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), "n_chars"
    )

    def pack(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": [
                        mm.pack_fake_audio(int(m), 8000 + int(n) % 8 * 1000, int(n) * 10)
                        for m, n in zip(pdf["media_id"], pdf["n_chars"])
                    ],
                }
            )

    media = docs.mapInPandas(pack, "media_id long, content binary")
    return mm.decode_audio(media, fake=True)


# Cross-engine oracle for the fake audio decode: same scheme as the image
# twin — recompute the (doc_id*17+i)%256 PCM8 body arithmetically, rms as
# sqrt of the identical int/int quotient (IEEE correctly rounded in both
# engines), duration as the identical int/int division.
Q_AUDIO_DECODE_FAKE_SQL = """
WITH base AS (
  SELECT doc_id AS media_id,
         CAST(8000 + (n_chars % 8) * 1000 AS INT) AS sample_rate,
         CAST(n_chars AS BIGINT) * 10 AS n_samples
  FROM documents
), body AS (
  SELECT *, LEAST(n_samples, 64) AS blen FROM base
), sums AS (
  SELECT b.media_id, b.sample_rate, b.n_samples, b.blen,
         SUM(CASE WHEN t.i < b.blen
                  THEN ((b.media_id * 17 + t.i) % 256)
                       * ((b.media_id * 17 + t.i) % 256)
                  ELSE 0 END) AS ss,
         SUM(CASE WHEN t.i < b.blen THEN 1 ELSE 0 END) AS cnt
  FROM body b, range(0, 64) t(i)
  GROUP BY ALL
)
SELECT media_id, sample_rate, n_samples,
       CAST(n_samples AS DOUBLE) / sample_rate AS duration_sec,
       CASE WHEN cnt = 0 THEN 0.0 ELSE sqrt(CAST(ss AS DOUBLE) / cnt) END AS rms,
       TRUE AS decode_ok
FROM sums
"""


def q_multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec verification (round 5): decode genuine PNG payloads
    (zlib + all five scanline filters) whose pixels follow a closed-form
    formula, so DuckDB value-verifies width/height/mean_pixel WITHOUT a
    codec — proving the stdlib decoder recovers the exact pixel buffer.
    mean_pixel is an exact int/int quotient (bit-identical across engines)."""
    from etl_file_loader_spark import fixtures
    from etl_file_loader_spark.operators import multimodal as mm

    corpus = fixtures.media_png_corpus(spark, n=200)
    return mm.decode_image(corpus, fake=False).orderBy("media_id")


Q_MULTIMODAL_DECODE_REAL_SQL = """
WITH dims AS (
  SELECT i, 4 + i % 13 AS w, 3 + i % 7 AS h FROM range(0, 200) t(i)
),
px AS (
  SELECT i, w, h, (i*31 + y*7 + x*3 + c) % 256 AS v
  FROM dims,
       unnest(range(0, h)) u1(y),
       unnest(range(0, w)) u2(x),
       unnest(range(0, 3)) u3(c)
)
SELECT CAST(i AS BIGINT) AS media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(sum(v) AS DOUBLE) / count(*) AS mean_pixel,
       TRUE AS decode_ok
FROM px GROUP BY i, w, h ORDER BY media_id
"""


def q_multimodal_jpeg_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stdlib-JPEG verification (round 6; round 7 adds progressive):
    decode genuine JPEGs (4:4:4 and 4:2:0, three quality levels, every
    fifth payload progressive SOF2 with the full refinement scan script)
    whose solid-color contents derive from the media id. JPEG is lossy,
    so instead of exact
    means the gate checks |decoded mean - closed-form mean| <= 2 (solid
    colors are DC-only blocks — a broken Huffman/DCT/upsample path lands
    far outside that), with exact dims + decode_ok, and a corrupt trailer
    row that must degrade to decode_ok=false rather than fail the job."""
    from etl_file_loader_spark import fixtures
    from etl_file_loader_spark.operators import multimodal as mm

    n = 60
    corpus = fixtures.media_jpeg_corpus(spark, n=n)
    dec = mm.decode_image(corpus, fake=False)
    i = F.col("media_id")
    expected = ((i * 37) % 256 + (i * 59) % 256 + (i * 83) % 256) / F.lit(3.0)
    return dec.select(
        "media_id",
        F.coalesce(F.col("width"), F.lit(-1)).alias("width"),
        F.coalesce(F.col("height"), F.lit(-1)).alias("height"),
        F.col("decode_ok").cast("int").alias("decode_ok"),
        F.when(
            i >= n, (~F.col("decode_ok")).cast("int")  # corrupt row: ok iff rejected
        )
        .otherwise(
            (F.abs(F.col("mean_pixel") - expected) <= 2.0).cast("int")
        )
        .alias("value_ok"),
    ).orderBy("media_id")


Q_MULTIMODAL_JPEG_REAL_SQL = """
SELECT CAST(i AS BIGINT) AS media_id,
       CAST(CASE WHEN i >= 60 THEN -1 ELSE 16 * (1 + i % 3) END AS INT) AS width,
       CAST(CASE WHEN i >= 60 THEN -1 ELSE 16 * (1 + i % 2) END AS INT) AS height,
       CAST(CASE WHEN i >= 60 THEN 0 ELSE 1 END AS INT) AS decode_ok,
       CAST(1 AS INT) AS value_ok
FROM range(0, 61) t(i) ORDER BY media_id
"""


def q_audio_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV-codec verification (round 5): decode genuine PCM-16 WAVs
    with closed-form samples; rate/frames/duration/RMS are recomputed by
    DuckDB from range(). Every partial sum in the RMS is a dyadic rational
    exact in float64 (see fixtures.media_wav_corpus), so the value matches
    bit-for-bit across engines and summation orders."""
    from etl_file_loader_spark import fixtures
    from etl_file_loader_spark.operators import multimodal as mm

    corpus = fixtures.media_wav_corpus(spark, n=200)
    return mm.decode_audio(corpus, fake=False).orderBy("media_id")


Q_AUDIO_DECODE_REAL_SQL = """
WITH clips AS (
  SELECT i, 64 + i % 50 AS frames, 8000 + i AS rate FROM range(0, 200) c(i)
),
samp AS (
  SELECT i, frames, rate,
         ((i*7 + t*13) % 65536) - 32768 AS v
  FROM clips, unnest(range(0, frames)) u(t)
)
SELECT CAST(i AS BIGINT) AS media_id,
       CAST(rate AS INT) AS sample_rate,
       CAST(frames AS BIGINT) AS n_samples,
       CAST(frames AS DOUBLE) / rate AS duration_sec,
       sqrt((CAST(sum(v*v) AS DOUBLE) / 1073741824.0) / frames) AS rms,
       TRUE AS decode_ok
FROM samp GROUP BY i, frames, rate ORDER BY media_id
"""


def q_multimodal_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize verification (round 5): decode genuine PNGs, numpy
    nearest-neighbor resize to 5x4, re-encode as PNG on the workers, then
    decode AGAIN — the full codec cycle (decode -> resize -> encode ->
    decode) — and compare the resulting mean_pixel against DuckDB's
    closed-form recomputation of the nearest-neighbor index mapping
    (target (y,x) samples source ((y*h)//4, (x*w)//5)). Exact int/int
    quotient, bit-identical across engines."""
    from etl_file_loader_spark import fixtures
    from etl_file_loader_spark.operators import multimodal as mm

    corpus = fixtures.media_png_corpus(spark, n=200)
    resized = mm.resize_image(corpus, 5, 4).select("media_id", "content")
    return mm.decode_image(resized, fake=False).orderBy("media_id")


Q_MULTIMODAL_RESIZE_REAL_SQL = """
WITH dims AS (
  SELECT i, 4 + i % 13 AS w, 3 + i % 7 AS h FROM range(0, 200) t(i)
),
px AS (
  SELECT i,
         (i*31
          + least((yt * h) // 4, h - 1) * 7
          + least((xt * w) // 5, w - 1) * 3
          + c) % 256 AS v
  FROM dims,
       unnest(range(0, 4)) u1(yt),
       unnest(range(0, 5)) u2(xt),
       unnest(range(0, 3)) u3(c)
)
SELECT CAST(i AS BIGINT) AS media_id,
       CAST(5 AS INT) AS width,
       CAST(4 AS INT) AS height,
       CAST(sum(v) AS DOUBLE) / count(*) AS mean_pixel,
       TRUE AS decode_ok
FROM px GROUP BY i ORDER BY media_id
"""


QUERIES.update(
    {
        "multimodal_meta": q_multimodal_meta,
        "multimodal_decode_fake": q_multimodal_decode_fake,
        "audio_decode_fake": q_audio_decode_fake,
        "multimodal_decode_real": q_multimodal_decode_real,
        "multimodal_jpeg_real": q_multimodal_jpeg_real,
        "audio_decode_real": q_audio_decode_real,
        "multimodal_resize_real": q_multimodal_resize_real,
    }
)


ORACLES.update(
    {
        "multimodal_meta": Q_MULTIMODAL_META_SQL,
        "multimodal_decode_fake": Q_MULTIMODAL_DECODE_FAKE_SQL,
        "audio_decode_fake": Q_AUDIO_DECODE_FAKE_SQL,
        "multimodal_decode_real": Q_MULTIMODAL_DECODE_REAL_SQL,
        "multimodal_jpeg_real": Q_MULTIMODAL_JPEG_REAL_SQL,
        "audio_decode_real": Q_AUDIO_DECODE_REAL_SQL,
        "multimodal_resize_real": Q_MULTIMODAL_RESIZE_REAL_SQL,
    }
)


def q_image_dhash_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual dHash over REAL decoded PNGs (operators/multimodal.py:
    image_dhash): stdlib decode -> integer gray -> nearest 8x8 lattice ->
    56 horizontal-difference bits. The fixtures' pixels are closed-form,
    so the oracle recomputes every hash from the formula — decode,
    resample index math, and bit packing all value-verified without
    DuckDB touching a byte."""
    from etl_file_loader_spark import fixtures
    from etl_file_loader_spark.operators import multimodal

    corpus = fixtures.media_png_corpus(spark, n=200)
    out = multimodal.image_dhash(corpus)
    return out.select(
        "media_id", "dhash", F.col("decode_ok").cast("int").alias("decode_ok")
    ).orderBy("media_id")


# gray(B) for pixel base B = (i*31 + y*7 + x*3) % 256 with channels
# (B, B+1, B+2) each mod 256: (3B+3)//3 = B+1 below the wrap; the two
# wrap rows are closed-form constants
_DHASH_GRAY = (
    "(CASE WHEN ((i*31 + ({yy})*7 + ({xx})*3) % 256) <= 253 "
    "THEN ((i*31 + ({yy})*7 + ({xx})*3) % 256) + 1 "
    "WHEN ((i*31 + ({yy})*7 + ({xx})*3) % 256) = 254 THEN 169 "
    "ELSE 85 END)"
)

Q_IMAGE_DHASH_SQL = f"""
WITH ids AS (SELECT unnest(range(0, 200)) AS i),
dims AS (SELECT i, 4 + i % 13 AS w, 3 + i % 7 AS h FROM ids),
cells AS (
  SELECT i, w, h, yy.y AS y, xx.x AS x
  FROM dims, unnest(range(0, 8)) yy(y), unnest(range(0, 7)) xx(x)
),
g AS (
  SELECT i, y, x,
         {_DHASH_GRAY.format(yy="(y*h)//8", xx="((x+1)*w)//8")} AS g1,
         {_DHASH_GRAY.format(yy="(y*h)//8", xx="(x*w)//8")} AS g0
  FROM cells
)
SELECT i AS media_id,
       CAST(sum(CASE WHEN g1 > g0
                THEN (CAST(1 AS BIGINT) << (y*7 + x)) ELSE 0 END) AS BIGINT)
         AS dhash,
       1 AS decode_ok
FROM g
GROUP BY i
ORDER BY media_id
"""

QUERIES.update({"image_dhash_real": q_image_dhash_real})
ORACLES.update({"image_dhash_real": Q_IMAGE_DHASH_SQL})


def q_audio_fingerprint_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio energy-difference fingerprint + zero-crossing count over REAL
    decoded WAVs (operators/multimodal.py:audio_fingerprint) — integer
    arithmetic end to end, so the oracle recomputes every value from the
    fixtures' closed-form PCM samples without a codec."""
    from etl_file_loader_spark import fixtures
    from etl_file_loader_spark.operators import multimodal

    corpus = fixtures.media_wav_corpus(spark, n=200)
    out = multimodal.audio_fingerprint(corpus)
    return out.select(
        "media_id", "n_samples", "n_frames", "zcr", "energy_hash",
        F.col("decode_ok").cast("int").alias("decode_ok"),
    ).orderBy("media_id")


Q_AUDIO_FINGERPRINT_SQL = """
WITH ids AS (SELECT unnest(range(0, 200)) AS i),
s AS (
  SELECT i, tt.t AS t, ((i*7 + tt.t*13) % 65536) - 32768 AS v
  FROM ids, unnest(range(0, 64 + i % 50)) tt(t)
),
zcf AS (
  SELECT i,
         CASE WHEN (v < 0) <> (lag(v) OVER (PARTITION BY i ORDER BY t) < 0)
              THEN 1 ELSE 0 END AS flip
  FROM s
),
zc AS (SELECT i, CAST(sum(flip) AS BIGINT) AS zcr FROM zcf GROUP BY i),
en AS (
  SELECT i, t // 16 AS f, sum(v * v) AS e
  FROM s WHERE t < ((64 + i % 50) // 16) * 16
  GROUP BY i, t // 16
),
bits AS (
  SELECT a.i, CASE WHEN b.e > a.e THEN (CAST(1 AS BIGINT) << CAST(a.f AS INT))
              ELSE 0 END AS bit
  FROM en a JOIN en b ON b.i = a.i AND b.f = a.f + 1
),
h AS (SELECT i, CAST(coalesce(sum(bit), 0) AS BIGINT) AS energy_hash FROM bits GROUP BY i)
SELECT ids.i AS media_id,
       CAST(64 + ids.i % 50 AS BIGINT) AS n_samples,
       CAST((64 + ids.i % 50) // 16 AS BIGINT) AS n_frames,
       zc.zcr,
       coalesce(h.energy_hash, 0) AS energy_hash,
       1 AS decode_ok
FROM ids JOIN zc ON zc.i = ids.i LEFT JOIN h ON h.i = ids.i
ORDER BY media_id
"""

QUERIES.update({"audio_fingerprint_real": q_audio_fingerprint_real})
ORACLES.update({"audio_fingerprint_real": Q_AUDIO_FINGERPRINT_SQL})


def q_image_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dedup (operators/multimodal.py:
    image_dedup_pairs): dHash + pigeonhole block join over the REAL
    near-dup PNG fixture (40 base images + a sparsely-bumped variant
    each). The fixture is closed-form md5 arithmetic on (pair, y, x), so
    the oracle recomputes both members' 56-bit hashes AND every pair's
    hamming — pigeonhole at 7 blocks / hamming <= 6 is exact, so the
    blocked operator must produce exactly the all-pairs answer."""
    from etl_file_loader_spark import fixtures
    from etl_file_loader_spark.operators import multimodal

    corpus = fixtures.media_png_neardup_corpus(spark, n_pairs=40)
    return multimodal.image_dedup_pairs(
        corpus, grid=8, max_hamming=6, blocks=7
    ).orderBy("id_a", "id_b")


_ND_BASE = (
    "(CAST(('0x' || substr(md5('img:' || CAST(i AS VARCHAR) || ':' || "
    "CAST(py AS VARCHAR) || ':' || CAST({px} AS VARCHAR)), 1, 8)) AS BIGINT) % 256"
    " + CASE WHEN bump = 1 AND (py * 13 + {px} * 17) % 23 = 0 THEN 5 ELSE 0 END) % 256"
)

Q_IMAGE_DEDUP_PAIRS_SQL = f"""
WITH ids AS (SELECT unnest(range(0, 80)) AS m),
dims AS (
  SELECT m, m // 2 AS i, m % 2 AS bump,
         4 + (m // 2) % 13 AS w, 3 + (m // 2) % 7 AS h
  FROM ids
),
cells AS (
  SELECT m, i, bump, yy.y AS y, xx.x AS x,
         (yy.y * h) // 8 AS py,
         ((xx.x + 1) * w) // 8 AS px1,
         (xx.x * w) // 8 AS px0
  FROM dims, unnest(range(0, 8)) yy(y), unnest(range(0, 7)) xx(x)
),
bases AS (
  SELECT m, y, x,
         {_ND_BASE.format(px="px1")} AS b1,
         {_ND_BASE.format(px="px0")} AS b0
  FROM cells
),
g AS (
  SELECT m, y, x,
         CASE WHEN b1 <= 253 THEN b1 + 1 WHEN b1 = 254 THEN 169 ELSE 85 END AS g1,
         CASE WHEN b0 <= 253 THEN b0 + 1 WHEN b0 = 254 THEN 169 ELSE 85 END AS g0
  FROM bases
),
hashes AS (
  SELECT m,
         CAST(sum(CASE WHEN g1 > g0
                  THEN (CAST(1 AS BIGINT) << (y*7 + x)) ELSE 0 END) AS BIGINT)
           AS dh
  FROM g GROUP BY m
)
SELECT a.m AS id_a, b.m AS id_b,
       CAST(bit_count(xor(a.dh, b.dh)) AS INTEGER) AS hamming
FROM hashes a JOIN hashes b ON a.m < b.m
WHERE bit_count(xor(a.dh, b.dh)) <= 6
ORDER BY id_a, id_b
"""

QUERIES.update({"image_dedup_pairs": q_image_dedup_pairs})
ORACLES.update({"image_dedup_pairs": Q_IMAGE_DEDUP_PAIRS_SQL})
