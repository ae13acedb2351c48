"""Multimodal (image/audio/video) column plumbing.

Contract: media travels as an opaque ``binary`` column + typed metadata
struct. Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators — per-partition batch iterators, never per-row
Python — so a 1000-executor cluster streams binary batches through the
decoder with zero shuffle.

The codec step is REAL (rounds 5-6): ``fake=False`` decodes PNG via the
dependency-free ``operators.codecs`` (zlib + numpy unfilter), baseline
sequential JPEG via ``operators.jpeg`` (round 6 — stdlib Huffman/DCT,
4:4:4/4:2:2/4:2:0, the vast majority of real-world JPEGs), and WAV via
the stdlib ``wave`` module, picking up Pillow / soundfile automatically
when importable for the remaining formats (progressive JPEG, WebP,
FLAC, ...). Payloads no installed codec can decode yield
``decode_ok=False`` rows — per-row DLQ-style honesty instead of failing
the job. ``fake=True`` keeps the deterministic 12-byte-header parser the
cross-engine value oracles pin (the plumbing contract the driver
verifies every round).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_file_loader_spark.operators import codecs

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("byte_len", T.LongType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

FAKE_MAGIC = b"FAKEIMG!"


def pack_fake_image(media_id: int, width: int, height: int) -> bytes:
    """Deterministic synthetic image payload: magic + w/h (2 bytes each) + pixels."""
    body = bytes((media_id * 31 + i) % 256 for i in range(min(width * height, 64)))
    return FAKE_MAGIC + width.to_bytes(2, "big") + height.to_bytes(2, "big") + body


def attach_media_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Column-expression metadata (no decode): byte length + sniffed mime."""
    c = F.col(content_col)
    mime = (
        F.when(F.substring(c, 1, 8) == F.lit(FAKE_MAGIC), "image/x-fake")
        .when(F.substring(c, 1, 8) == F.lit(b"FAKEAUD!"), "audio/x-fake")
        .when(F.substring(c, 1, 3) == F.lit(b"\xff\xd8\xff"), "image/jpeg")
        .when(F.substring(c, 1, 4) == F.lit(b"\x89PNG"), "image/png")
        .when(F.substring(c, 1, 4) == F.lit(b"RIFF"), "audio/wav")
        .when(F.substring(c, 1, 3) == F.lit(b"ID3"), "audio/mpeg")
        .otherwise("application/octet-stream")
    )
    return df.withColumn(
        "meta",
        F.struct(F.length(c).cast("long").alias("byte_len"), mime.alias("mime")),
    )


_DECODE_SCHEMA = (
    "media_id long, width int, height int, mean_pixel double, decode_ok boolean"
)


def decode_image(df: DataFrame, fake: bool = False, batch_hint: int = 0) -> DataFrame:
    """Decode image binaries to (width, height, mean_pixel) via mapInPandas.

    ``fake=False`` (the real path): PNG decodes everywhere via the
    stdlib codec; other formats decode when Pillow is importable;
    undecodable payloads yield ``decode_ok=False``. ``fake=True`` is the
    deterministic FAKEIMG header parser the cross-engine oracle pins —
    its arithmetic (exact int/int division) must stay byte-stable.
    """

    def decode_fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is not None and bytes(content[:8]) == FAKE_MAGIC:
                    w = int.from_bytes(bytes(content[8:10]), "big")
                    h = int.from_bytes(bytes(content[10:12]), "big")
                    body = bytes(content[12:])
                    # Plain int/int true division: both CPython and SQL engines
                    # produce the identical correctly-rounded double, so the
                    # value is cross-engine oracle-checkable bit-for-bit.
                    mean = (sum(body) / len(body)) if body else 0.0
                    out.append((int(mid), w, h, mean, True))
                else:
                    out.append((int(mid), None, None, None, False))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "mean_pixel", "decode_ok"]
            )

    def decode_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                if b[:8] == FAKE_MAGIC:
                    # synthetic payloads keep the fake-header semantics so
                    # mixed corpora produce one consistent result set
                    w = int.from_bytes(b[8:10], "big")
                    h = int.from_bytes(b[10:12], "big")
                    body = b[12:]
                    mean = (sum(body) / len(body)) if body else 0.0
                    out.append((int(mid), w, h, mean, True))
                    continue
                px = codecs.decode_image_bytes(b) if b else None
                if px is None:
                    out.append((int(mid), None, None, None, False))
                else:
                    h, w = px.shape[0], px.shape[1]
                    # exact int/int division (deterministic across platforms)
                    mean = float(px.astype(np.int64).sum()) / px.size
                    out.append((int(mid), w, h, mean, True))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "mean_pixel", "decode_ok"]
            )

    fn = decode_fake if fake else decode_real
    return df.select("media_id", "content").mapInPandas(fn, _DECODE_SCHEMA)


FAKE_AUDIO_MAGIC = b"FAKEAUD!"


def pack_fake_audio(media_id: int, sample_rate: int, n_samples: int) -> bytes:
    """Deterministic synthetic audio payload: magic + rate/len (4 bytes each)
    + up-to-64-byte PCM8 body."""
    body = bytes((media_id * 17 + i) % 256 for i in range(min(n_samples, 64)))
    return (
        FAKE_AUDIO_MAGIC
        + sample_rate.to_bytes(4, "big")
        + n_samples.to_bytes(4, "big")
        + body
    )


_AUDIO_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, duration_sec double, "
    "rms double, decode_ok boolean"
)


def decode_audio(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode audio binaries to (rate, length, duration, rms) via mapInPandas.

    ``fake=False`` (the real path): PCM WAV decodes everywhere via the
    stdlib ``wave`` codec (8/16/24/32-bit, any channel count; ``rms`` is
    over [-1,1)-normalized samples pooled across channels); other formats
    decode when soundfile is importable; undecodable payloads yield
    ``decode_ok=False``. ``fake=True`` parses the deterministic FAKEAUD
    header the cross-engine value oracle pins.
    """

    def decode_fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is not None and bytes(content[:8]) == FAKE_AUDIO_MAGIC:
                    rate = int.from_bytes(bytes(content[8:12]), "big")
                    n = int.from_bytes(bytes(content[12:16]), "big")
                    body = bytes(content[16:])
                    # math.sqrt of an exactly-representable int/int quotient is
                    # IEEE correctly rounded — identical across engines, so the
                    # result set carries a cross-engine value oracle.
                    rms = (
                        math.sqrt(sum(b * b for b in body) / len(body))
                        if body
                        else 0.0
                    )
                    out.append(
                        (int(mid), rate, n, n / rate if rate else None, rms, True)
                    )
                else:
                    out.append((int(mid), None, None, None, None, False))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "n_samples", "duration_sec",
                    "rms", "decode_ok",
                ],
            )

    def decode_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                if b[:8] == FAKE_AUDIO_MAGIC:
                    rate = int.from_bytes(b[8:12], "big")
                    n = int.from_bytes(b[12:16], "big")
                    body = b[16:]
                    rms = (
                        math.sqrt(sum(x * x for x in body) / len(body))
                        if body
                        else 0.0
                    )
                    out.append(
                        (int(mid), rate, n, n / rate if rate else None, rms, True)
                    )
                    continue
                dec = codecs.decode_audio_bytes(b) if b else None
                if dec is None:
                    out.append((int(mid), None, None, None, None, False))
                else:
                    rate, x = dec
                    n = int(x.shape[0])
                    rms = float(np.sqrt((x * x).mean())) if x.size else 0.0
                    out.append(
                        (int(mid), int(rate), n, n / rate if rate else None, rms, True)
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "n_samples", "duration_sec",
                    "rms", "decode_ok",
                ],
            )

    fn = decode_fake if fake else decode_real
    return df.select("media_id", "content").mapInPandas(fn, _AUDIO_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* shape: one row per sampled frame index.

    The decode of each frame is the stubbed step; the fan-out (posexplode of
    the sampled index list) is the real Spark plumbing and is what matters
    for partitioning: frames of one video stay in one partition.
    """
    n_frames = (F.length("content") / 16).cast("int")  # fake: 16 bytes/frame
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.select(
        "media_id", F.posexplode(idx).alias("sample_pos", "frame_index")
    )


_RESIZE_SCHEMA = "media_id long, content binary, width int, height int"


def resize_image(df: DataFrame, target_w: int, target_h: int, fake: bool = False) -> DataFrame:
    """Resize images to (target_w, target_h) via mapInPandas.

    ``fake=False`` (the real path): decode (stdlib PNG / PIL), numpy
    nearest-neighbor index-sample to the target grid, re-encode as PNG
    (output format is always PNG — deterministic bytes, no quality knob);
    undecodable payloads yield null content. ``fake=True`` rewrites the
    FAKEIMG header dims and nearest-neighbor-samples the fake pixel body.
    """

    def resize_fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                if b[:8] == FAKE_MAGIC:
                    body = b[12:]
                    n = min(len(body), target_w * target_h, 64)
                    step = max(1, len(body) // n) if n else 1
                    new_body = body[::step][:n]
                    new = (
                        FAKE_MAGIC
                        + target_w.to_bytes(2, "big")
                        + target_h.to_bytes(2, "big")
                        + new_body
                    )
                    out.append((int(mid), new, target_w, target_h))
                else:
                    out.append((int(mid), None, None, None))
            yield pd.DataFrame(
                out, columns=["media_id", "content", "width", "height"]
            )

    def resize_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                px = codecs.decode_image_bytes(b) if b else None
                if px is None:
                    out.append((int(mid), None, None, None))
                    continue
                if px.ndim == 2:
                    px = px[:, :, None]
                h, w = px.shape[0], px.shape[1]
                # nearest neighbor: sample the source grid at target centers
                ys = np.minimum((np.arange(target_h) * h) // target_h, h - 1)
                xs = np.minimum((np.arange(target_w) * w) // target_w, w - 1)
                resized = px[ys[:, None], xs[None, :], :]
                out.append(
                    (int(mid), codecs.png_encode(resized), target_w, target_h)
                )
            yield pd.DataFrame(
                out, columns=["media_id", "content", "width", "height"]
            )

    fn = resize_fake if fake else resize_real
    return df.select("media_id", "content").mapInPandas(fn, _RESIZE_SCHEMA)


_FEATURE_SCHEMA = "media_id long, embedding array<float>, feature_ok boolean"


def image_features(df: DataFrame, dim: int = 8, fake: bool = False) -> DataFrame:
    """Extract a unit-normalized feature vector per image via mapInPandas —
    the feature-extract stage that bridges the multimodal columns into the
    similarity/dedup operators (its output is an ``embedding`` column the
    ANN and embedding-near-dup ops consume directly).

    ``fake=False`` (the real path): decode via the stdlib PNG / PIL
    codecs and compute the descriptor from the ACTUAL pixel buffer —
    dims, pixel count, byte statistics, first byte — L2-normalized. It is
    a hand-rolled global-statistics descriptor (a real vision model is
    still the production choice for semantic similarity; the seam is this
    UDF's body), but near-duplicate images genuinely cluster under it, so
    decode -> features -> ANN is a working end-to-end path. ``fake=True``
    computes the same descriptor family from the FAKEIMG header/body —
    the deterministic form the cross-engine oracle pins.
    """

    def _descriptor(np, w, h, body, dim):
        stats = [
            float(w),
            float(h),
            float(len(body)),
            float(body.mean()) if len(body) else 0.0,
            float(body.std()) if len(body) else 0.0,
            float(body.min()) if len(body) else 0.0,
            float(body.max()) if len(body) else 0.0,
            float(body[0]) if len(body) else 0.0,
        ]
        v = np.asarray((stats * ((dim // len(stats)) + 1))[:dim])
        nrm = float(np.sqrt((v * v).sum()))
        vec = (v / nrm if nrm else v).astype("float32")
        return [float(x) for x in vec]

    def feature_fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                if b[:8] == FAKE_MAGIC:
                    w = int.from_bytes(b[8:10], "big")
                    h = int.from_bytes(b[10:12], "big")
                    body = np.frombuffer(b[12:], dtype=np.uint8).astype("float64")
                    out.append((int(mid), _descriptor(np, w, h, body, dim), True))
                else:
                    out.append((int(mid), None, False))
            yield pd.DataFrame(
                out, columns=["media_id", "embedding", "feature_ok"]
            )

    def feature_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                px = codecs.decode_image_bytes(b) if b else None
                if px is None:
                    out.append((int(mid), None, False))
                    continue
                h, w = px.shape[0], px.shape[1]
                body = px.reshape(-1).astype("float64")
                out.append((int(mid), _descriptor(np, w, h, body, dim), True))
            yield pd.DataFrame(
                out, columns=["media_id", "embedding", "feature_ok"]
            )

    fn = feature_fake if fake else feature_real
    return df.select("media_id", "content").mapInPandas(fn, _FEATURE_SCHEMA)


_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def image_dhash(df: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL decoded images — the
    multimodal near-dup primitive (recompression/resize-invariant where
    exact byte hashes are not): decode, integer grayscale
    ``(r+g+b) // 3``, nearest-neighbor sample onto a grid x grid lattice
    (``xi = x*w // grid``), then one bit per horizontal neighbor pair
    ``gray[y][x+1] > gray[y][x]`` — grid*(grid-1) bits (56 at the default
    8, fitting a non-negative int64: engines disagree on 64-bit overflow
    semantics, DuckDB errors where Java wraps, so bit 63 stays unused).

    Everything after decode is INTEGER arithmetic, so on the closed-form
    PNG fixtures the oracle recomputes the hash from the pixel formula
    without decoding a byte (suite ``image_dhash_real``) — the decode
    pipeline, the resampling index math, and the bit packing are all
    value-verified. mapInPandas, zero shuffle; dedup = group/join on the
    hash (exact) or banded hamming (near-dup), same as simhash.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                # defensive like audio_fingerprint: ANY per-image failure
                # degrades to decode_ok=False instead of failing the task
                try:
                    b = bytes(content) if content is not None else b""
                    px = codecs.decode_image_bytes(b) if b else None
                    if px is None:
                        out.append((int(mid), None, False))
                        continue
                    a = px.astype(np.int64)
                    if a.ndim == 2:
                        gray = a
                    elif a.shape[2] >= 3:  # RGB / RGBA: ignore alpha
                        gray = (a[:, :, 0] + a[:, :, 1] + a[:, :, 2]) // 3
                    else:  # gray+alpha (PNG color type 4 / PIL 'LA')
                        gray = a[:, :, 0]
                    h, w = gray.shape
                    ys = (np.arange(grid) * h) // grid
                    xs = (np.arange(grid) * w) // grid
                    g = gray[np.ix_(ys, xs)]
                    bits = (g[:, 1:] > g[:, :-1]).astype(np.int64)
                    weights = 1 << np.arange(grid * (grid - 1), dtype=np.int64)
                    out.append(
                        (int(mid), int((bits.ravel() * weights).sum()), True)
                    )
                except Exception:
                    out.append((int(mid), None, False))
            yield pd.DataFrame(out, columns=["media_id", "dhash", "decode_ok"])

    return df.select("media_id", "content").mapInPandas(run, _DHASH_SCHEMA)


_AFP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("zcr", T.LongType()),
        T.StructField("energy_hash", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def audio_fingerprint(df: DataFrame, frame: int = 16) -> DataFrame:
    """Audio near-dup fingerprint (the WAV twin of ``image_dhash``, a
    chromaprint-style energy-difference hash in PURE INTEGER math):
    decode the RAW integer PCM at its native width
    (``codecs.wav_decode_int`` — no float round-trip, so the integer
    guarantee holds for 8/16/24/32-bit alike), then

    - ``zcr``: zero-crossing count (sign = v < 0, compared to the
      previous sample) — the classic voiced/unvoiced/noise feature;
    - ``energy_hash``: frame energies ``Σ v²`` over complete
      ``frame``-sample windows, one bit per consecutive-frame energy
      increase (bit f = energy[f+1] > energy[f]).

    Integer arithmetic end to end: on the closed-form WAV fixtures the
    oracle recomputes both from the sample formula without a codec
    (suite ``audio_fingerprint_real``). mapInPandas, zero shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                try:
                    _, xi = codecs.wav_decode_int(b)
                except Exception:
                    out.append((int(mid), None, None, None, None, False))
                    continue
                v = xi[:, 0]
                n = len(v)
                neg = v < 0
                zcr = int((neg[1:] != neg[:-1]).sum()) if n > 1 else 0
                nf = n // frame
                h = 0
                if nf >= 1:
                    e = (v[: nf * frame].reshape(nf, frame) ** 2).sum(axis=1)
                    for f in range(nf - 1):
                        if e[f + 1] > e[f]:
                            h |= 1 << f
                out.append((int(mid), n, nf, zcr, h, True))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_samples", "n_frames", "zcr",
                    "energy_hash", "decode_ok",
                ],
            )

    return df.select("media_id", "content").mapInPandas(run, _AFP_SCHEMA)


def image_dedup_pairs(
    df: DataFrame,
    grid: int = 8,
    max_hamming: int = 6,
    blocks: int = 7,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Perceptual near-duplicate image pairs: :func:`image_dhash` composed
    with the SimHash pigeonhole blocking machinery
    (dedup._blocked_pairs_from_fingerprints) — the multimodal analog of
    text simhash dedup. Two images within ``max_hamming`` on the
    ``grid*(grid-1)``-bit dHash share at least one of ``blocks`` hash
    blocks (pigeonhole needs ``blocks > max_hamming`` and
    ``blocks | bits``; the 56-bit default splits into 7 x 8-bit blocks,
    exact up to hamming 6), so candidates meet on a block equi-join and
    only candidates pay the true-hamming rescore — never all pairs.
    Undecodable images drop (no fingerprint, no pairs). Returns
    (id_a, id_b, hamming) with id_a < id_b."""
    from etl_file_loader_spark.operators.dedup import (
        _blocked_pairs_from_fingerprints,
    )

    bits = grid * (grid - 1)
    from etl_file_loader_spark.operators.cache import pin

    sh = pin(
        image_dhash(df, grid=grid)
        .filter(F.col("decode_ok"))
        .select(F.col("media_id"), F.col("dhash").alias("simhash"))
    )
    return _blocked_pairs_from_fingerprints(
        sh, "media_id", bits, max_hamming, blocks, max_bucket_size=max_bucket_size
    )
