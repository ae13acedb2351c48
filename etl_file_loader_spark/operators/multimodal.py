"""Multimodal (image/audio/video) column plumbing.

Contract: media travels as an opaque ``binary`` column + typed metadata
struct. Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators — per-partition batch iterators, never per-row
Python — so a 1000-executor cluster streams binary batches through the
decoder with zero shuffle.

The actual codec step is STUBBED in this container (no PIL/ffmpeg):
``decode_image`` raises ``NotImplementedError`` unless ``fake=True``, in
which case a deterministic fake decoder parses our 12-byte synthetic header.
The Spark-side plumbing — schema, batch shape, partitioning — is real and
tested; swapping in PIL is a one-function change.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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

    Real decode requires an image library not present in this container —
    call with ``fake=True`` to use the deterministic FAKEIMG header parser
    (tests do); ``fake=False`` raises NotImplementedError at plan time.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not in this container); "
            "use fake=True for the deterministic test decoder"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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

    return df.select("media_id", "content").mapInPandas(decode_batches, _DECODE_SCHEMA)


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

    Same contract as ``decode_image``: the codec needs a library absent from
    this container (soundfile/ffmpeg), so ``fake=False`` raises at plan time
    and ``fake=True`` parses the deterministic FAKEAUD header. The Spark
    plumbing — Arrow batch iterator, schema, no shuffle — is the real path.
    """
    if not fake:
        raise NotImplementedError(
            "audio decode requires soundfile/ffmpeg (not in this container); "
            "use fake=True for the deterministic test decoder"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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

    return df.select("media_id", "content").mapInPandas(decode_batches, _AUDIO_SCHEMA)


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

    Stubbed codec (no PIL in this container): ``fake=True`` rewrites the
    FAKEIMG header dims and nearest-neighbor-samples the fake pixel body;
    the Spark plumbing (binary batches in -> binary batches out, schema,
    partitioning) is the real part.
    """
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL/opencv (not in this container); "
            "use fake=True for the deterministic test resizer"
        )

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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

    return df.select("media_id", "content").mapInPandas(resize_batches, _RESIZE_SCHEMA)


_FEATURE_SCHEMA = "media_id long, embedding array<float>, feature_ok boolean"


def image_features(df: DataFrame, dim: int = 8, fake: bool = False) -> DataFrame:
    """Extract a unit-normalized feature vector per image via mapInPandas —
    the feature-extract stage that bridges the multimodal columns into the
    similarity/dedup operators (its output is an ``embedding`` column the
    ANN and embedding-near-dup ops consume directly).

    Real extraction needs a vision model/runtime not in this container;
    ``fake=True`` computes a deterministic descriptor of the FAKEIMG
    payload (dims, length, byte statistics, boundary bytes), L2-normalized
    — honest plumbing: Arrow batches in, fixed-width float vectors out,
    same shape a CLIP-style encoder UDF would produce at ``dim`` = 512+.
    """
    if not fake:
        raise NotImplementedError(
            "image feature extraction requires a vision model runtime "
            "(not in this container); use fake=True for the deterministic "
            "descriptor"
        )

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                if b[:8] == FAKE_MAGIC:
                    w = int.from_bytes(b[8:10], "big")
                    h = int.from_bytes(b[10:12], "big")
                    body = np.frombuffer(b[12:], dtype=np.uint8).astype("float64")
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
                    out.append((int(mid), [float(x) for x in vec], True))
                else:
                    out.append((int(mid), None, False))
            yield pd.DataFrame(
                out, columns=["media_id", "embedding", "feature_ok"]
            )

    return df.select("media_id", "content").mapInPandas(
        feature_batches, _FEATURE_SCHEMA
    )
