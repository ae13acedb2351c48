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


QUERIES.update(
    {
        "multimodal_meta": q_multimodal_meta,
        "multimodal_decode_fake": q_multimodal_decode_fake,
        "audio_decode_fake": q_audio_decode_fake,
    }
)


ORACLES.update(
    {
        "multimodal_meta": Q_MULTIMODAL_META_SQL,
        "multimodal_decode_fake": Q_MULTIMODAL_DECODE_FAKE_SQL,
        "audio_decode_fake": Q_AUDIO_DECODE_FAKE_SQL,
    }
)
