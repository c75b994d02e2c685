"""Multimodal-column queries: binary payload plumbing with oracles.

The synthetic media table derives payloads from documents.text (pure
ASCII), so DuckDB can recompute byte-level results from the text and the
comparison checks the whole binary pipeline (encode → mapInPandas /
JVM-side md5 → aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from ..operators.multimodal import (
    extract_features,
    media_checksums,
    synthetic_media_from_documents,
)


def media_checksums_q(spark: SparkSession, sf: str) -> DataFrame:
    media = synthetic_media_from_documents(spark, sf)
    return media_checksums(media)


CHECKSUM_SQL = """
SELECT doc_id AS media_id, 'image' AS kind, md5(text) AS payload_md5,
       CAST(length(text) AS BIGINT) AS n_bytes
FROM documents
"""


def media_byte_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow-batched byte-histogram features; project bucket 0-3 for the
    oracle (full array checked in unit tests)."""
    media = synthetic_media_from_documents(spark, sf)
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(F.col("features").getItem(0), 6).alias("f0"),
        F.round(F.col("features").getItem(1), 6).alias("f1"),
        F.round(F.col("features").getItem(2), 6).alias("f2"),
        F.round(F.col("features").getItem(3), 6).alias("f3"),
    )


HISTOGRAM_SQL = """
WITH chars AS (
  SELECT doc_id, length(text) AS n, string_split_regex(text, '') AS cs FROM documents
)
SELECT doc_id AS media_id,
       CAST(n AS BIGINT) AS n_bytes,
       round(len(list_filter(cs, c -> ascii(c) % 16 = 0)) / CAST(n AS DOUBLE), 6) AS f0,
       round(len(list_filter(cs, c -> ascii(c) % 16 = 1)) / CAST(n AS DOUBLE), 6) AS f1,
       round(len(list_filter(cs, c -> ascii(c) % 16 = 2)) / CAST(n AS DOUBLE), 6) AS f2,
       round(len(list_filter(cs, c -> ascii(c) % 16 = 3)) / CAST(n AS DOUBLE), 6) AS f3
FROM chars
"""


def media_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Frame-sampling shape for video-ish payloads: treat the binary as
    fixed 64-byte frames, sample every 4th full frame, fingerprint the
    sampled bytes. Pure JVM-side binary slicing (substring on BINARY) —
    the decode-free fast path; a real codec plugs into extract_features
    for pixel-level work. Narrow map, zero shuffle."""
    media = synthetic_media_from_documents(spark, sf)
    staged = media.select(
        "media_id",
        F.expr("cast(meta.n_bytes div 64 as int)").alias("nf"),
        "payload",
    )
    return staged.select(
        "media_id",
        F.col("nf").alias("n_frames"),
        F.expr(
            "case when nf > 0 then"
            " cast(size(filter(sequence(0, nf - 1), i -> i % 4 = 0)) as int)"
            " else 0 end"
        ).alias("n_sampled"),
        F.expr(
            "case when nf > 0 then"
            " md5(concat_ws('', transform(filter(sequence(0, nf - 1), i -> i % 4 = 0),"
            " i -> cast(substring(payload, cast(i * 64 + 1 as int), 64) as string))))"
            " end"
        ).alias("sample_md5"),
    )


FRAME_SQL = """
WITH m AS (
  SELECT doc_id AS media_id, text, CAST(length(text) // 64 AS INT) AS nf
  FROM documents
)
SELECT media_id,
       nf AS n_frames,
       CASE WHEN nf > 0
            THEN CAST(len(list_filter(range(0, nf), i -> i % 4 = 0)) AS INT)
            ELSE 0 END AS n_sampled,
       CASE WHEN nf > 0
            THEN md5(array_to_string(
                   list_transform(list_filter(range(0, nf), i -> i % 4 = 0),
                                  i -> substring(text, CAST(i * 64 + 1 AS INT), 64)),
                   ''))
            END AS sample_md5
FROM m
"""


QUERIES = {
    "media_checksums": QuerySpec(media_checksums_q, CHECKSUM_SQL),
    "media_byte_histogram": QuerySpec(media_byte_histogram, HISTOGRAM_SQL),
    "media_frame_sample": QuerySpec(media_frame_sample, FRAME_SQL),
}
