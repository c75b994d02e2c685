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


QUERIES = {
    "media_checksums": QuerySpec(media_checksums_q, CHECKSUM_SQL),
    "media_byte_histogram": QuerySpec(media_byte_histogram, HISTOGRAM_SQL),
}
