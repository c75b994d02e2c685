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


def media_scene_cut(spark: SparkSession, sf: str) -> DataFrame:
    """Scene-cut detection for video-ish payloads — the TEMPORAL
    multimodal shape ``media_frame_sample`` (spatial sampling) doesn't
    cover: per 64-byte frame, an integer brightness proxy (byte sum);
    a cut wherever consecutive frames differ by more than ``_CUT_T``.

    The whole computation is per-row array math — frame sums via one
    ``transform`` over frame indices, adjacent deltas via ``zip_with``
    of the two shifted ``slice``s — so there is NO explode, NO window
    and NO shuffle: a 10^6-frame video stays one row whose arrays are
    bounded by the payload already in memory. (The per-frame explode +
    lag-window alternative shuffles every frame row by media_id for
    the sort the window needs — strictly worse at 100 TB.) Exact
    integer arithmetic end to end; the cut-index md5 pins the exact
    cut POSITIONS cross-engine, not just their count."""
    media = synthetic_media_from_documents(spark, sf)
    staged = media.select(
        "media_id",
        F.expr("cast(meta.n_bytes div 64 as int)").alias("nf"),
        "payload",
    ).withColumn(
        "fsum",
        # frame i's byte sum: payload is ASCII by construction, so
        # ascii(chr) over the cast-to-string frame reads the byte value
        F.expr(
            "transform(sequence(0, nf - 1), i -> aggregate("
            " split(cast(substring(payload, cast(i * 64 + 1 as int), 64)"
            "       as string), ''),"
            " cast(0 as bigint), (a, c) -> a + ascii(c)))"
        ),
    )
    deltas = (
        "zip_with(slice(fsum, 2, nf - 1), slice(fsum, 1, nf - 1),"
        " (a, b) -> abs(a - b))"
    )
    return (
        staged.where(F.col("nf") >= 2)
        .withColumn(
            "cuts",
            F.expr(
                # delta position j is 0-based and sits between 1-based
                # frames j+1 and j+2: report the frame AFTER the cut
                f"filter(transform({deltas},"
                f" (d, j) -> struct(j + 2 AS at, d AS delta)),"
                f" s -> s.delta > {_CUT_T})"
            ),
        )
        .select(
            "media_id",
            F.col("nf").alias("n_frames"),
            F.size("cuts").cast("long").alias("n_cuts"),
            F.expr("cast(aggregate(cuts, cast(0 as bigint), (a, s) ->"
                   " greatest(a, s.delta)) as bigint)").alias("max_cut_delta"),
            # NULL (not md5('')) when no cuts: DuckDB's array_to_string
            # over an empty list is NULL, so pin the same convention
            F.when(
                F.size("cuts") > 0,
                F.md5(
                    F.expr(
                        "concat_ws(',', transform(cuts, s -> cast(s.at as string)))"
                    )
                ),
            ).alias("cut_md5"),
        )
    )


_CUT_T = 256  # brightness-sum jump that counts as a scene change


SCENE_SQL = f"""
WITH m AS (
  SELECT doc_id AS media_id, text, CAST(length(text) // 64 AS INT) AS nf
  FROM documents
),
sums AS (
  SELECT media_id, nf,
    list_transform(range(0, nf), i ->
      CAST(list_sum(list_transform(
        string_split_regex(substring(text, CAST(i * 64 + 1 AS INT), 64), ''),
        c -> ascii(c))) AS BIGINT)) AS fsum
  FROM m WHERE nf >= 2
),
cuts AS (
  SELECT media_id, nf,
    list_filter(
      list_transform(range(2, nf + 1),
        j -> struct_pack(at := j, delta := abs(fsum[j] - fsum[j - 1]))),
      s -> s.delta > {_CUT_T}) AS cuts
  FROM sums
)
SELECT media_id,
       nf AS n_frames,
       CAST(len(cuts) AS BIGINT) AS n_cuts,
       CAST(coalesce(list_max(list_transform(cuts, s -> s.delta)), 0)
         AS BIGINT) AS max_cut_delta,
       CASE WHEN len(cuts) > 0
            THEN md5(array_to_string(
                   list_transform(cuts, s -> CAST(s.at AS VARCHAR)), ','))
            END AS cut_md5
FROM cuts
"""


QUERIES = {
    "media_checksums": QuerySpec(media_checksums_q, CHECKSUM_SQL),
    "media_byte_histogram": QuerySpec(media_byte_histogram, HISTOGRAM_SQL),
    "media_frame_sample": QuerySpec(media_frame_sample, FRAME_SQL),
    "media_scene_cut": QuerySpec(media_scene_cut, SCENE_SQL),
}
