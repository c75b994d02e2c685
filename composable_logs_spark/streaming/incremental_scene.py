"""Incremental VIDEO near-dup detection by temporal fingerprint:
stream arriving video payloads against a static scene-profile index —
the third media modality's ingest side, after images
(incremental_media: spatial aHash) and audio (incremental_audio:
spectral energy deltas). Temporal structure is the video-native
signal: cut patterns and per-frame brightness mass survive intra-frame
re-encoding.

At archive scale you never re-run pair-finding over the whole corpus
when a crawl lands; you keep the FINGERPRINT per video as the index —
(n_frames, profile_md5, n_cuts, fsum) — bytes per hour of footage:

- each micro-batch fingerprints the NEW payloads only, via the exact
  batch code (``queries.multimodal_q.scene_fingerprints`` — per-row
  array math, no explode, no shuffle), so stream and batch verdicts
  cannot drift;
- candidates come from the same (n_frames, profile_md5) equi-join the
  batch pair query uses — a strong quantized-profile key, never
  O(batch x index);
- verification is the batch query's exact per-frame tolerance
  (max |fsum_a - fsum_b| <= ``_V_TOL``) over candidate rows only.

Pairs WITHIN one micro-batch are caught by running the profile
self-join over the (tiny) batch fingerprint frame — without it, two
re-encodes arriving together would never be paired (both enter the
index; cross-matching only looks backwards).

With ``index_growth_dir`` the index GROWS: each batch's fingerprints
are appended after matching, so later arrivals match earlier arrivals,
not just the base archive. At-least-once replays are idempotent: the
grown index dedups on media_id at read, self-matches are filtered, and
an anti-join against the batch's own ids keeps replayed cross pairs
out of the cross leg (they re-emit identically from the intra leg).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from ..queries.multimodal_q import _V_TOL, scene_fingerprints

_MEDIA_SCHEMA = "media_id long, payload binary"


def build_scene_index(media: DataFrame) -> DataFrame:
    """Temporal fingerprints for the existing archive. Callers persist/
    cache this — it is read by every micro-batch."""
    return scene_fingerprints(media.select("media_id", "payload"))


def _verified_pairs(new_fp: DataFrame, old_fp: DataFrame) -> DataFrame:
    """(media_id, dup_of, max_frame_delta): candidates from the
    (n_frames, profile_md5) equi-join, verified at the exact per-frame
    tolerance — the batch query's two stages, verbatim shapes."""
    a = new_fp.select(
        "media_id", "n_frames", "profile_md5", F.col("fsum").alias("fsum_a")
    )
    b = old_fp.select(
        F.col("media_id").alias("dup_of"),
        "n_frames",
        "profile_md5",
        F.col("fsum").alias("fsum_b"),
    )
    return (
        a.join(b, ["n_frames", "profile_md5"])
        .where(F.col("media_id") != F.col("dup_of"))
        .withColumn(
            "max_frame_delta",
            F.expr(
                "aggregate(zip_with(fsum_a, fsum_b, (x, y) -> abs(x - y)),"
                " cast(0 as bigint), (acc, d) -> greatest(acc, d))"
            ),
        )
        .where(F.col("max_frame_delta") <= _V_TOL)
        .select("media_id", "dup_of", "max_frame_delta")
    )


def stream_scene_against_index(
    spark: SparkSession,
    media_dir: str,
    index_fp: DataFrame,
    on_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: Optional[str] = None,
    index_growth_dir: Optional[str] = None,
):
    """Watch ``media_dir`` for parquet files of (media_id, payload)
    videos; per micro-batch emit verified (media_id, dup_of,
    max_frame_delta) rows — new video vs indexed video, newer vs older
    within the batch. Returns the StreamingQuery."""
    _FP_SCHEMA = index_fp.schema

    stream = (
        spark.readStream.schema(_MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(media_dir)
    )

    def _current_index() -> DataFrame:
        # probe by ATTEMPTING the read, not os.path: in deployment the
        # growth dir lives on the cluster filesystem (HDFS/S3), where a
        # driver-local isdir() is always false and the grown index would
        # be silently ignored — later arrivals would never match earlier
        # ones. A failed read (dir absent / no files yet) means "no
        # growth yet"; the explicit schema avoids schema inference on
        # the probe.
        if index_growth_dir:
            try:
                grown = spark.read.schema(_FP_SCHEMA).parquet(index_growth_dir)
                grown.schema  # force plan resolution so absence surfaces here
            except AnalysisException:
                return index_fp
            return index_fp.unionByName(grown).dropDuplicates(["media_id"])
        return index_fp

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        idx = _current_index()
        # cache: the cross join, the intra self-join and the growth
        # append all read the batch fingerprints; without the pin the
        # per-row fingerprint pass runs once per consumer
        fp = scene_fingerprints(batch_df).cache()
        cross = _verified_pairs(fp, idx).join(
            # replay guard: a batch whose fingerprints already reached
            # the growth dir would match itself — those pairs belong to
            # (and re-emit identically from) the intra leg below
            fp.select(F.col("media_id").alias("dup_of")),
            "dup_of",
            "anti",
        )
        # pairs WITHIN this batch (newer id vs older id)
        intra = _verified_pairs(fp, fp).where(F.col("media_id") > F.col("dup_of"))
        verified = cross.unionByName(intra)
        try:
            on_batch(verified, batch_id)
            if index_growth_dir:
                fp.write.mode("append").parquet(index_growth_dir)
        finally:
            fp.unpersist()

    writer = stream.writeStream.foreachBatch(handle)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
