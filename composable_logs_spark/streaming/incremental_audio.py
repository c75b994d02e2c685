"""Incremental AUDIO near-dup detection: stream arriving WAV tracks
against a static fingerprint index — the audio modality's always-on
ingest side, closing the modality matrix (text: incremental_dedup /
incremental_bm25 / incremental_semdedup / incremental_substr; image:
incremental_media; audio: this module).

At 100 TB of crawled audio you never re-run pair-finding over the whole
archive when a crawl lands; you keep 16 BYTES of two-word energy-delta
fingerprint per track (``queries.media_audio_q.audio_signatures`` —
the exact code the batch query runs, so stream and batch verdicts
agree) and band-join each arriving batch against it:

- the index is signatures only (media_id, fp1, fp2);
- each micro-batch decodes + fingerprints the NEW tracks only, in one
  Arrow-batched ``mapInPandas``; payload bytes never reach the driver;
- candidates come from the 4x 15-bit band equi-join over the packed
  61-bit signature (``audio_band_buckets`` — 15-bit keys because 8-bit
  keys measurably saturate quadratically at ~10^5 tracks, see
  media_audio_q), then exact Hamming <= 3 verification over both words
  — EXACT recall by pigeonhole (<= 3 flipped bits touch at most 3 of
  the 4 bands), and the stream never sees an O(batch x index)
  comparison.

Pairs WITHIN one micro-batch are caught by the batch query's own band
self-join over the batch-sized signature frame (the incremental_media
intra leg — without it, two near-dups arriving together would never be
paired: both enter the index and cross-matching only looks backwards).

With ``index_growth_dir`` the index GROWS: each batch's signatures are
appended (signatures only) after matching, so later arrivals match
earlier arrivals, not just the base archive. At-least-once replays are
made idempotent by deduping the grown index on media_id at read AND by
anti-joining cross matches against the batch's own ids (a replayed
batch whose signatures already reached the growth dir would otherwise
match ITSELF at Hamming 0) — the replay re-emits exactly the pairs the
original attempt emitted, never self-pairs.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.media_audio_q import (
    _AUDIO_HAMMING_MAX,
    audio_band_buckets,
    audio_hamming_col,
    audio_neardup_pairs,
    audio_signatures,
)

_MEDIA_SCHEMA = "media_id long, payload binary"


def build_audio_index(media: DataFrame) -> DataFrame:
    """Fingerprint signatures for the existing archive. Callers persist
    or cache this — it is read by every micro-batch."""
    return audio_signatures(media.select("media_id", "payload"))


def stream_audio_against_index(
    spark: SparkSession,
    media_dir: str,
    index_sig: DataFrame,
    on_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: Optional[str] = None,
    index_growth_dir: Optional[str] = None,
):
    """Watch ``media_dir`` for parquet files of (media_id, payload) WAV
    tracks; per micro-batch emit verified (media_id, dup_of, hamming)
    rows — new track vs index track. Returns the StreamingQuery."""
    import os

    _SIG_SCHEMA = index_sig.schema

    stream = (
        spark.readStream.schema(_MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(media_dir)
    )

    def _current_index() -> DataFrame:
        if index_growth_dir and os.path.isdir(index_growth_dir) and any(
            f.endswith(".parquet") for f in os.listdir(index_growth_dir)
        ):
            grown = spark.read.schema(_SIG_SCHEMA).parquet(index_growth_dir)
            return index_sig.unionByName(grown).dropDuplicates(["media_id"])
        return index_sig

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        idx = _current_index()
        # cache: the band join, the intra self-join, and the growth
        # append all read the batch signatures; without the pin the WAV
        # decode mapInPandas runs once per consumer
        sig = audio_signatures(batch_df).cache()
        cand = (
            audio_band_buckets(sig)
            .select(
                F.col("media_id"),
                F.col("fp1").alias("fp1_n"),
                F.col("fp2").alias("fp2_n"),
                "probe",
                "bucket",
            )
            .join(
                audio_band_buckets(idx).select(
                    F.col("media_id").alias("dup_of"),
                    F.col("fp1").alias("fp1_o"),
                    F.col("fp2").alias("fp2_o"),
                    "probe",
                    "bucket",
                ),
                ["probe", "bucket"],
            )
            # self-match guard: a replayed batch whose signatures were
            # already appended to the growth dir would match itself
            .where(F.col("media_id") != F.col("dup_of"))
            .select("media_id", "dup_of", "fp1_n", "fp2_n", "fp1_o", "fp2_o")
            .distinct()
        )
        cross = (
            cand.withColumn(
                "hamming", audio_hamming_col("fp1_n", "fp2_n", "fp1_o", "fp2_o")
            )
            .where(F.col("hamming") <= _AUDIO_HAMMING_MAX)
            .select("media_id", "dup_of", "hamming")
            # anti vs the batch's own ids: on a replay the grown index
            # already holds THIS batch's signatures — those pairs belong
            # to (and are re-emitted identically by) the intra leg below
            .join(
                sig.select(F.col("media_id").alias("dup_of")), "dup_of", "anti"
            )
        )
        # pairs WITHIN this batch, emitted as (newer id, dup_of = older
        # id) to match the cross convention
        intra = audio_neardup_pairs(sig).select(
            F.col("media_b").alias("media_id"),
            F.col("media_a").alias("dup_of"),
            "hamming",
        )
        verified = cross.unionByName(intra)
        try:
            on_batch(verified, batch_id)
            if index_growth_dir:
                sig.write.mode("append").parquet(index_growth_dir)
        finally:
            sig.unpersist()

    writer = stream.writeStream.foreachBatch(handle)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
