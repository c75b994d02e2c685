"""Incremental IMAGE near-dup detection: stream arriving images against
a static signature index — the media modality's always-on ingest side,
completing the pattern every text modality already has
(incremental_dedup / incremental_bm25 / incremental_semdedup /
incremental_substr).

At 100 TB of crawled images you never re-run pair-finding over the
whole archive when a crawl lands; you keep 32 BYTES of signature per
image as the index and band-join each arriving batch against it:

- the index is signatures only (media_id, w0..w7 — the full-raster
  256-bit aHash as eight 32-bit words): bytes per image, ~0.02% of
  payload bytes, cache-friendly long after the raw archive is
  petabytes;
- each micro-batch decodes + hashes the NEW images only, in one
  Arrow-batched ``mapInPandas`` (``queries.media_dedup_q.
  ahash256_signatures`` — the exact code the wide batch query runs, so
  stream and batch verdicts agree and no media byte ever reaches the
  driver);
- candidates come from the same 8x 32-bit band equi-join
  (``ahash256_band_buckets``), then exact Hamming<=6 verification over
  all 256 bits — pigeonhole-exact recall (6 < 8 bands), and the stream
  never sees an O(batch x index) comparison.

Round 12 migration (queued by SCALE.md r11): the index moved from the
64-bit aHash's 8x 8-bit bands to the WIDE signature's 8x 32-bit bands —
the 8-bit keys were the measured saturation wall (2.92 B raw band-join
rows at 160 k images, ~N²/2⁸ per band growing quadratically in index
size; the 2^32-key bands measured 106x fewer candidate rows on the same
corpus). An always-growing streaming index hits that wall FIRST, which
is why it migrates even though the 64-bit batch queries keep their
classic-aHash semantics as a gate-scale operator surface.

Pairs WITHIN one micro-batch are caught too: besides the new-vs-index
band join, each batch runs the wide batch query's own band self-join
over its (tiny) signature frame — without it, two near-dups arriving
together would never be paired by anyone (both enter the index and
cross-matching only looks backwards).

With ``index_growth_dir`` the index GROWS: each batch's signatures are
appended (signatures only) after matching, so later arrivals match
earlier arrivals, not just the base archive. At-least-once replays are
made idempotent by deduping the grown index on media_id at read AND by
filtering self-matches (a replayed batch whose signatures already
reached the growth dir would otherwise match ITSELF at Hamming 0) —
the replay then re-emits exactly the pairs the original attempt
emitted, never self-pairs.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.media_dedup_q import (
    _WIDE_HAMMING_MAX,
    _WIDE_WORDS,
    ahash256_band_buckets,
    ahash256_hamming_col,
    ahash256_neardup_pairs,
    ahash256_signatures,
)

_MEDIA_SCHEMA = "media_id long, payload binary"


def build_ahash_index(media: DataFrame) -> DataFrame:
    """Wide (256-bit) signatures for the existing archive. Callers
    persist/cache this — it is read by every micro-batch."""
    return ahash256_signatures(media.select("media_id", "payload"))


def stream_media_against_index(
    spark: SparkSession,
    media_dir: str,
    index_sig: DataFrame,
    on_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: Optional[str] = None,
    index_growth_dir: Optional[str] = None,
):
    """Watch ``media_dir`` for parquet files of (media_id, payload)
    images; per micro-batch emit verified (media_id, dup_of, hamming)
    rows — new image vs index image. Returns the StreamingQuery."""
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
        # cache: the band join and the growth append both read the
        # batch signatures; without the pin the image decode mapInPandas
        # runs once per consumer (the media_phash_neardup discipline)
        sig = ahash256_signatures(batch_df).cache()
        new_side = ahash256_band_buckets(sig).select(
            "media_id",
            *[F.col(f"w{k}").alias(f"wn{k}") for k in range(_WIDE_WORDS)],
            "probe",
            "bucket",
        )
        old_side = ahash256_band_buckets(idx).select(
            F.col("media_id").alias("dup_of"),
            *[F.col(f"w{k}").alias(f"wo{k}") for k in range(_WIDE_WORDS)],
            "probe",
            "bucket",
        )
        cand = (
            new_side.join(old_side, ["probe", "bucket"])
            # self-match guard: a replayed batch whose signatures were
            # already appended to the growth dir would match itself
            .where(F.col("media_id") != F.col("dup_of"))
            .select(
                "media_id",
                "dup_of",
                *[f"wn{k}" for k in range(_WIDE_WORDS)],
                *[f"wo{k}" for k in range(_WIDE_WORDS)],
            )
            .distinct()
        )
        cross = (
            cand.withColumn("hamming", ahash256_hamming_col("wn", "wo"))
            .where(F.col("hamming") <= _WIDE_HAMMING_MAX)
            .select("media_id", "dup_of", "hamming")
            # anti vs the batch's own ids: on a replay the grown index
            # already holds THIS batch's signatures — those pairs belong
            # to (and are re-emitted identically by) the intra leg below
            .join(
                sig.select(F.col("media_id").alias("dup_of")), "dup_of", "anti"
            )
        )
        # pairs WITHIN this batch: the wide batch query's band self-join
        # over the batch-sized signature frame (media_a < media_b) —
        # emitted as (newer id, dup_of = older id) to match the cross leg
        intra = ahash256_neardup_pairs(sig).select(
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
