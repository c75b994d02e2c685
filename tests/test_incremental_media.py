"""Streaming image near-dup: stream-vs-batch equivalence against the
wide (256-bit) signature index, growth-index stream-internal matching,
and restart/replay idempotence (checkpoint + dedup-on-read of the grown
index). r12: the index runs on the WIDE signature (8 x 32-bit bands —
the measured 8-bit-band saturation remedy), so the batch comparator is
``media_phash_neardup_wide`` and the planted test images (2x2 blocks
per logical bit) produce 4x the 64-bit Hamming distances."""

import numpy as np
from pyspark.sql import functions as F

from composable_logs_spark.operators.codecs import encode_pnm
from composable_logs_spark.queries import load
from composable_logs_spark.queries.media_dedup_q import (
    _VARIANT_OFFSET,
    media_phash_neardup_wide,
    pnm_corpus_from_documents,
)
from composable_logs_spark.streaming.incremental_media import (
    build_ahash_index,
    stream_media_against_index,
)


def test_stream_matches_batch_pairs(spark, sf_dir, tmp_path):
    media_dir = tmp_path / "incoming"
    ckpt = tmp_path / "ckpt"

    media = pnm_corpus_from_documents(load(spark, sf_dir, "documents"))
    base = media.where(F.col("media_id") < _VARIANT_OFFSET)
    index_sig = build_ahash_index(base).cache()
    index_sig.count()
    # ONE file => one micro-batch, so the expected set is deterministic:
    # every batch-query pair whose newer side is a variant — cross pairs
    # (orig x variant) via the index join, variant x variant pairs via
    # the intra-batch self-join
    media.where(F.col("media_id") >= _VARIANT_OFFSET).coalesce(1).write.parquet(
        str(media_dir)
    )

    got = []
    q = stream_media_against_index(
        spark,
        str(media_dir),
        index_sig,
        lambda df, bid: got.extend(df.collect()),
        str(ckpt),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {(r["media_id"], r["dup_of"], r["hamming"]) for r in got}
    expected = {
        (r["media_b"], r["media_a"], r["hamming"])
        for r in media_phash_neardup_wide(spark, sf_dir).collect()
        if r["media_b"] >= _VARIANT_OFFSET
    }
    assert streamed == expected
    assert len(streamed) > 0


def _img(bits):
    """16x16 P5 image whose sampled 8x8 grid realises ``bits`` exactly:
    200-blocks force bit 1, 10-blocks bit 0 (for any 1 <= k <= 63 ones,
    200*64 > 200k + 10(64-k) > 10*64 — the mean threshold splits)."""
    a = np.zeros((16, 16), np.uint8)
    for j, b in enumerate(bits):
        r, c = divmod(j, 8)
        a[2 * r : 2 * r + 2, 2 * c : 2 * c + 2] = 200 if b else 10
    return bytearray(encode_pnm(a))


def _write(spark, media_dir, rows):
    spark.createDataFrame(rows, "media_id long, payload binary").coalesce(
        1
    ).write.mode("append").parquet(str(media_dir))


def test_intra_batch_pairs_are_caught(spark, tmp_path):
    """Two near-dups arriving in the SAME micro-batch are paired by the
    batch self-join leg — neither matches the index, and without the
    intra leg the pair would be lost forever (both enter the index,
    cross-matching only looks backwards)."""
    media_dir = tmp_path / "incoming"
    ckpt = tmp_path / "ckpt"
    media_dir.mkdir()

    half = [1] * 32 + [0] * 32
    evens = [1 if j % 2 == 0 else 0 for j in range(64)]
    evens_flip = list(evens)
    evens_flip[62] = 0

    index_sig = build_ahash_index(
        spark.createDataFrame([(1, _img(half))], "media_id long, payload binary")
    ).cache()
    index_sig.count()
    _write(spark, media_dir, [(100, _img(evens)), (200, _img(evens_flip))])

    got = []
    q = stream_media_against_index(
        spark,
        str(media_dir),
        index_sig,
        lambda df, bid: got.extend(df.collect()),
        str(ckpt),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert {(r["media_id"], r["dup_of"], r["hamming"]) for r in got} == {
        (200, 100, 4)  # one logical bit = a 2x2 block = 4 of the 256 bits
    }


def test_growing_index_and_replay_idempotence(spark, tmp_path):
    """Batch 2's image matches a near-copy that arrived in batch 1 (the
    grown index), and a restart from the same checkpoint replays
    nothing — the at-least-once growth appends are made harmless by the
    dedup-on-read of the grown index."""
    media_dir = tmp_path / "incoming"
    growth = tmp_path / "grown_index"
    ckpt = tmp_path / "ckpt"
    media_dir.mkdir()

    half = [1] * 32 + [0] * 32
    mid = [0] * 16 + [1] * 32 + [0] * 16
    evens = [1 if j % 2 == 0 else 0 for j in range(64)]
    evens_flip = list(evens)
    evens_flip[62] = 0  # one logical bit (= wide Hamming 4) from `evens`

    index_sig = build_ahash_index(
        spark.createDataFrame(
            [(1, _img(half)), (2, _img(mid))], "media_id long, payload binary"
        )
    ).cache()
    index_sig.count()

    _write(spark, media_dir, [(100, _img(evens))])

    got = []
    q = stream_media_against_index(
        spark,
        str(media_dir),
        index_sig,
        lambda df, bid: got.extend(df.collect()),
        str(ckpt),
        index_growth_dir=str(growth),
    )
    try:
        q.processAllAvailable()
        assert got == []  # batch 1: nothing matches the base index
        _write(spark, media_dir, [(200, _img(evens_flip))])
        q.processAllAvailable()
    finally:
        q.stop()
    assert {(r["media_id"], r["dup_of"], r["hamming"]) for r in got} == {
        (200, 100, 4)  # one logical bit = a 2x2 block = 4 of the 256 bits
    }

    # restart from the same checkpoint: no file is reprocessed, no pair
    # re-emitted, and the grown index still holds exactly one signature
    # per media_id after dedup-on-read
    got2 = []
    q2 = stream_media_against_index(
        spark,
        str(media_dir),
        index_sig,
        lambda df, bid: got2.extend(df.collect()),
        str(ckpt),
        index_growth_dir=str(growth),
    )
    try:
        q2.processAllAvailable()
        # a genuinely new near-copy after the restart still matches —
        # including against signatures grown BEFORE the restart
        _write(spark, media_dir, [(300, _img(evens))])
        q2.processAllAvailable()
    finally:
        q2.stop()
    # 300 re-sends the `evens` image: identical to 100 (Hamming 0) and
    # one flipped logical bit (wide Hamming 4) away from 200
    pairs2 = {(r["media_id"], r["dup_of"], r["hamming"]) for r in got2}
    assert pairs2 == {(300, 100, 0), (300, 200, 4)}
