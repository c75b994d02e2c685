"""Streaming audio near-dup: stream-vs-batch equivalence against the
fingerprint index, intra-batch pairing, growth-index stream-internal
matching, and restart/replay idempotence — the audio leg of the
modality matrix (mirrors tests/test_incremental_media.py)."""

import numpy as np
from pyspark.sql import functions as F

from composable_logs_spark.operators.codecs import encode_wav
from composable_logs_spark.queries import load
from composable_logs_spark.queries.media_audio_q import (
    _AUDIO_VARIANT_OFFSET,
    _N_FRAMES,
    _RATE,
    _SPF,
    media_audio_neardup,
    wav_variant_corpus_from_documents,
)
from composable_logs_spark.streaming.incremental_audio import (
    build_audio_index,
    stream_audio_against_index,
)


def test_stream_matches_batch_pairs(spark, sf_dir, tmp_path):
    media_dir = tmp_path / "incoming"
    ckpt = tmp_path / "ckpt"

    media = wav_variant_corpus_from_documents(load(spark, sf_dir, "documents"))
    base = media.where(F.col("media_id") < _AUDIO_VARIANT_OFFSET)
    index_sig = build_audio_index(base).cache()
    index_sig.count()
    # ONE file => one micro-batch: every batch-query pair whose newer
    # side is a variant — cross pairs (base x variant) via the index
    # join, variant x variant pairs via the intra-batch self-join
    media.where(F.col("media_id") >= _AUDIO_VARIANT_OFFSET).coalesce(
        1
    ).write.parquet(str(media_dir))

    got = []
    q = stream_audio_against_index(
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
        for r in media_audio_neardup(spark, sf_dir).collect()
        if r["media_b"] >= _AUDIO_VARIANT_OFFSET
    }
    assert streamed == expected
    assert len(streamed) > 0


def _wav(bits):
    """WAV whose 31-bit fingerprint realises ``bits`` exactly: frame f
    holds constant amplitude a_f (energy = SPF * a_f^2), built so
    a_f > a_{f+1} iff bits[f] (equal amplitudes encode a 0 bit)."""
    assert len(bits) == _N_FRAMES - 1
    a = [0] * _N_FRAMES
    a[_N_FRAMES - 1] = 64
    for f in range(_N_FRAMES - 2, -1, -1):
        a[f] = a[f + 1] + (1 if bits[f] else 0)
    pcm = np.repeat(np.array([128 + x for x in a], np.uint8), _SPF)
    return bytearray(
        encode_wav(pcm.tobytes(), rate=_RATE, n_channels=1, sample_width=1)
    )


def _write(spark, media_dir, rows):
    spark.createDataFrame(rows, "media_id long, payload binary").coalesce(
        1
    ).write.mode("append").parquet(str(media_dir))


def test_intra_batch_pairs_are_caught(spark, tmp_path):
    """Two near-dup tracks arriving in the SAME micro-batch are paired
    by the self-join leg — neither matches the index."""
    media_dir = tmp_path / "incoming"
    ckpt = tmp_path / "ckpt"
    media_dir.mkdir()

    half = [1] * 16 + [0] * 15
    evens = [1 if j % 2 == 0 else 0 for j in range(31)]
    # flipping bits[30] moves fp1 bit 30 AND fp2 bit 29 (fp2[f] =
    # OR(bits[f], bits[f+1]) under the equal-or-+1 amplitude builder):
    # Hamming 2, still under the <= 3 verify budget
    evens_flip = list(evens)
    evens_flip[30] = 1 - evens_flip[30]

    index_sig = build_audio_index(
        spark.createDataFrame([(1, _wav(half))], "media_id long, payload binary")
    ).cache()
    index_sig.count()
    _write(spark, media_dir, [(100, _wav(evens)), (200, _wav(evens_flip))])

    got = []
    q = stream_audio_against_index(
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
        (200, 100, 2)
    }


def test_growing_index_and_replay_idempotence(spark, tmp_path):
    """Batch 2's track matches a near-copy that arrived in batch 1 (the
    grown index); a restart from the same checkpoint replays nothing;
    post-restart arrivals still match pre-restart growth."""
    media_dir = tmp_path / "incoming"
    growth = tmp_path / "grown_index"
    ckpt = tmp_path / "ckpt"
    media_dir.mkdir()

    half = [1] * 16 + [0] * 15
    mid = [0] * 8 + [1] * 16 + [0] * 7
    evens = [1 if j % 2 == 0 else 0 for j in range(31)]
    evens_flip = list(evens)
    evens_flip[30] = 1 - evens_flip[30]  # Hamming 2 from evens (fp1+fp2)

    index_sig = build_audio_index(
        spark.createDataFrame(
            [(1, _wav(half)), (2, _wav(mid))], "media_id long, payload binary"
        )
    ).cache()
    index_sig.count()

    _write(spark, media_dir, [(100, _wav(evens))])

    got = []
    q = stream_audio_against_index(
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
        _write(spark, media_dir, [(200, _wav(evens_flip))])
        q.processAllAvailable()
    finally:
        q.stop()
    assert {(r["media_id"], r["dup_of"], r["hamming"]) for r in got} == {
        (200, 100, 2)
    }

    got2 = []
    q2 = stream_audio_against_index(
        spark,
        str(media_dir),
        index_sig,
        lambda df, bid: got2.extend(df.collect()),
        str(ckpt),
        index_growth_dir=str(growth),
    )
    try:
        q2.processAllAvailable()
        _write(spark, media_dir, [(300, _wav(evens))])
        q2.processAllAvailable()
    finally:
        q2.stop()
    # 300 re-sends the `evens` track: identical to 100 (Hamming 0) and
    # one flipped builder bit (= 2 signature bits) from 200
    pairs2 = {(r["media_id"], r["dup_of"], r["hamming"]) for r in got2}
    assert pairs2 == {(300, 100, 0), (300, 200, 2)}
