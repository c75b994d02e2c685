"""Cross-modal keyframe near-dup: the planted brightness-shift variants
must be INVISIBLE to the temporal fingerprint query and FOUND by the
keyframe spatial-hash composition; and the JVM-side keyframe aHash must
be bit-identical to the PNM-codec ``ahash_signatures`` it composes
with."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from composable_logs_spark.operators.codecs import encode_pnm
from composable_logs_spark.queries import load
from composable_logs_spark.queries.media_dedup_q import ahash_signatures
from composable_logs_spark.queries.media_keyframe_q import (
    _KF_HAMMING_MAX,
    _KF_OFFSET,
    _KF_VAR_MOD,
    keyframe_corpus_from_documents,
    keyframe_hashes,
    media_keyframe_spatial_neardup,
)
from composable_logs_spark.queries.multimodal_q import (
    _V_TOL,
    scene_fingerprints,
)


def _vid(byte_rows):
    return bytearray(b"".join(bytes([v]) * 64 for v in byte_rows))


def test_brightness_variant_found_here_not_by_temporal(spark):
    """+1 to every byte: cut positions survive (deltas cancel), frame
    sums move by +64 each — past the temporal verify tolerance and off
    the quantized profile key — while every keyframe aHash is exactly
    invariant (the mean-threshold compare is shift-invariant)."""
    assert 64 > _V_TOL  # the construction's premise, pinned
    base = _vid([10, 10, 200, 200, 10])
    shifted = bytearray(b + 1 for b in base)
    corpus = spark.createDataFrame(
        [(1, base), (2, shifted), (3, _vid([90, 90, 90, 90, 90]))],
        "media_id long, payload binary",
    )
    fp = scene_fingerprints(corpus).cache()
    # temporal: profile keys differ -> no candidate pair at all
    profiles = {r["media_id"]: r["profile_md5"] for r in fp.collect()}
    assert profiles[1] != profiles[2]
    # spatial: same cut positions, keyframe hashes identical
    kf = keyframe_hashes(fp, corpus)
    rows = {(r["media_id"], r["at"]): (r["kf_lo"], r["kf_hi"]) for r in kf.collect()}
    # cuts at frames 3 (10->200) and 5 (200->10), identically in both
    assert set(rows) == {(1, 3), (1, 5), (2, 3), (2, 5)}
    assert rows[(1, 3)] == rows[(2, 3)]
    assert rows[(1, 5)] == rows[(2, 5)]
    fp.unpersist()


def test_planted_variants_paired_at_corpus_scale(spark, sf_dir):
    got = media_keyframe_spatial_neardup(spark, sf_dir).collect()
    pairs = {(r["media_a"], r["media_b"]) for r in got}
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    fp = scene_fingerprints(keyframe_corpus_from_documents(docs))
    cut_bearing = {
        r["media_id"]
        for r in fp.where(F.col("n_cuts") >= 1)
        .select("media_id")
        .collect()
    }
    # every planted variant whose base video HAS cuts must be paired
    # with its base (hamming 0 — the shift is exactly invariant)
    expected = {
        (m, m + _KF_OFFSET)
        for m in cut_bearing
        if m < _KF_OFFSET
        and m % _KF_VAR_MOD == 0
        and (m + _KF_OFFSET) in cut_bearing
    }
    assert expected, "fixture regression: no cut-bearing planted variants"
    assert expected <= pairs
    # and every emitted pair respects the verify tolerance
    assert all(r["max_kf_hamming"] <= _KF_HAMMING_MAX for r in got)


def test_keyframe_hash_matches_pnm_ahash_bitwise(spark):
    """Composition proof: the SQL-expression keyframe hash and the
    mapInPandas PNM-codec aHash implement the SAME function. Wrap each
    keyframe's 64 bytes as an 8x8 P5 image and compare signatures
    bit-for-bit."""
    rng = np.random.RandomState(11)
    frames = rng.randint(0, 256, size=(3, 64), dtype=np.uint8)
    # a video whose frames are the three random rasters, separated by
    # high-mass cut frames so every raster frame is a keyframe
    payload = bytearray()
    for f in frames:
        payload += bytes([0]) * 64 + bytes(f)
    corpus = spark.createDataFrame(
        [(7, payload)], "media_id long, payload binary"
    )
    fp = scene_fingerprints(corpus)
    kf = {
        r["at"]: (r["kf_lo"], r["kf_hi"])
        for r in keyframe_hashes(fp, corpus).collect()
    }
    pnm = spark.createDataFrame(
        pd.DataFrame(
            [
                {"media_id": i, "payload": encode_pnm(f.reshape(8, 8))}
                for i, f in enumerate(frames)
            ]
        ),
        "media_id long, payload binary",
    )
    want = {
        r["media_id"]: (r["sim_lo"], r["sim_hi"])
        for r in ahash_signatures(pnm).collect()
    }
    # raster frame i sits at 1-based frame 2*i + 2 (cut frame before it)
    got_by_raster = {i: kf.get(2 * i + 2) for i in range(3)}
    assert got_by_raster == want
