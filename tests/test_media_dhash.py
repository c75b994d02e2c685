"""dHash (gradient hash): the retouch-pairs property the aHash tests
prove, PLUS the property that motivates dHash at all — invariance to a
global monotone tone shift, which aHash does NOT have."""

import numpy as np

from composable_logs_spark.operators.codecs import encode_pnm
from composable_logs_spark.queries.media_dedup_q import (
    _HAMMING_MAX,
    dhash_signatures,
    phash_neardup_pairs,
)


def _media_df(spark, items):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in items], "media_id long, payload binary"
    )


def _picture(seed: int) -> np.ndarray:
    # column-wise ramp with a seed-dependent bright band: strong
    # horizontal gradients so dHash bits are well-defined
    arr = np.tile(np.arange(16, dtype=np.uint8) * 12, (16, 1))
    r = seed % 8
    arr[r : r + 2, :] = 220
    return arr


def test_planted_perturbation_pairs_with_base(spark):
    base = _picture(0)
    nudged = base.copy()
    nudged[0, 0] = min(255, int(nudged[0, 0]) + 4)
    other = _picture(5)[:, ::-1].copy()  # mirrored: gradients reversed
    media = _media_df(
        spark,
        [(1, encode_pnm(base)), (2, encode_pnm(nudged)), (3, encode_pnm(other))],
    )
    pairs = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in phash_neardup_pairs(dhash_signatures(media)).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= _HAMMING_MAX
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_tone_shift_invariance(spark):
    """Adding a constant to every pixel preserves every horizontal
    gradient sign, so the dHash signature must be IDENTICAL — the
    property that makes dHash robust where aHash (mean-threshold)
    flips bits near the mean."""
    base = _picture(2)
    brighter = np.clip(base.astype(np.int64) + 30, 0, 255).astype(np.uint8)
    media = _media_df(spark, [(1, encode_pnm(base)), (2, encode_pnm(brighter))])
    sigs = {
        r["media_id"]: (r["sim_lo"], r["sim_hi"])
        for r in dhash_signatures(media).collect()
    }
    assert sigs[1] == sigs[2]
