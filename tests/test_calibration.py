"""Reliability bins over the learned classifier: counts must cover
every example, and the positive rate must separate across bins exactly
as the planted labels dictate."""

import pandas as pd

from composable_logs_spark.queries.calibration_q import (
    _CLAMP,
    classifier_calibration,
)


def test_calibration_bins_cover_and_separate(spark, sf_dir):
    rows = classifier_calibration(spark, sf_dir).collect()
    n_docs = len(pd.read_parquet(f"{sf_dir}/documents.parquet"))
    # one positive + one planted negative example per document
    assert sum(r["n"] for r in rows) == 2 * n_docs
    assert sum(r["n_pos"] for r in rows) == n_docs
    for r in rows:
        assert -_CLAMP <= r["bin"] <= _CLAMP
        assert r["pos_rate_milli"] == (1000 * r["n_pos"]) // r["n"]
    # NB on the planted corpus is saturated (the docstring's point):
    # negative-logit bins are pure negatives, positive bins pure prose
    for r in rows:
        if r["bin"] < 0:
            assert r["pos_rate_milli"] == 0
        if r["bin"] > 0:
            assert r["pos_rate_milli"] == 1000
    # and the curve is monotone over the observed bins
    ordered = sorted(rows, key=lambda r: r["bin"])
    rates = [r["pos_rate_milli"] for r in ordered]
    assert rates == sorted(rates)
