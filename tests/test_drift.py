"""drift_q: PSI and CUSUM against independent pandas/numpy references."""

import math

import numpy as np
import pandas as pd

from composable_logs_spark.queries.drift_q import (
    _CUTOFF,
    _N_BINS,
    cusum_changepoint_events,
    drift_psi_events,
)


def test_psi_matches_pandas(spark, sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    cutoff = pd.Timestamp(_CUTOFF)
    got = {r["event_type"]: r for r in drift_psi_events(spark, sf_dir).collect()}
    for et, g in pdf.groupby("event_type"):
        lo, hi = g.value.min(), g.value.max()
        width = (hi - lo) / _N_BINS + 1e-12
        bins = np.minimum(_N_BINS - 1, np.floor((g.value - lo) / width)).astype(int)
        is_ref = (g.ts < cutoff).to_numpy()
        psi = 0.0
        t_ref, t_cur = is_ref.sum(), (~is_ref).sum()
        for b in range(_N_BINS):
            nr = int(((bins == b) & is_ref).sum())
            nc = int(((bins == b) & ~is_ref).sum())
            if nr > 0 and nc > 0:
                p, q = nr / t_ref, nc / t_cur
                psi += (p - q) * math.log(p / q)
        r = got[et]
        assert r["n_ref"] == t_ref and r["n_cur"] == t_cur
        assert abs(r["psi"] - psi) < 1e-3
        assert r["drifted"] == (r["psi"] >= 0.2)


def test_cusum_matches_numpy(spark, sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    pdf["day"] = pdf.ts.dt.floor("d")
    got = {
        r["event_type"]: r
        for r in cusum_changepoint_events(spark, sf_dir).collect()
    }
    for et, g in pdf.groupby("event_type"):
        daily = g.groupby("day").size().sort_index()
        d, t = len(daily), daily.sum()
        scaled = np.cumsum(d * daily.to_numpy() - t)
        # argmax of |S| with earliest-day tie-break
        peak = int(np.abs(scaled).max())
        idx = int(np.argmax(np.abs(scaled) == peak))
        r = got[et]
        assert r["d"] == d
        assert r["changepoint_day"] == daily.index[idx].date()
        assert abs(r["cusum_peak"] - scaled[idx] / d) < 0.01
