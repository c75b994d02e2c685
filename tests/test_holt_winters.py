"""Holt-Winters additive seasonal fold (queries/holt_winters_q)
against an independent pure-Python recurrence on the real sf0.001
daily series, plus the exact-periodicity property: on a perfectly
7-periodic zero-trend series the smoother must reproduce the future
values EXACTLY (level frozen, trend zero, seasonal queue invariant)."""

import datetime as dt
import math

import duckdb

from composable_logs_spark.queries.holt_winters_q import (
    _M,
    hw_over_daily,
    ts_holt_winters,
)

SF = "/root/testdata/sf0.001"

_A, _B, _G = 0.5, 0.25, 0.25


def _python_hw(ys):
    """Independent replica over a list of integer-cent daily sums."""
    m = _M
    lvl = sum(ys[:m]) / (100.0 * m)
    trd = 0.0
    seas = [y / 100.0 - lvl for y in ys[:m]]
    for y in ys[m:]:
        s_old = seas[0]
        lvl_t = _A * (y / 100.0 - s_old) + (1 - _A) * (lvl + trd)
        trd = _B * (lvl_t - lvl) + (1 - _B) * trd
        s_t = _G * (y / 100.0 - lvl_t) + (1 - _G) * s_old
        seas = seas[1:] + [s_t]
        lvl = lvl_t
    return lvl, trd, seas


def test_matches_independent_replica_on_real_series(spark):
    con = duckdb.connect()
    daily = con.execute(
        f"""
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               sum(CAST(floor(value * 100) AS BIGINT)) AS y
        FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series = {}
    for et, _, y in daily:
        series.setdefault(et, []).append(y)
    got = ts_holt_winters(spark, SF).collect()
    assert got, "no series long enough"
    for r in got:
        lvl, trd, seas = _python_hw(series[r["event_type"]])
        h = r["h"]
        assert math.isclose(r["level_r"], round(lvl, 4), abs_tol=1e-9)
        assert math.isclose(r["trend_r"], round(trd, 4), abs_tol=1e-9)
        assert math.isclose(r["seasonal_r"], round(seas[h - 1], 4), abs_tol=1e-9)
        assert math.isclose(
            r["forecast_r"], round(lvl + h * trd + seas[h - 1], 4), abs_tol=1e-9
        )


def _daily_df(spark, rows):
    return spark.createDataFrame(rows, "event_type string, day date, y long")


def test_exact_periodic_series_forecasts_exactly(spark):
    # y cycles a fixed weekly pattern with zero trend: the update's
    # (y - s_old) is the frozen level every step, so level/trend/seasonal
    # are all invariant and every h-step forecast equals the true value.
    pattern = [700, 1400, 2100, 2800, 3500, 4200, 4900]  # cents
    d0 = dt.date(2024, 1, 1)
    rows = [
        ("p", d0 + dt.timedelta(days=i), pattern[i % 7]) for i in range(28)
    ]
    out = hw_over_daily(_daily_df(spark, rows)).collect()
    assert len(out) == 7
    lvl0 = sum(pattern) / 700.0
    for r in out:
        assert r["trend_r"] == 0.0
        assert r["level_r"] == round(lvl0, 4)
        true_next = pattern[(28 + r["h"] - 1) % 7] / 100.0
        assert math.isclose(r["forecast_r"], round(true_next, 4), abs_tol=1e-9)


def test_short_series_filtered(spark):
    d0 = dt.date(2024, 1, 1)
    rows = [("s", d0 + dt.timedelta(days=i), 100) for i in range(2 * _M - 1)]
    assert hw_over_daily(_daily_df(spark, rows)).count() == 0
