"""Time-decay attribution over a planted event stream with hand-
computed integer credits."""

from datetime import datetime

from composable_logs_spark.queries.attribution_q import attribute_over

_T0 = datetime(2024, 1, 1, 12, 0, 0)


def _ev(eid, ts_s, user, typ, value):
    return (eid, datetime.fromtimestamp(_T0.timestamp() + ts_s), user, typ, value)


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    return {r["channel"]: r for r in attribute_over(df).collect()}


def test_planted_credits_exact(spark):
    # purchase of $100.00 at t=0 with a view 1 h before (weight
    # 3.6e9/7200 = 500000) and a click 3 h before (weight 3.6e9/14400
    # = 250000): credits 10000*500000//750000 = 6666 and 3333 cents
    rows = [
        _ev(1, -3600, 7, "view", 0.0),
        _ev(2, -10800, 7, "click", 0.0),
        _ev(3, 0, 7, "purchase", 100.0),
    ]
    got = _run(spark, rows)
    assert got["view"]["attributed_cents"] == 6666
    assert got["click"]["attributed_cents"] == 3333
    assert got["view"]["n_touches"] == got["click"]["n_touches"] == 1
    assert got["direct"]["n_touches"] == 0


def test_lookback_and_direct(spark):
    # a touch older than 24 h does not count; a touch from another user
    # does not count; the purchase then lands on 'direct' in full
    rows = [
        _ev(1, -90000, 7, "click", 0.0),  # beyond the 86400 s lookback
        _ev(2, -60, 8, "view", 0.0),  # wrong user
        _ev(3, 0, 7, "purchase", 42.0),
        _ev(4, 10, 7, "view", 0.0),  # after the purchase
    ]
    got = _run(spark, rows)
    assert got["direct"]["n_touches"] == 1
    assert got["direct"]["attributed_cents"] == 4200
    assert "view" not in got and "click" not in got
