"""Property test: the DataFrame funnel must agree with a brute-force
Python reference on arbitrary small event sets (duplicate timestamps,
missing steps, out-of-order arrival, single-step users)."""

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from composable_logs_spark.queries.session_q import funnel_over

_T0 = datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # user_id
        st.sampled_from(["view", "click", "purchase", "error"]),
        st.integers(min_value=0, max_value=50),  # seconds offset
    ),
    min_size=1,
    max_size=40,
)


def _python_funnel(rows):
    by_user = {}
    for uid, etype, off in rows:
        by_user.setdefault(uid, []).append((etype, off))
    n_view = n_click = n_purchase = 0
    for evs in by_user.values():
        views = sorted(o for t, o in evs if t == "view")
        clicks = sorted(o for t, o in evs if t == "click")
        purchases = sorted(o for t, o in evs if t == "purchase")
        if not views:
            continue
        n_view += 1
        first_click = next((c for c in clicks if c > views[0]), None)
        if first_click is None:
            continue
        n_click += 1
        if any(p > first_click for p in purchases):
            n_purchase += 1
    return n_view, n_click, n_purchase


@settings(max_examples=12, deadline=None)
@given(events_strategy)
def test_funnel_matches_bruteforce(spark, rows):
    df = spark.createDataFrame(
        [(uid, etype, _T0 + timedelta(seconds=off)) for uid, etype, off in rows],
        "user_id long, event_type string, ts timestamp",
    )
    got = {r["step"]: r["users"] for r in funnel_over(df).collect()}
    n_view, n_click, n_purchase = _python_funnel(rows)
    assert got == {"view": n_view, "click": n_click, "purchase": n_purchase}
