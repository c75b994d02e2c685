"""The driver's correctness gate checks the FIRST 50 entries of the
query registry, so the front window is a verification surface in its own
right. ``all_queries`` pins it explicitly by name; this file asserts the
pin so an innocent module reorder can't silently change which queries
the driver hash-checks — and (round 12) turns the ROTATION POLICY itself
into an executable invariant computed from the committed
CORRECTNESS_r*.json records, so a stale window fails CI instead of
waiting for a judge to notice.

Round-12 window (see ``_FRONT_WINDOW``): the queries NEW this round
(dedup_minhash_est_error, components_chain_doubling,
retrieval_rrf_hybrid), the 6 queries whose implementation changed
this round (the ccnet recipe + substr family single-tokenize perf
refactor; values unchanged, plans changed), the 3 r7-stale names the
r11 comment promised to rotate, and the r8-stale block in name order
(5 already listed as changed; the two tail seats the late additions
took — window_rolling_week_spend, window_running_customer_spend —
rotate in r13).
"""

import glob
import json
import os

from composable_logs_spark.queries import _FRONT_WINDOW, all_queries

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_driver_gate_window_is_pinned():
    got = list(all_queries())[:50]
    assert got == _FRONT_WINDOW, (
        "registry front-50 changed — the driver gate would now check a "
        "different query set; update _FRONT_WINDOW deliberately, never "
        f"implicitly (unexpected head: {[k for k in got if k not in _FRONT_WINDOW]})"
    )


def test_window_is_exactly_fifty_unique_names():
    assert len(_FRONT_WINDOW) == 50
    assert len(set(_FRONT_WINDOW)) == 50


def _newest_green_by_name() -> dict[str, int]:
    """newest round with a driver hash-green row, per query name, from
    the committed CORRECTNESS_r*.json records (the same histogram the
    round verdicts derive by hand)."""
    newest: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        rnd = int(os.path.basename(path).split("r")[1].split(".")[0])
        with open(path) as f:
            rec = json.load(f)
        for name, row in rec.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
                and row.get("err") is None
            )
            if green:
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def test_rotation_policy_is_enforced_not_just_commented():
    """Executable rotation lock (r11 verdict item 7):

    (a) every registry query that has NEVER had a driver-green row must
        be in the pinned window (rule 1 of the rotation policy — new or
        never-verified queries lead);
    (b) the STALEST green block — every name whose newest-green round
        equals the minimum over the whole registry — must be in the
        window (rule 3), unless that block alone exceeds the window.

    Changed-this-round names (rule 2) cannot be derived from the
    records, so the lock checks necessary conditions, not the full
    ordering; it would still have caught every historical staleness
    regression (a window re-pinning that forgot the r7 leftovers or a
    never-gated new query).
    """
    registry = set(all_queries())
    newest = _newest_green_by_name()
    if not newest:  # fresh checkout without driver records: nothing to lock
        return

    never_green = registry - set(newest)
    missing_new = never_green - set(_FRONT_WINDOW)
    assert not missing_new, (
        f"queries never driver-verified are outside the gate window: "
        f"{sorted(missing_new)} — rule 1 of the rotation policy puts them first"
    )

    greens = {n: r for n, r in newest.items() if n in registry}
    stalest_round = min(greens.values())
    stalest_block = {n for n, r in greens.items() if r == stalest_round}
    if len(stalest_block) + len(never_green) <= len(_FRONT_WINDOW):
        missing_stale = stalest_block - set(_FRONT_WINDOW)
        assert not missing_stale, (
            f"stalest names (newest green = r{stalest_round}) left outside "
            f"the gate window: {sorted(missing_stale)} — rotate them in"
        )


def test_window_names_all_registered():
    registry = set(all_queries())
    unknown = [n for n in _FRONT_WINDOW if n not in registry]
    assert not unknown, f"window pins unregistered names: {unknown}"
