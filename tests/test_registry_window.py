"""The driver's correctness gate checks the FIRST 50 entries of the
query registry, so the front window is a verification surface in its own
right. ``all_queries`` pins it explicitly by name; this test asserts the
pin so an innocent module reorder can't silently change which queries
the driver hash-checks.

Round-8 window (see ``_FRONT_WINDOW``): the queries ADDED this round
(SemDeDup, BM25, residual IVF-PQ), the queries whose code or oracle
changed this round (the substring family's new polynomial gram hash),
then the 13 queries whose last driver-green row is round 4 — the
final stale block, completing the rotation so every registry name has
a driver row from round-5-or-later code — and the stalest-green
filler block.
"""

from composable_logs_spark.queries import _FRONT_WINDOW, all_queries


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


def test_never_driver_checked_queries_lead_the_window():
    never_checked = {
        "dedup_semantic", "text_bm25_topk", "ann_ivfpq_residual",
        "text_gopher_filters", "dedup_minhash_bandsweep",
        "substr_cut_docs", "cluster_docs_hashed_tf",
    }
    assert never_checked <= set(_FRONT_WINDOW[: len(never_checked)])
