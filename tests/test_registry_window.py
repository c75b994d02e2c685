"""The driver's correctness gate checks the FIRST 50 entries of the
query registry, so the front window is a verification surface in its own
right. ``all_queries`` pins it explicitly by name; this test asserts the
pin so an innocent module reorder can't silently change which queries
the driver hash-checks.

Round-6 window (see ``_FRONT_WINDOW``): the 17 queries that had never
had a driver hash-green row (including the three round-5 HUGEINT reds),
approx_sketch_stats (oracle added this round), q10_returned_items and
embedding_pca_top1 (plan rewrites this round), all 13 queries ADDED
this round (mix_q, chunk_overlap_windows, basket_q, fuzzy_q, bpe_q,
profile_q, mv_q — none has ever been driver-checked), filled to 50
with the longest-unverified r3/r4 greens.
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
        "q12_priority_lines", "outlier_mad_events", "winsorize_doc_lengths",
        "pack_sequences", "join_salted_skew_revenue", "text_unigram_logprob",
        "text_bpe_pretokens", "ann_pq_adc", "embedding_int8_quant",
        "spanlog_failure_root_cause", "corpus_line_dedup", "split_no_leakage",
        "vocab_coverage_topk", "hll_distinct_customers", "cms_heavy_hitters",
        "hll_users_by_event_type", "asof_join_nearest",
    }
    assert never_checked <= set(_FRONT_WINDOW[: len(never_checked) + 5])
