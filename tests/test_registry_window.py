"""The driver's correctness gate checks the FIRST 50 entries of the
query registry, so the front window is a verification surface in its own
right. ``all_queries`` pins it explicitly by name; this test asserts the
pin so an innocent module reorder can't silently change which queries
the driver hash-checks.

Round-10 window (see ``_FRONT_WINDOW``): the 4 queries ADDED this round
(full PII scrub over documents, trigram stupid-backoff LM, classifier
PR curve, UniMax language sampling), the 3 whose
plan or semantics changed this round (two-pass perplexity rank-cuts,
rarest-word phrase seeding, left-join temperature mix), then the
complete 42-name round-6-stale block — moving the gate staleness floor
to round 7 — and the single stalest round-7 name (agg_cube_events) as
filler; agg_distinct_parts_per_nation and agg_grouping_sets were
displaced by the 3rd/4th new queries, stay r7-green, and rotate in
next round.
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
        "pii_scrub_documents", "trigram_logprob", "classifier_pr_curve",
        "mix_unimax_sample",
    }
    changed = {
        "perplexity_buckets", "text_phrase_search", "mix_temperature_sample",
    }
    head = set(_FRONT_WINDOW[: len(never_checked) + len(changed)])
    assert never_checked | changed == head
