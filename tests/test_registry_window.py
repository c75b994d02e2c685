"""The driver's correctness gate checks the FIRST 50 entries of the
query registry, so the front window is a verification surface in its own
right. ``all_queries`` pins it explicitly by name; this test asserts the
pin so an innocent module reorder can't silently change which queries
the driver hash-checks.

Round-11 window (see ``_FRONT_WINDOW``): the 3 queries ADDED this round
(UniMax draw stage, audio fingerprint near-dup, wide 256-bit aHash
image near-dup — the measured band-saturation remedy), the 6 whose
semantics or oracle changed this round (CCNet recipe trigram tercile
gate, trigram empty-token fix, the three SRP-banded queries' quantized
sign test, UniMax sample's restructured oracle), then 41 of the
44-name round-7-stale block in name order — text_bigram_logprob,
text_c4_filters and text_char_entropy are the three leftover r7 names
and rotate next round.
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
        "mix_unimax_draw", "media_audio_neardup", "media_phash_neardup_wide",
    }
    changed = {
        "pipeline_ccnet_recipe", "trigram_logprob", "mine_bitext_margin",
        "dedup_srp_lsh", "dedup_embedding_cosine", "mix_unimax_sample",
    }
    head = set(_FRONT_WINDOW[: len(never_checked) + len(changed)])
    assert never_checked | changed == head
