"""The driver's correctness gate checks the FIRST 50 entries of the
query registry, so the front window is a verification surface in its own
right. ``all_queries`` pins it explicitly by name; this test asserts the
pin so an innocent module reorder can't silently change which queries
the driver hash-checks.

Round-9 window (see ``_FRONT_WINDOW``): the 24 queries ADDED this round
(image aHash/dHash near-dup, quality classifier + its AUC, DoReMi
reweighting, CCNet recipe, SemDeDup K=16, IVF-PQ re-rank, audio
fingerprint, language classifier, norm-pruned MIPS, SCD2 history,
hard-negative mining, bitext margin mining, z-order layout stats,
label-propagation communities, Fellegi-Sunter linkage, time-decay
attribution, temperature-scaled mixing, CCNet perplexity terciles,
CDC apply-changes, classifier calibration, positional phrase
search, worst-group AUC), the queries whose scoring
expression or cache lifecycle changed this round, then the 20
remaining r5-stale queries — completing the rotation so every registry
name has a driver row from round-6-or-later code — and the
stalest-green (r6) filler block.
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
        "media_phash_neardup", "text_quality_classifier",
        "domain_reweight_doremi", "pipeline_ccnet_recipe",
        "dedup_semantic_k16", "ann_ivfpq_rerank",
        "media_audio_fingerprint", "text_lang_classifier",
        "media_dhash_neardup", "text_classifier_auc",
        "ann_mips_norm_prune", "scd2_user_history",
        "embedding_hard_negatives",
        "mine_bitext_margin", "zorder_layout_lineitem",
        "community_label_propagation", "er_fellegi_sunter",
        "attribution_time_decay", "mix_temperature_sample",
        "perplexity_buckets", "cdc_apply_changes",
        "classifier_calibration", "text_phrase_search",
        "classifier_group_auc",
    }
    assert never_checked <= set(_FRONT_WINDOW[: len(never_checked)])
