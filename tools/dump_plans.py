"""Regenerate PLANS.md: formatted physical plans for the headline
queries at sf0.01. Run: python tools/dump_plans.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from composable_logs_spark.queries import all_queries  # noqa: E402
from composable_logs_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_top3_parts_per_supplier",
    "dedup_minhash_lsh",
    "ann_cosine_top5",
    "text_token_stats",
    "funnel_conversion",
    "asof_join_purchase_click",
    "pagerank_purchase_graph",
    "bloom_pruned_urgent_revenue",
    "outlier_mad_events",
    "corpus_line_dedup",
    "ann_pq_adc",
    "hll_distinct_customers",
    # round-6 plan rewrites — snapshots prove the single-reducer windows
    # are gone (TakeOrderedAndProject / partitioned windows / moment agg)
    "q10_returned_items",
    "pack_sequences",
    "vocab_coverage_topk",
    "embedding_pca_top1",
    "approx_sketch_stats",
    # round-6 new operators — frequent pairs (TakeOrderedAndProject),
    # triangle orientation joins, fuzzy blocking join, profiler
    # single-scan stack+agg, skyline bin-prune/refine, reservoir top-k
    "frequent_item_pairs",
    "triangle_count_copurchase",
    "fuzzy_match_partnames",
    "table_profile_lineitem",
    "skyline_parts",
    "weighted_reservoir_topk",
    "mv_incremental_merge",
    "bpe_encode_stats",
    "dedup_jaccard_prefix",
    "forecast_linear_events",
    "seasonal_anomaly_events",
    "hll_intersection_parts",
    "session_path_topk",
    "copurchase_pmi_topk",
    "cheapest_path_copurchase",
    "fk_integrity_audit",
    "hll_cumulative_users",
    # round-7 new operators — exact substring dedup (freq equi-join +
    # shared-Exchange doc windows), cut governance stats, multi-probe
    # IVF (broadcast probe set), OOV BPE encode (K chained replaces,
    # zero shuffle after the distinct-words agg)
    "dedup_exact_substring",
    "substr_cut_stats",
    "ann_ivf_multiprobe",
    "bpe_encode_oov",
    "text_bigram_logprob",
    "dsir_select_topk",
    "ann_ivfpq_adc",
    "substr_winnow_stats",
    # round-8 new operators — SemDeDup (cell-bounded pair join), BM25
    # (broadcast queries/idf onto postings, salted two-phase top-k),
    # residual IVF-PQ (per-cell codebooks, candidate-first ADC),
    # Gopher rules (narrow per-doc expressions, no Exchange)
    "dedup_semantic",
    "text_bm25_topk",
    "ann_ivfpq_residual",
    "text_gopher_filters",
    "dedup_minhash_bandsweep",
    "substr_cut_docs",
    "cluster_docs_hashed_tf",
    # round-9 new operators — image aHash (mapInPandas signature +
    # band equi-join), learned quality classifier (broadcast B-row
    # weight table), DoReMi quotas (K-row broadcast self-join), CCNet
    # recipe (six-stage composition), SemDeDup K=16, IVF-PQ exact
    # re-rank (constant-size refinement join), audio fingerprint
    # (narrow map end to end), multiclass NB lang-ID
    "media_phash_neardup",
    "text_quality_classifier",
    "domain_reweight_doremi",
    "pipeline_ccnet_recipe",
    "dedup_semantic_k16",
    "ann_ivfpq_rerank",
    "media_audio_fingerprint",
    "text_lang_classifier",
    # round-9 third session — bitext margin mining (band equi-join
    # candidates, per-side top-K windows), z-order layout (single
    # groupBy over a codegen'd Morton expression), sync LPA (per-round
    # join + windowed argmax), Fellegi-Sunter (nation-blocked scoring),
    # time-decay attribution (user-keyed range join), temperature
    # mixing (broadcast totals, md5-ordered sampler)
    "mine_bitext_margin",
    "zorder_layout_lineitem",
    "community_label_propagation",
    "er_fellegi_sunter",
    "attribution_time_decay",
    "mix_temperature_sample",
    # perplexity terciles (r10: two-pass histogram rank-cuts — the only
    # window runs over per-(lang, score) histogram rows), CDC apply
    # (one keyed window over the changelog + one full-outer merge join)
    "perplexity_buckets",
    "cdc_apply_changes",
    # calibration (broadcast weight join + 11-key hash agg), phrase
    # search (positional postings, shrinking (doc,pos) equi-joins)
    "classifier_calibration",
    "text_phrase_search",
    "classifier_group_auc",
    # round-10 — two-pass perplexity (histogram cumsum window, no doc
    # sort), rarest-word phrase seeding (3-row broadcast seed table),
    # full PII scrub (narrow map, no Exchange), trigram backoff LM
    # (three count-table equi-joins), PR curve (histogram x broadcast
    # grid, no window), UniMax (K-row broadcast water-filling)
    "pii_scrub_documents",
    "trigram_logprob",
    "classifier_pr_curve",
    "mix_unimax_sample",
    # round-11 — UniMax draw (lang-partitioned md5 row_number + broadcast
    # quota join), audio near-dup (mapInPandas fingerprints + 4x15-bit
    # band equi-join over the packed 61-bit two-word signature,
    # pigeonhole-exact recall at Hamming <= 3; 4x8-bit keys were the
    # measured r11 saturation failure and were replaced)
    "mix_unimax_draw",
    "media_audio_neardup",
    # wide 256-bit aHash (8x32-bit band keys — the measured image
    # band-saturation remedy; same band-then-verify plan, 2^32 keys)
    "media_phash_neardup_wide",
    # round-12 — sketch calibration (one cached minhash pass feeds the
    # band equi-join AND the per-pair estimator compare; exact integer
    # micro-unit aggregation, decile-grain output)
    "dedup_minhash_est_error",
    # round-12 continued — pointer-doubling CC (shuffle_hash-hinted
    # label joins, NEVER a driver broadcast of the node-sized table),
    # RRF hybrid (two salted top-k branches + full-outer fusion on
    # integer micro-units), scene cut (pure per-row array math — no
    # explode, no window, no Exchange before the final shuffle-free
    # project), Matryoshka prefix retrieval (one scan scoring both
    # representations, cached signature rows), Kneser-Ney bigram (three
    # count-table equi-joins + broadcast 3-scalar row — the trigram plan
    # one rung down)
    "components_chain_doubling",
    "retrieval_rrf_hybrid",
    "media_scene_cut",
    "ann_matryoshka_prefix",
    "text_kneser_ney_bigram",
    # video temporal near-dup: profile-keyed candidates + exact verify,
    # fingerprints from one shuffle-free per-row pass
    "media_video_neardup",
]


def main() -> None:
    spark = get_spark("plans", cpus=8, shuffle_partitions=8)
    qs = all_queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    out = [
        "# Physical plans (auto-generated by tools/dump_plans.py, sf0.01)",
        "",
        "What to look for: `BroadcastHashJoin` on dimension joins,",
        "`PushedFilters`/`ReadSchema` pruning at every parquet scan, no",
        "`CartesianProduct` anywhere (also asserted in",
        "tests/test_plan_audit.py), and narrow text ops with no Exchange.",
        "",
    ]
    # a multi-stage composition's formatted plan can run to megabytes
    # (pipeline_ccnet_recipe: ~4 MB); keep the operator TREE (the part
    # a reviewer reads for join strategies / exchanges) and truncate
    # the per-node detail section once the snapshot passes the cap —
    # the audited properties are asserted in tests/test_plan_audit.py
    # regardless.
    cap = 500
    for name in HEADLINE:
        df = qs[name].fn(spark, SF)
        plan = df._jdf.queryExecution().explainString(mode).strip()
        lines = plan.splitlines()
        if len(lines) > cap:
            plan = "\n".join(lines[:cap]) + (
                f"\n... [plan truncated at {cap} of {len(lines)} lines;"
                " no CartesianProduct / partition-less Window by"
                " tests/test_plan_audit.py]"
            )
        out.append(f"## {name}\n\n```\n{plan}\n```\n")
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINE)} plans)")


if __name__ == "__main__":
    main()
