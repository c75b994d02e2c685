"""The engine's query surface, as (spark_fn, oracle_sql) pairs.

Each entry is one operator/query from SURVEY.md §2 (or a north-star
scale operator) expressed twice:

- a PySpark DataFrame program ``(spark, sf_dir) -> DataFrame``
- an equivalent ANSI-SQL string DuckDB can run over the same parquet
  views (or a VALUES-literal golden result for span-log queries whose
  fixtures are deterministic) — the driver hash-compares the two.

Column names and types are aligned on both sides; aggregates are rounded
(sums to 2dp, averages/ratios to 4dp) so double arithmetic-order
differences between engines can't flip the hash.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None => non-SQL-expressible, rows-only check


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one testdata table.

    events.parquet stores TIMESTAMP(NANOS) which Spark only reads as a
    long with the legacy flag; normalise to a proper TimestampType (µs)
    here so every query sees the same schema regardless of how the
    driver built the session.
    """
    path = f"{sf_dir}/{table}.parquet"
    # pin UTC regardless of how the caller built the session: events.ts
    # becomes a session-TZ-sensitive TimestampType after the nanos
    # conversion, and date_format output must match the TZ-naive oracle
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    # TIMESTAMP(NANOS) parquet columns are unreadable without the legacy
    # flag; setting it up-front is free (it only affects nanos columns)
    # and avoids paying a deliberately-failed Spark job to probe for them.
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F, types as T

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            # integer division: epoch-nanos exceed double's 2^53 exact
            # range, so `/ 1000` (double) could be off by 1 µs vs DuckDB
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


# Registry order is a VERIFICATION SURFACE: the driver's correctness gate
# checks the first 50 entries, so the front window is pinned EXPLICITLY by
# name (tests/test_registry_window.py guards it). Rotation policy per
# round: (1) every query that has never had a driver hash-green row,
# (2) every query whose semantics or oracle changed this round,
# (3) fill with the longest-unverified green block. Round 9 window:
# the 8 queries ADDED this round (image aHash near-dup, fastText-shape
# quality classifier, DoReMi domain reweighting, CCNet six-stage
# recipe, SemDeDup K=16 operating point, IVF-PQ exact re-rank, WAV
# audio fingerprint, multiclass NB language classifier — never
# driver-checked), the 4 whose scoring expression or cache lifecycle
# changed this round (text_bm25_topk: overflow guard in the contrib
# expression; dedup_semantic: id-collision guard; dedup_minhash_
# bandsweep: signature-cache release; ann_ivfpq_residual: pair stage
# extracted into the helper the re-rank shares — pure-refactor queries
# whose oracle SQL is byte-identical, e.g. the text_ops frame-core
# split, are NOT counted as changed; verified by string equality
# against the prior tree), then the 20 remaining r5-stale queries —
# COMPLETING the rotation policy: after this round every registry name
# has a driver row from round-6-or-later code — and the 13 stalest-
# green (r6) queries in name order as filler. The second session of
# this round added 5 more never-checked queries (dHash image near-dup,
# classifier AUC, norm-pruned MIPS, SCD2 history, hard-negative
# mining); per rule (1) they join the new block, displacing the last
# 5 filler names (which stay r6-green and rotate in next round). The
# third session added 6 more never-checked queries (bitext margin
# mining, z-order layout stats, label-propagation communities,
# Fellegi-Sunter linkage, time-decay attribution, temperature-scaled
# mixing, then CCNet perplexity terciles, CDC apply-changes,
# classifier calibration bins, positional phrase search, and
# worst-group AUC); same rule, displacing 11 more filler names —
# 2 filler remain.
_FRONT_WINDOW = [
    # (1) new this round
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
    # (2) changed this round
    "text_bm25_topk", "dedup_semantic", "dedup_minhash_bandsweep",
    "ann_ivfpq_residual",
    # (3a) the final r5-stale block, name order — completes the policy
    "q17_small_qty_revenue", "q18_large_volume_customers",
    "q19_bracket_revenue", "q20_potential_promotion",
    "q21_waiting_suppliers", "q22_idle_rich_customers",
    "q2_min_cost_supplier", "q4_late_order_priority",
    "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
    "q9_product_profit", "retention_cohorts", "sample_quality_weighted",
    "sample_stratified_hash", "session_window_stats",
    "stream_dedup_events", "stream_sliding_counts",
    "stream_tumbling_counts", "time_weighted_avg",
    # (3b) stalest-green filler (r6), name order
    "ann_ivf_recall", "ann_pq_adc",
]


def all_queries() -> dict[str, QuerySpec]:
    from . import (
        tpch_full,
        asof_q,
        session_q,
        pipeline_q,
        graph_q,
        stats_q,
        bloom_q,
        multimodal_q,
        streaming_q,
        sketch_q,
        srp_lsh_q,
        tpch_extra,
        cluster_q,
        dedup_q,
        relational,
        text_ops,
        similarity_q,
        span_q,
        span_ops_q,
        corpus_q,
        hll_q,
        asof_extra_q,
        mix_q,
        basket_q,
        fuzzy_q,
        bpe_q,
        profile_q,
        mv_q,
        seasonal_q,
        audit_q,
        drift_q,
        substr_q,
        dsir_q,
        semdedup_q,
        bm25_q,
        cluster_docs_q,
        media_dedup_q,
        text_classifier_q,
        doremi_q,
        ccnet_q,
        media_audio_q,
        lang_classifier_q,
        text_auc_q,
        mips_q,
        scd_q,
        hardneg_q,
        bitext_q,
        layout_q,
        lpa_q,
        fs_linkage_q,
        attribution_q,
        perplexity_q,
        cdc_q,
        calibration_q,
        phrase_q,
        group_auc_q,
        trigram_q,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (
        tpch_full,
        asof_q,
        session_q,
        pipeline_q,
        graph_q,
        stats_q,
        bloom_q,
        multimodal_q,
        streaming_q,
        sketch_q,
        srp_lsh_q,
        tpch_extra,
        cluster_q,
        dedup_q,
        relational,
        text_ops,
        similarity_q,
        span_q,
        span_ops_q,
        corpus_q,
        hll_q,
        asof_extra_q,
        mix_q,
        basket_q,
        fuzzy_q,
        bpe_q,
        profile_q,
        mv_q,
        seasonal_q,
        audit_q,
        drift_q,
        substr_q,
        dsir_q,
        semdedup_q,
        bm25_q,
        cluster_docs_q,
        media_dedup_q,
        text_classifier_q,
        doremi_q,
        ccnet_q,
        media_audio_q,
        lang_classifier_q,
        text_auc_q,
        mips_q,
        scd_q,
        hardneg_q,
        bitext_q,
        layout_q,
        lpa_q,
        fs_linkage_q,
        attribution_q,
        perplexity_q,
        cdc_q,
        calibration_q,
        phrase_q,
        group_auc_q,
        trigram_q,
    ):
        out.update(mod.QUERIES)
    missing = [n for n in _FRONT_WINDOW if n not in out]
    assert not missing, f"front-window names not registered: {missing}"
    ordered = {n: out[n] for n in _FRONT_WINDOW}
    ordered.update((n, s) for n, s in out.items() if n not in ordered)
    return ordered
