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


_SESSION_CONF_DONE: set[str] = set()


def _ensure_session_conf(spark: SparkSession) -> None:
    """Pin the two confs every query assumes — ONCE per session, never
    per call (r11 verdict: a per-call conf.set could silently change a
    concurrent TZ-sensitive query's semantics mid-flight).

    - UTC session timezone: events.ts becomes a session-TZ-sensitive
      TimestampType after the nanos conversion, and date_format output
      must match the TZ-naive oracle.
    - parquet nanosAsLong: TIMESTAMP(NANOS) columns are unreadable
      without the legacy flag; setting it up-front is free (it only
      affects nanos columns) and avoids a deliberately-failed probe job.

    Sessions built by ``session.get_spark`` already carry both, so this
    is a pure check for them; a FOREIGN session (the driver's harness
    builds its own) gets them set once at first use — the driver
    contract hands us the session, so asserting instead of setting
    would fail every query on a default-built session.
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _SESSION_CONF_DONE:
        return
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _SESSION_CONF_DONE.add(app_id)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one testdata table.

    events.parquet stores TIMESTAMP(NANOS) which Spark only reads as a
    long with the legacy flag; normalise to a proper TimestampType (µs)
    here so every query sees the same schema regardless of how the
    driver built the session.
    """
    path = f"{sf_dir}/{table}.parquet"
    _ensure_session_conf(spark)
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
# name (tests/test_registry_window.py guards it — including an executable
# rotation-policy lock computed from the committed CORRECTNESS_r*.json
# records). Rotation policy per round: (1) every query that has never had
# a driver hash-green row, (2) every query whose semantics or oracle
# changed this round, (3) fill with the longest-unverified green block in
# name order. Round 13 window: rule (1) seats the queries NEW this round
# as they land (inserted at the head, displacing rule-3 fillers from the
# tail); rule (2) seats the queries whose plans changed under the r12
# ADVICE fixes (media_scene_cut + media_video_neardup: true byte sums
# instead of the lossy UTF-8 codepoint sum; ann_matryoshka_prefix:
# zero-prefix-norm guard mirrored in the oracle; retrieval_rrf_hybrid +
# text_bm25_topk: corpus-derived qterms no longer force-broadcast;
# components_chain_doubling: non-convergence now raises); rule (3) then
# rotates the 6 r8-stale names the r12 window displaced, and fills the
# remaining seats from the 45-name r9-stale block in name order — the
# r9 names that don't fit (q2_min_cost_supplier, q4_late_order_priority,
# q6_forecast_revenue, q7_nation_volume, q9_product_profit,
# retention_cohorts, sample_quality_weighted, sample_stratified_hash,
# scd2_user_history onward) rotate in r14.
_FRONT_WINDOW = [
    # (1) new this round — inserted at the head as each lands, displacing
    # r9 fillers from the tail (they rotate in r14 with the rest)
    "events_conformal_audit",
    "events_bootstrap_ci",
    "ts_holt_winters",
    "text_chi2_feature_select",
    "text_kneser_ney_trigram",
    "cluster_docs_minibatch",
    "media_keyframe_spatial_neardup",
    "dedup_containment",
    "graph_adamic_adar",
    "text_heaps_law",
    "anonymity_k_audit",
    "graph_kcore",
    "ts_holt_linear",
    # (2) implementation changed this round (r12 ADVICE fixes)
    "media_scene_cut", "media_video_neardup", "ann_matryoshka_prefix",
    "retrieval_rrf_hybrid", "text_bm25_topk", "components_chain_doubling",
    # (3a) the r8-stale block the r12 window displaced (promised rotation)
    "text_vocab_topk", "unpivot_part_metrics", "window_ntile_customers",
    "window_order_gaps", "window_rolling_week_spend",
    "window_running_customer_spend",
    # (3b) fill from the r9-stale block, name order; the remainder
    # (retention_cohorts onward) rotates in r14
    "ann_ivf_recall", "ann_ivfpq_rerank", "ann_ivfpq_residual",
    "ann_mips_norm_prune", "ann_pq_adc", "attribution_time_decay",
    "cdc_apply_changes", "classifier_calibration", "classifier_group_auc",
    "community_label_propagation", "dedup_minhash_bandsweep",
    "dedup_semantic", "dedup_semantic_k16", "domain_reweight_doremi",
    "embedding_hard_negatives", "er_fellegi_sunter",
    "media_audio_fingerprint", "media_dhash_neardup", "media_phash_neardup",
    "q17_small_qty_revenue", "q18_large_volume_customers",
    "q19_bracket_revenue", "q20_potential_promotion",
    "q21_waiting_suppliers", "q22_idle_rich_customers",
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
        pr_curve_q,
        unimax_q,
        components_q,
        rrf_q,
        matryoshka_q,
        kn_q,
        media_keyframe_q,
        containment_q,
        linkpred_q,
        heaps_q,
        anonymity_q,
        kcore_q,
        holt_q,
        chi2_q,
        holt_winters_q,
        bootstrap_q,
        conformal_q,
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
        pr_curve_q,
        unimax_q,
        components_q,
        rrf_q,
        matryoshka_q,
        kn_q,
        media_keyframe_q,
        containment_q,
        linkpred_q,
        heaps_q,
        anonymity_q,
        kcore_q,
        holt_q,
        chi2_q,
        holt_winters_q,
        bootstrap_q,
        conformal_q,
    ):
        out.update(mod.QUERIES)
    missing = [n for n in _FRONT_WINDOW if n not in out]
    assert not missing, f"front-window names not registered: {missing}"
    ordered = {n: out[n] for n in _FRONT_WINDOW}
    ordered.update((n, s) for n, s in out.items() if n not in ordered)
    return ordered
