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
# name order. Round 12 window: no queries added; the 6 whose
# implementation changed this round (pipeline_ccnet_recipe: stage passes
# share one tokenized materialization; the substr family: the gram pass
# now runs over a single cached token-array frame instead of re-splitting
# text per consumer — values proven unchanged at 3 SFs, listed under rule
# (2) because the executed plan changed), then the 3 r7-stale names the
# r11 window comment promised to rotate (text_bigram_logprob,
# text_c4_filters, text_char_entropy), then the full 45-name r8-stale
# block in name order (5 of which are the substr family already listed
# under rule 2). Rule (1) adds the one query NEW this round
# (dedup_minhash_est_error, the sketch-calibration query), which takes
# the seat the draft window gave to an r9 filler (ann_ivf_recall — still
# this round's 64x-recall measurement target, just not gate-rotated).
# After this round the newest-green floor moves to r9. Late-round
# additions (rule 1, never-green): components_chain_doubling,
# retrieval_rrf_hybrid, media_scene_cut, ann_matryoshka_prefix and
# text_kneser_ney_bigram and media_video_neardup take six seats,
# displacing six r8-stale names (window_rolling_week_spend,
# window_running_customer_spend, window_ntile_customers,
# window_order_gaps, unpivot_part_metrics, text_vocab_topk — they
# rotate in r13 with the rest of the r8 remainder; their machinery
# stays pytest-covered meanwhile).
_FRONT_WINDOW = [
    # (1) new this round: MinHash estimated-vs-exact Jaccard calibration,
    # pointer-doubling chain components, RRF hybrid retrieval
    "dedup_minhash_est_error",
    "components_chain_doubling",
    "retrieval_rrf_hybrid",
    "media_scene_cut",
    "ann_matryoshka_prefix",
    "text_kneser_ney_bigram",
    "media_video_neardup",
    # (2) implementation changed this round (perf refactor, values
    # unchanged): the ccnet recipe + the substr family
    "pipeline_ccnet_recipe",
    "dedup_exact_substring", "pipeline_dedup_then_cut",
    "substr_cut_docs", "substr_cut_stats", "substr_winnow_stats",
    # (3a) the r7-stale leftover block (promised rotation)
    "text_bigram_logprob", "text_c4_filters", "text_char_entropy",
    # (3b) the r8-stale block, name order (minus the substr family above)
    "agg_percentiles_events", "asof_join_purchase_click",
    "asof_join_with_tolerance", "bloom_pruned_urgent_revenue",
    "cluster_docs_hashed_tf", "decontaminate_against_benchmark",
    "dedup_chunks", "dedup_cluster_assign", "dedup_corpus_keep",
    "dq_check_customers", "dsir_select_topk", "event_transitions",
    "events_rate_anomaly", "funnel_conversion", "gapfill_hourly_locf",
    "media_byte_histogram", "media_checksums", "media_frame_sample",
    "pagerank_purchase_graph", "pii_scrub_customers",
    "pipeline_clean_corpus", "q11_important_stock",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_part_counts", "text_fingerprint", "text_gopher_filters",
    "text_lang_id", "text_quality_scores", "text_repetition",
    "text_tfidf_top3", "text_token_stats",
    "window_top3_parts_per_supplier",
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
    ):
        out.update(mod.QUERIES)
    missing = [n for n in _FRONT_WINDOW if n not in out]
    assert not missing, f"front-window names not registered: {missing}"
    ordered = {n: out[n] for n in _FRONT_WINDOW}
    ordered.update((n, s) for n, s in out.items() if n not in ordered)
    return ordered
