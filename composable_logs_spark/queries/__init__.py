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
# (3) fill with the longest-unverified green block. Round 11 window:
# the 2 queries ADDED this round (UniMax draw stage — the md5-ordered
# deterministic draw to quota; audio fingerprint near-dup — banded
# Hamming pairs over WAV energy-delta fingerprints), the 6 whose
# semantics or oracle changed this round (pipeline_ccnet_recipe: the
# stage-3 LM gate is now the trigram stupid-backoff model behind a
# per-language tercile rank-cut; trigram_logprob: zero-length tokens
# filtered from the unigram table + SQL rebuilt on the parameterised
# builders; mine_bitext_margin / dedup_srp_lsh / dedup_embedding_cosine:
# plane dots quantized to micro-units before the SRP sign test on both
# engines; mix_unimax_sample: oracle restructured over the shared
# quota SQL — docstring-only edits, e.g. perplexity_q/phrase_q, are NOT
# counted as changed), then the r7-stale block in name order (newest
# driver-green row = round 7, per the CORRECTNESS_r01..r10 histogram:
# 44/46/47/50 for r7/8/9/10). A later session of this round added a
# 3rd new query (wide 256-bit aHash image near-dup, the measured
# band-saturation remedy); per rule (1) it joins the new block,
# displacing the last filler name — so the last three r7 names in name
# order (text_bigram_logprob, text_c4_filters, text_char_entropy) stay
# r7-green and rotate next round; the staleness floor moves to those
# three names.
_FRONT_WINDOW = [
    # (1) new this round
    "mix_unimax_draw", "media_audio_neardup", "media_phash_neardup_wide",
    # (2) changed this round
    "pipeline_ccnet_recipe", "trigram_logprob", "mine_bitext_margin",
    "dedup_srp_lsh", "dedup_embedding_cosine", "mix_unimax_sample",
    # (3) the r7-stale block, name order (first 42 of 44)
    "agg_distinct_parts_per_nation", "agg_grouping_sets",
    "agg_rollup_returns", "ann_cosine_top5", "ann_ivf_kmeans",
    "ann_ivf_label_probe", "ann_ivf_multiprobe", "ann_ivfpq_adc",
    "approx_sketch_stats", "bpe_encode_oov", "bpe_encode_stats",
    "bpe_train_merges", "cusum_changepoint_events", "dedup_exact",
    "dedup_minhash_lsh", "dedup_simhash", "embedding_centroids",
    "join_anti_idle_customers", "join_semi_heavy_orders",
    "json_extract_events", "mv_incremental_merge", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier_volume",
    "range_join_error_attribution", "scalar_functions_orders",
    "session_path_topk", "sessionize_user_events", "set_ops_segments",
    "spanlog_artifacts", "spanlog_attr_union", "spanlog_deps",
    "spanlog_descendant_counts", "spanlog_exceptions",
    "spanlog_last_value_wins", "spanlog_logged_values", "spanlog_roots",
    "spanlog_task_runs", "spanlog_task_trends",
    "spanlog_validation_errors", "spanlog_workflow_runs",
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
    ):
        out.update(mod.QUERIES)
    missing = [n for n in _FRONT_WINDOW if n not in out]
    assert not missing, f"front-window names not registered: {missing}"
    ordered = {n: out[n] for n in _FRONT_WINDOW}
    ordered.update((n, s) for n, s in out.items() if n not in ordered)
    return ordered
