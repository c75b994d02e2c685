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
# (3) fill with the longest-unverified green block. Round 10 window:
# the 2 queries ADDED this round (full PII scrub over documents --
# sequential typed-category masking, deliberately NOT one big
# alternation; trigram stupid-backoff LM — never driver-checked), the 3
# whose Spark plan or semantics changed this round (perplexity_buckets:
# two-pass histogram rank-cuts replaced the per-language doc-sort
# window, oracle byte-identical; text_phrase_search: rarest-word
# seeding + explicit short-query-doc exclusion, oracle gained the
# len(arr) filter; mix_temperature_sample: left join + coalesce so
# zero-quota languages appear, oracle changed to match — docstring-only
# edits, e.g. calibration_q/bitext_q, are NOT counted as changed), then
# the complete 42-name r6-stale block (newest driver-green row = round
# 6, per the CORRECTNESS_r01..r09 histogram: 42/45/46/50 for r6/7/8/9),
# moving the staleness floor to r7, and the 3 stalest-r7 names in name
# order as filler. A later session of this round added a 3rd and 4th
# new query (classifier PR curve, UniMax language sampling); per rule
# (1) they join the new block, displacing the last two filler names
# (agg_grouping_sets and agg_distinct_parts_per_nation stay r7-green
# and rotate in next round).
_FRONT_WINDOW = [
    # (1) new this round
    "pii_scrub_documents", "trigram_logprob", "classifier_pr_curve",
    "mix_unimax_sample",
    # (2) changed this round
    "perplexity_buckets", "text_phrase_search", "mix_temperature_sample",
    # (3a) the complete r6-stale block, name order — floor moves to r7
    "asof_join_nearest", "bfs_purchase_distance",
    "cheapest_path_copurchase", "chunk_overlap_windows",
    "cms_heavy_hitters", "copurchase_pmi_topk", "corpus_line_dedup",
    "crossdoc_ngram_overlap", "dedup_embedding_cosine",
    "dedup_jaccard_prefix", "dedup_ngram_jaccard", "domain_cap_sample",
    "drift_psi_events", "embedding_int8_quant", "embedding_pca_top1",
    "fk_integrity_audit", "forecast_linear_events",
    "frequent_item_pairs", "fuzzy_entity_clusters",
    "fuzzy_match_partnames", "hll_cumulative_users",
    "hll_distinct_customers", "hll_intersection_parts",
    "hll_users_by_event_type", "join_salted_skew_revenue",
    "mix_sources_to_target", "outlier_mad_events", "pack_sequences",
    "pivot_event_cohorts", "q10_returned_items", "q12_priority_lines",
    "seasonal_anomaly_events", "skyline_parts",
    "spanlog_failure_root_cause", "split_no_leakage",
    "table_profile_lineitem", "text_bpe_pretokens",
    "text_unigram_logprob", "triangle_count_copurchase",
    "vocab_coverage_topk", "weighted_reservoir_topk",
    "winsorize_doc_lengths",
    # (3b) stalest-green filler (r7), name order
    "agg_cube_events",
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
