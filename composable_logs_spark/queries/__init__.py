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
# (3) fill with the longest-unverified green block. Round 8 window:
# the 7 queries ADDED this round (SemDeDup, BM25, residual IVF-PQ,
# Gopher rules, LSH band sweep, hash-proven substring cut, hashed-BoW
# document clustering — never driver-checked), the 5 whose code or
# oracle changed this round
# (the 4 substring-family queries: new per-token polynomial gram
# hash on both engines; dsir_select_topk: cache lifecycle), then the
# 13 remaining queries whose last driver-green row is round 4 —
# completing the r4-stale rotation, so after this round every
# registry name has a driver row from round-5-or-later code — and 25
# of the 45 next-stalest (r5) queries in name order (20 rotate in
# next round).
_FRONT_WINDOW = [
    # (1) new this round
    "dedup_semantic", "text_bm25_topk", "ann_ivfpq_residual",
    "text_gopher_filters", "dedup_minhash_bandsweep", "substr_cut_docs",
    "cluster_docs_hashed_tf",
    # (2) changed this round
    "dedup_exact_substring", "substr_cut_stats", "substr_winnow_stats",
    "pipeline_dedup_then_cut", "dsir_select_topk",
    # (3a) the final r4-stale block, name order
    "text_fingerprint", "text_lang_id", "text_quality_scores",
    "text_repetition", "text_tfidf_top3", "text_token_stats",
    "text_vocab_topk", "unpivot_part_metrics", "window_ntile_customers",
    "window_order_gaps", "window_rolling_week_spend",
    "window_running_customer_spend", "window_top3_parts_per_supplier",
    # (3b) stalest-green filler (r5), name order
    "agg_percentiles_events", "asof_join_purchase_click",
    "asof_join_with_tolerance", "bloom_pruned_urgent_revenue",
    "decontaminate_against_benchmark", "dedup_chunks",
    "dedup_cluster_assign", "dedup_corpus_keep", "dedup_srp_lsh",
    "dq_check_customers", "event_transitions", "events_rate_anomaly",
    "funnel_conversion", "gapfill_hourly_locf", "media_byte_histogram",
    "media_checksums", "media_frame_sample", "pagerank_purchase_graph",
    "pii_scrub_customers", "pipeline_clean_corpus", "q11_important_stock",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_part_counts",
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
    ):
        out.update(mod.QUERIES)
    missing = [n for n in _FRONT_WINDOW if n not in out]
    assert not missing, f"front-window names not registered: {missing}"
    ordered = {n: out[n] for n in _FRONT_WINDOW}
    ordered.update((n, s) for n, s in out.items() if n not in ordered)
    return ordered
