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
# (3) fill with the longest-unverified green block. Round 6 window:
# the 17 never-checked + approx_sketch_stats (oracle added) +
# q10_returned_items / embedding_pca_top1 (plan rewrites) + the two
# r1-only stragglers + this round's 13 brand-new queries (mix_q,
# basket_q, fuzzy_q, bpe_q, profile_q, mv_q) + chunk_overlap_windows,
# filled with the longest-unverified r3/r4 greens.
_FRONT_WINDOW = [
    "q12_priority_lines", "outlier_mad_events", "winsorize_doc_lengths",
    "pack_sequences", "approx_sketch_stats", "join_salted_skew_revenue",
    "text_unigram_logprob", "text_bpe_pretokens", "ann_pq_adc",
    "embedding_int8_quant", "spanlog_failure_root_cause", "corpus_line_dedup",
    "split_no_leakage", "vocab_coverage_topk", "hll_distinct_customers",
    "cms_heavy_hitters", "hll_users_by_event_type", "asof_join_nearest",
    "dedup_ngram_jaccard", "dedup_embedding_cosine", "q10_returned_items",
    "embedding_pca_top1",
    # round-6 additions (never driver-checked)
    "domain_cap_sample", "crossdoc_ngram_overlap", "mix_sources_to_target",
    "chunk_overlap_windows",
    "frequent_item_pairs", "triangle_count_copurchase", "bfs_purchase_distance",
    "fuzzy_match_partnames", "bpe_train_merges", "bpe_encode_stats",
    "table_profile_lineitem",
    "skyline_parts", "weighted_reservoir_topk", "mv_incremental_merge",
    "seasonal_anomaly_events", "forecast_linear_events", "ann_ivf_recall",
    "dedup_jaccard_prefix", "hll_intersection_parts", "session_path_topk", "copurchase_pmi_topk",
    "cheapest_path_copurchase", "fk_integrity_audit", "hll_cumulative_users",
    "drift_psi_events", "cusum_changepoint_events", "fuzzy_entity_clusters",
    # longest-unverified green fillers
    "pivot_event_cohorts",
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
    ):
        out.update(mod.QUERIES)
    missing = [n for n in _FRONT_WINDOW if n not in out]
    assert not missing, f"front-window names not registered: {missing}"
    ordered = {n: out[n] for n in _FRONT_WINDOW}
    ordered.update((n, s) for n, s in out.items() if n not in ordered)
    return ordered
