"""The driver's correctness gate checks the FIRST 50 entries of the
query registry. Rounds 1-3 verified the modules now at the back, so the
front window must keep holding the once-unverified set — a new module
registered in the front block would silently push queries out of the
driver's view. New queries belong in back-block modules."""

from composable_logs_spark.queries import all_queries

FRONT_50 = [
    # tpch_full
    "q6_forecast_revenue", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_stock", "q12_priority_lines",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_part_counts", "q17_small_qty_revenue",
    "q20_potential_promotion", "q21_waiting_suppliers",
    # asof_q
    "asof_join_purchase_click", "agg_percentiles_events",
    "asof_join_with_tolerance", "time_weighted_avg", "gapfill_hourly_locf",
    # session_q
    "session_window_stats", "funnel_conversion", "events_rate_anomaly",
    "retention_cohorts", "event_transitions",
    # pipeline_q
    "pii_scrub_customers", "dq_check_customers", "sample_quality_weighted",
    "pipeline_clean_corpus", "sample_stratified_hash", "dedup_chunks",
    "decontaminate_against_benchmark",
    # graph_q / stats_q / bloom_q
    "pagerank_purchase_graph", "outlier_mad_events", "winsorize_doc_lengths",
    "bloom_pruned_urgent_revenue",
    # multimodal_q / streaming_q
    "media_checksums", "media_byte_histogram", "media_frame_sample",
    "stream_tumbling_counts", "stream_sliding_counts", "stream_dedup_events",
    # sketch_q / srp_lsh_q
    "approx_sketch_stats", "dedup_srp_lsh",
    # tpch_extra
    "q2_min_cost_supplier", "q4_late_order_priority", "q7_nation_volume",
    "q18_large_volume_customers", "q19_bracket_revenue",
    "q22_idle_rich_customers",
    # cluster_q
    "dedup_cluster_assign", "dedup_corpus_keep",
]


def test_driver_gate_window_is_pinned():
    got = list(all_queries())[:50]
    assert got == FRONT_50, (
        "registry front-50 changed — the driver gate would now check a "
        "different query set; register new queries in BACK-block modules "
        f"(unexpected head: {[k for k in got if k not in FRONT_50]})"
    )
