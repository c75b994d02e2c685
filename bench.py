"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with the noop sink (full computation, no
driver collect). Each query runs twice and reports the per-query MINIMUM:
the first pass pays one-time analyzer/codegen/cache costs, and best-of-2
also rides out transient machine-level stalls (this box shows occasional
multi-second CPU-steal spikes that would otherwise dominate a single
measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from composable_logs_spark.session import get_spark
from composable_logs_spark.queries import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family (scan-agg, join, window, sessionize,
# near-dup LSH, ANN, text, streaming-window, span-summarisation).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_top3_parts_per_supplier",
    "sessionize_user_events",
    "range_join_error_attribution",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_top5",
    "text_token_stats",
    "stream_tumbling_counts",
    "spanlog_task_runs",
]


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    qs = all_queries()

    # warm-up: JVM, parquet footers, Python worker pool — one query per
    # major code path (parquet scan-agg; span-summarisation pipeline,
    # whose 30-stage plan pays a one-time analyzer/codegen cost)
    for warm in ("q1_pricing_summary", "spanlog_task_runs"):
        qs[warm].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df = qs[name].fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
