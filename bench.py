"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with the noop sink (full computation, no
driver collect). Headline timings are COLD-cache / JIT-warm, applied
UNIFORMLY: every headline query runs once un-timed first (JVM JIT,
codegen, parquet footers, Python worker pool), then the cache is
cleared before every timed pass, so queries that cache intermediates
(e.g. the span-closure pipeline) can't report a warm-cache rerun as
their runtime and no query gets a JIT advantage another lacks. Two cold
passes ride out transient stalls; if they disagree by more than 2x
(this box shows occasional multi-second CPU-steal spikes) a third pass
breaks the tie. One extra warm pass per query (cache retained from the
previous run) is reported separately under "queries_warm".
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
    # bench output is the one JSON line on stdout; drop JVM WARN noise
    # (e.g. CacheManager re-cache notices on the deliberate warm passes)
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # warm-up: EVERY headline query twice, un-timed — JVM JIT, codegen,
    # parquet footers, Python worker pool. Uniform warm-up keeps the
    # timed numbers comparable across queries and across rounds
    # (previously only three hand-picked code paths were warmed, which
    # selectively advantaged one headline query's JIT state). Two passes
    # because the largest generated-code paths (minhash/LSH) only reach
    # steady-state C2 compilation after ~3 invocations; with the two
    # timed cold passes on top, every query is measured at the same
    # JIT tier.
    for _ in range(2):
        for warm in HEADLINE:
            qs[warm].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    def run_once(name: str, cold: bool) -> float:
        if cold:
            spark.catalog.clearCache()
        t0 = time.time()
        df = qs[name].fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in HEADLINE:
        passes = [run_once(name, cold=True) for _ in range(2)]
        if max(passes) > 2 * min(passes):  # steal-spike suspicion: tie-break
            passes.append(run_once(name, cold=True))
        timings[name] = round(min(passes), 3)
        # warm pass: cache left over from the previous run stays valid
        warm[name] = round(run_once(name, cold=False), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_warm": warm,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
