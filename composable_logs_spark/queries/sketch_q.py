"""Approximate/sketch aggregates — the scale path for distinct counts and
quantiles (HLL++ and GK-sketch are one-pass, fixed-memory, mergeable —
what you actually run at 100 TB instead of exact countDistinct).

No DuckDB oracle: sketch outputs are implementation-defined, so the
driver records the weaker rows-only check (exact counterparts are
oracle-checked in agg_distinct_parts_per_nation / agg_percentiles_events;
the unit test bounds the sketch error against the exact values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load


def approx_sketch_stats(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("approx_p99_price"),
        F.count("*").alias("n_rows"),
    )


QUERIES = {
    "approx_sketch_stats": QuerySpec(approx_sketch_stats, None),
}
