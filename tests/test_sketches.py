"""Sketch aggregates: error-bounded against exact values."""

from pyspark.sql import functions as F

from composable_logs_spark.queries.sketch_q import approx_sketch_stats


def test_approx_within_error_bounds(spark, sf_dir):
    approx = {r["l_returnflag"]: r for r in approx_sketch_stats(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a["approx_parts"] - e["parts"]) / e["parts"] < 0.1
        assert abs(a["approx_median_price"] - e["median"]) / e["median"] < 0.05
