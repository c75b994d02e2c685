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


def test_hll_accuracy_and_mergeability(spark, sf_dir):
    """m=256 -> expected stderr 1.04/sqrt(256) ~ 6.5%; assert a 3-sigma
    envelope. Mergeability: max-merging the register tables of two
    disjoint halves must equal the whole corpus's sketch — the property
    that lets every partition/day sketch independently."""
    from pyspark.sql import functions as F

    from composable_logs_spark.queries import load
    from composable_logs_spark.queries.hll_q import _M, _W, hll_distinct_customers

    row = hll_distinct_customers(spark, sf_dir).collect()[0]
    assert row["m"] == _M
    err = abs(row["hll_estimate"] - row["true_distinct"]) / row["true_distinct"]
    assert err < 0.20, (row["hll_estimate"], row["true_distinct"])

    o = load(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10
    ).cast("long")
    powers = F.array(*[F.lit(1 << i).cast("long") for i in range(_W)])

    def regs(df):
        return (
            df.select((h % _M).alias("idx"), (h / _M).cast("long").alias("w"))
            .select(
                "idx",
                (
                    F.lit(_W)
                    - F.size(F.filter(powers, lambda p: p <= F.col("w")))
                    + 1
                ).alias("rho"),
            )
            .groupBy("idx")
            .agg(F.max("rho").alias("m_j"))
        )

    whole = {r["idx"]: r["m_j"] for r in regs(o).collect()}
    half_a = regs(o.where(F.col("o_orderkey") % 2 == 0))
    half_b = regs(o.where(F.col("o_orderkey") % 2 == 1))
    merged = {
        r["idx"]: r["m_j"]
        for r in half_a.unionByName(half_b)
        .groupBy("idx")
        .agg(F.max("m_j").alias("m_j"))
        .collect()
    }
    assert merged == whole


def test_cms_overestimates_only_and_is_tight_for_heavy_tokens(spark, sf_dir):
    from composable_logs_spark.queries.hll_q import cms_heavy_hitters

    rows = cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 10
    # one-sided error: a count-min estimate can never undercount
    assert all(r["cms_estimate"] >= r["true_count"] for r in rows)
    # at d=4 x w=1024 the heavy hitters should estimate (near-)exactly
    slack = max(r["cms_estimate"] - r["true_count"] for r in rows)
    top = max(rows, key=lambda r: r["true_count"])
    assert slack <= 0.05 * top["true_count"]
