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
    from composable_logs_spark.queries.hll_q import _M, hll_distinct_customers

    row = hll_distinct_customers(spark, sf_dir).collect()[0]
    assert row["m"] == _M
    err = abs(row["hll_estimate"] - row["true_distinct"]) / row["true_distinct"]
    assert err < 0.20, (row["hll_estimate"], row["true_distinct"])

    from composable_logs_spark.queries.hll_q import hll_registers

    o = load(spark, sf_dir, "orders")

    def regs(df):
        return hll_registers(df, "o_custkey")

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


def test_hll_registers_merge_across_streaming_batches(spark, tmp_path):
    """Mergeable-sketch property in an actual Structured Streaming loop:
    each micro-batch computes its own registers, foreachBatch max-merges
    them into a running table, and the merged sketch equals the one-shot
    batch sketch over all rows — incremental distinct counting without
    re-scanning history."""
    from pyspark.sql import functions as F

    from composable_logs_spark.queries.hll_q import hll_registers

    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    batches = [
        [(i,) for i in range(0, 400)],
        [(i,) for i in range(300, 700)],   # overlaps batch 1
        [(i,) for i in range(650, 1000)],
    ]
    spark.createDataFrame(batches[0], "k long").coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    merged: dict[int, int] = {}

    def merge_batch(df, _bid):
        for r in hll_registers(df, "k").collect():
            merged[r["idx"]] = max(merged.get(r["idx"], 0), r["m_j"])

    q = (
        spark.readStream.schema("k long")
        .parquet(str(src))
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        for b in batches[1:]:
            spark.createDataFrame(b, "k long").coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
            q.processAllAvailable()
    finally:
        q.stop()

    whole = {
        r["idx"]: r["m_j"]
        for r in hll_registers(
            spark.createDataFrame(sum(batches, []), "k long"), "k"
        ).collect()
    }
    assert merged == whole
