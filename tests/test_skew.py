"""Salted aggregation / join equivalence tests."""

from pyspark.sql import functions as F

from composable_logs_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        (r["l_returnflag"]): (r["n"], r["q"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
        .collect()
    }
    salted = {
        (r["l_returnflag"]): (r["n"], r["q"])
        for r in salted_agg(
            li,
            ["l_returnflag"],
            partial_aggs=[F.count("*").alias("pn"), F.sum("l_quantity").alias("pq")],
            final_aggs=[F.sum("pn").alias("n"), F.sum("pq").alias("q")],
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = (
        orders.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    salted = (
        salted_join(orders, cust, "o_custkey", n_salts=4)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert {(r["c_mktsegment"], r["count"]) for r in plain} == {
        (r["c_mktsegment"], r["count"]) for r in salted
    }
