"""Bucketed co-located join: assert the plan has no Exchange — both for
the generic two-bucketed-tables join and for the claim SCALE.md makes
about iterative graph ops: a pre-bucketed edge list makes the per-round
LPA join Exchange-free on the edge side."""

import re

from pyspark.sql import functions as F

from composable_logs_spark.operators.bucketing import bucketed_join, write_bucketed
from composable_logs_spark.queries.graph_q import _graph


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(orders, "b_orders", "o_orderkey", 8)
        write_bucketed(li, "b_lineitem", "o_orderkey", 8)

        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side

        # and it computes the right thing
        n = joined.count()
        plain = orders.join(li, "o_orderkey").count()
        assert n == plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_edges_make_lpa_round_join_exchange_free(spark, sf_dir):
    """SCALE.md's recurring claim, demonstrated: write the LPA edge list
    bucketed by src, run one vote round's join against it, and the edge
    side of the SortMergeJoin carries NO Exchange — only the (node-
    sized) labels side shuffles to the bucket partitioning. The
    unbucketed plan shuffles BOTH sides; and the round's votes are
    byte-identical either way."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        nodes, edges = _graph(spark, sf_dir)
        labels = nodes.select(
            F.col("node_id").alias("src"), F.col("node_id").alias("label")
        )
        write_bucketed(edges, "b_lpa_edges", "src", 8)

        def vote_join(e):
            return e.join(labels, "src")

        bucketed = vote_join(spark.table("b_lpa_edges"))
        plain = vote_join(edges)
        b_plan = bucketed._jdf.queryExecution().executedPlan().toString()
        p_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in b_plan and "SortMergeJoin" in p_plan
        # bucketed: the edge scan IS the join partitioning — exactly one
        # src-Exchange (the labels side) instead of two. (The plain
        # edges' UPSTREAM derivation exchanges on its own keys either
        # way; the claim is about the join's src partitioning.)
        assert "SelectedBucketsCount" in b_plan
        src_exchanges = re.compile(r"Exchange hashpartitioning\(src")
        assert len(src_exchanges.findall(b_plan)) == 1, b_plan
        assert len(src_exchanges.findall(p_plan)) == 2, p_plan
        # and the bucketed table's scan feeds the join with no Exchange
        # anywhere above it (its subtree is exchange-free by count: the
        # single Exchange in the whole bucketed plan is the labels side)
        assert b_plan.count("Exchange") == 1, b_plan

        # the round computes the same votes either way
        def votes(e):
            return sorted(
                vote_join(e)
                .groupBy("dst", "label")
                .agg(F.count("*").alias("n"))
                .collect()
            )

        assert votes(spark.table("b_lpa_edges")) == votes(edges)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lpa_edges")
