"""Bucketed co-located join: assert the plan has no Exchange — both for
the generic two-bucketed-tables join and for the claim SCALE.md makes
about iterative graph ops: a pre-bucketed edge list makes the per-round
LPA join Exchange-free on the edge side."""

import re

from pyspark.sql import functions as F

from composable_logs_spark.operators.bucketing import bucketed_join, write_bucketed
from composable_logs_spark.queries.graph_q import _graph
from composable_logs_spark.queries.phrase_q import _postings


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


def test_bucketed_postings_make_tok_joins_exchange_free(spark, sf_dir):
    """phrase_q's claim ('at 100 TB this relation is the search index
    itself, bucketed by tok'), demonstrated — the LPA-edge proof applied
    to text retrieval: write the positional postings bucketBy(tok) and
    run the phrase pipeline's df lookup (postings joined to the query
    vocabulary on tok, then the per-tok frequency agg) against the
    table. The postings side of the SortMergeJoin carries NO Exchange —
    only the (tiny) vocabulary side shuffles to the bucket partitioning,
    and the tok-grain aggregate reuses the join's partitioning. The
    unbucketed plan shuffles the full postings relation. Broadcast is
    disabled so the proof covers the non-broadcastable case (a query-
    term relation at serving scale); in the shipped query the vocab IS
    broadcast, which shuffles nothing either way."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        post = _postings(d)
        write_bucketed(post, "b_postings", "tok", 8)
        # the phrase df lookup's vocabulary relation: distinct words of
        # the first few docs, keyed tok like the postings
        vocab = (
            d.where(F.col("doc_id") < 3)
            .select(
                F.explode(
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+")
                ).alias("tok")
            )
            .distinct()
        )

        def df_lookup(p):
            return p.join(vocab, "tok").groupBy("tok").agg(
                F.count("*").alias("tf")
            )

        bucketed = df_lookup(spark.table("b_postings"))
        plain = df_lookup(post)
        b_plan = bucketed._jdf.queryExecution().executedPlan().toString()
        p_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in b_plan and "SortMergeJoin" in p_plan
        assert "SelectedBucketsCount" in b_plan
        tok_exchanges = re.compile(r"Exchange hashpartitioning\(tok")
        # bucketed: the postings scan IS the join partitioning — the one
        # tok-Exchange in the whole plan is the vocabulary side, and the
        # per-tok agg adds none (it reuses the join's partitioning)
        assert len(tok_exchanges.findall(b_plan)) == 1, b_plan
        assert b_plan.count("Exchange") == 1, b_plan
        # unbucketed: the full postings relation shuffles on tok too
        assert len(tok_exchanges.findall(p_plan)) == 2, p_plan

        # and the lookup computes the same frequencies either way
        assert sorted(map(tuple, bucketed.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_postings")


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
