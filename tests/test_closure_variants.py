"""Closure algorithm equivalence: iterative vs doubling, on a chain far
deeper than typical span forests."""

from pyspark.sql import functions as F

from composable_logs_spark.operators.closure import descendants, descendants_doubling


def _chain_edges(spark, n, run_id="0xr"):
    rows = [(run_id, f"n{i}", f"n{i+1}") for i in range(n)]
    return spark.createDataFrame(
        rows, "run_id string, parent_span_id string, span_id string"
    )


def test_doubling_equals_iterative_on_deep_chain(spark):
    edges = _chain_edges(spark, 20)
    it = descendants(edges, max_depth=25)
    db = descendants_doubling(edges)
    it_set = {(r["ancestor_span_id"], r["span_id"]) for r in it.collect()}
    db_set = {(r["ancestor_span_id"], r["span_id"]) for r in db.collect()}
    assert it_set == db_set
    assert len(it_set) == 20 * 21 // 2  # all ancestor pairs of a 21-node chain


def test_doubling_multi_run_isolation(spark):
    e1 = _chain_edges(spark, 3, "0xa")
    e2 = _chain_edges(spark, 3, "0xb")
    closure = descendants_doubling(e1.unionByName(e2))
    per_run = {
        r["run_id"]: r["n"]
        for r in closure.groupBy("run_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_run == {"0xa": 6, "0xb": 6}
