"""PageRank operator: bit-exact equivalence against a sequential integer
model on random graphs (same approach as the connected-components
random-graph test)."""

import random

from pyspark.sql import functions as F

from composable_logs_spark.operators.pagerank import SCALE, pagerank


def _model(node_ids, edge_list, iters):
    """Sequential reference implementing the identical truncating-integer
    recurrence."""
    n = len(node_ids)
    deg: dict = {}
    for s, _ in edge_list:
        deg[s] = deg.get(s, 0) + 1
    base = (15 * (SCALE // n)) // 100
    rank = {v: SCALE // n for v in node_ids}
    for _ in range(iters):
        insum = {v: 0 for v in node_ids}
        for s, d in edge_list:
            insum[d] += rank[s] // deg[s]
        rank = {v: base + (85 * insum[v]) // 100 for v in node_ids}
    return rank


def test_pagerank_matches_sequential_model(spark):
    rng = random.Random(7)
    node_ids = list(range(60))
    # directed random graph incl. dangling nodes (50-59 have no out-edges)
    edge_list = list(
        {(rng.randrange(0, 50), rng.randrange(0, 60)) for _ in range(300)}
    )
    nodes = spark.createDataFrame([(v,) for v in node_ids], "node_id long")
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r.node_id: r.rank_e12
        for r in pagerank(nodes, edges, iters=4).collect()
    }
    want = _model(node_ids, edge_list, 4)
    assert got == want  # exact equality, no tolerance


def test_pagerank_preserves_extra_columns_and_mass_bound(spark):
    nodes = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "node_id long, tag string"
    )
    # 3-cycle: every node has in- and out-degree 1 -> uniform ranks
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    out = pagerank(nodes, edges, iters=3).collect()
    assert sorted(r.tag for r in out) == ["a", "b", "c"]
    ranks = [r.rank_e12 for r in out]
    assert len(set(ranks)) == 1  # symmetric graph -> identical ranks
    # total mass stays <= 1.0 (truncation only loses mass, never creates)
    assert sum(ranks) <= SCALE


def test_purchase_graph_node_ids_disjoint_at_any_sf(spark, tmp_path):
    """The even/odd node-id encoding (2*custkey vs 2*suppkey+1) cannot
    collide at any scale factor — unlike a fixed additive offset, which
    a TPC-H SF>=7 custkey range (150k x SF > 1e6) would overrun. Build a
    synthetic SF>=7-sized key range and assert node-id sets are disjoint
    and the graph keeps every node."""
    from composable_logs_spark.queries.graph_q import _graph

    n_cust, n_supp = 2000, 500
    lo = 1_000_000  # keys straddle the old 1e6 offset boundary
    cust_keys = list(range(lo - n_cust // 2, lo + n_cust // 2))
    supp_keys = list(range(lo - n_supp // 2, lo + n_supp // 2))
    sf_dir = tmp_path / "sfbig"
    sf_dir.mkdir()
    spark.createDataFrame([(k,) for k in cust_keys], "c_custkey long").write.parquet(
        str(sf_dir / "customer.parquet")
    )
    spark.createDataFrame([(k,) for k in supp_keys], "s_suppkey long").write.parquet(
        str(sf_dir / "supplier.parquet")
    )
    spark.createDataFrame(
        [(i, cust_keys[i % n_cust]) for i in range(3000)], "o_orderkey long, o_custkey long"
    ).write.parquet(str(sf_dir / "orders.parquet"))
    spark.createDataFrame(
        [(i, supp_keys[i % n_supp]) for i in range(3000)], "l_orderkey long, l_suppkey long"
    ).write.parquet(str(sf_dir / "lineitem.parquet"))

    nodes, edges = _graph(spark, str(sf_dir))
    kinds = {r.kind: r.n for r in nodes.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert kinds == {"customer": n_cust, "supplier": n_supp}
    # no id is claimed by both kinds
    assert (
        nodes.groupBy("node_id").agg(F.count_distinct("kind").alias("k")).where("k > 1").count()
        == 0
    )
    # every edge endpoint resolves to exactly one node
    endpoints = edges.select(F.col("src").alias("node_id")).union(
        edges.select(F.col("dst").alias("node_id"))
    ).distinct()
    assert endpoints.join(nodes, "node_id", "left_anti").count() == 0
