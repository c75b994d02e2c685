"""connected_components: label propagation on hand-built graphs."""

from composable_logs_spark.operators.components import connected_components


def _rows(df):
    return {(r["id"], r["component"]) for r in df.collect()}


def test_components_mixed_graph(spark):
    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, isolated 99
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 99]], ["id"])
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10)], ["src", "dst"]
    )
    got = _rows(connected_components(nodes, edges))
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (99, 99),
    }


def test_components_self_loop_and_duplicate_edges(spark):
    nodes = spark.createDataFrame([(i,) for i in [5, 6]], ["id"])
    edges = spark.createDataFrame([(5, 5), (5, 6), (6, 5), (5, 6)], ["src", "dst"])
    got = _rows(connected_components(nodes, edges))
    assert got == {(5, 5), (6, 5)}


def test_components_long_chain_converges(spark):
    n = 9  # diameter 8 < DEFAULT_MAX_ITERS
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    got = _rows(connected_components(nodes, edges))
    assert got == {(i, 0) for i in range(n)}
