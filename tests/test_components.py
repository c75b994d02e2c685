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


def test_components_random_graphs_match_union_find(spark):
    """Property check vs a plain union-find reference on random graphs."""
    import random

    def uf_components(n_nodes, edge_list):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edge_list:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        # canonical label = min node id in component
        comp_min = {}
        for v in range(n_nodes):
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        return {(v, comp_min[find(v)]) for v in range(n_nodes)}

    rng = random.Random(42)
    for trial in range(3):
        n = rng.randint(5, 30)
        m = rng.randint(0, n * 2)
        edge_list = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
        edges = spark.createDataFrame(edge_list or [(0, 0)], ["src", "dst"])
        got = _rows(connected_components(nodes, edges))
        assert got == uf_components(n, edge_list), (n, edge_list)


def test_doubling_matches_simple_on_random_graphs(spark):
    """connected_components_doubling is a drop-in: same labelling as the
    hash-to-min form on random graphs."""
    import random

    from composable_logs_spark.operators.components import (
        connected_components_doubling,
    )

    rng = random.Random(7)
    for _ in range(3):
        n = rng.randint(5, 30)
        m = rng.randint(0, n * 2)
        edge_list = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
        edges = spark.createDataFrame(edge_list or [(0, 0)], ["src", "dst"])
        simple = _rows(connected_components(nodes, edges))
        doubled = _rows(connected_components_doubling(nodes, edges))
        assert doubled == simple, (n, edge_list)


def test_doubling_round_count_is_logarithmic(spark):
    """The whole point: a length-d chain resolves in ~log2(d) fused
    rounds, where hash-to-min needs d. Chain-64 must finish well under
    its diameter (63) — and in fact under 10 rounds."""
    from composable_logs_spark.operators.components import (
        connected_components_doubling,
    )

    n = 64
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    labels, rounds = connected_components_doubling(nodes, edges, return_rounds=True)
    assert _rows(labels) == {(i, 0) for i in range(n)}
    assert rounds <= 10, rounds  # log2(63) ~ 6 propagation+jump rounds


def test_doubling_succeeds_where_simple_iteration_cap_fails(spark):
    """On the same chain with the same small iteration budget, hash-to-min
    (1 hop/round) cannot finish — and must RAISE rather than return
    plausible-looking partially-converged labels — while pointer
    doubling converges: the documented reason the doubling variant
    exists."""
    import pytest

    from composable_logs_spark.operators.components import (
        connected_components_doubling,
    )

    n = 40  # diameter 39 > 8 budget
    truth = {(i, 0) for i in range(n)}
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(nodes, edges, max_iters=8)
    assert _rows(connected_components_doubling(nodes, edges, max_iters=8)) == truth


def test_doubling_raises_on_exhausted_budget(spark):
    """The doubling variant must also fail loud when max_iters is
    exhausted before the sum fixpoint — callers cannot detect partial
    convergence from the returned frame."""
    import pytest

    from composable_logs_spark.operators.components import (
        connected_components_doubling,
    )

    n = 40  # needs ~6 fused rounds; 2 is not enough
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components_doubling(nodes, edges, max_iters=2)
