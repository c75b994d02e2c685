"""Synchronous label propagation, checked against an independent pure-
Python implementation of the identical schedule (sync rounds, majority
vote, min-label tie-break, isolated nodes keep their label)."""

from collections import Counter

from composable_logs_spark.queries.lpa_q import _ITERS, lpa


def _py_lpa(node_ids, edge_list, iters):
    nbrs = {}
    for s, d in edge_list:
        nbrs.setdefault(d, []).append(s)
    labels = {n: n for n in node_ids}
    for _ in range(iters):
        new = {}
        for n in node_ids:
            if n not in nbrs:
                new[n] = labels[n]
                continue
            counts = Counter(labels[s] for s in nbrs[n])
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            # majority, tie -> smallest label
            top = best[1]
            new[n] = min(l for l, c in counts.items() if c == top)
        labels = new
    return labels


def _run(spark, node_ids, undirected_edges, iters):
    edge_list = [(s, d) for s, d in undirected_edges] + [
        (d, s) for s, d in undirected_edges
    ]
    nodes = spark.createDataFrame(
        [(n, "n") for n in node_ids], "node_id long, kind string"
    )
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["node_id"]: r["community"] for r in lpa(nodes, edges, iters).collect()}
    assert got == _py_lpa(node_ids, edge_list, iters)
    return got


def test_lpa_two_cliques_with_bridge(spark):
    clique_a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    clique_b = [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    edges = clique_a + clique_b + [(3, 10)]
    got = _run(spark, list(range(4)) + list(range(10, 14)), edges, _ITERS)
    # each clique converges to ONE community, and the bridge doesn't merge them
    assert len({got[i] for i in range(4)}) == 1
    assert len({got[i] for i in range(10, 14)}) == 1
    assert got[0] != got[10]


def test_lpa_isolated_and_star(spark):
    # star: hub 0 with leaves 1..5; isolated node 99 keeps its own label
    edges = [(0, i) for i in range(1, 6)]
    got = _run(spark, list(range(6)) + [99], edges, _ITERS)
    assert got[99] == 99
    # all leaves adopt the hub's orbit: leaves see only the hub each round
    assert len({got[i] for i in range(1, 6)}) == 1
