"""Adamic-Adar / Resource-Allocation link prediction
(queries/linkpred_q), checked against an independent pure-Python
implementation of the identical scoring (integer micro-units, hub
prune, existing-edge exclusion) on a hand-built co-purchase graph."""

import math
from collections import defaultdict

from composable_logs_spark.queries.linkpred_q import (
    _MAX_HUB,
    _TOP_K,
    graph_adamic_adar,
)


def _sf(spark, tmp_path, baskets):
    rows = [(o, p) for o, parts in baskets for p in parts]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    return str(tmp_path)


def _py_scores(baskets):
    edges = set()
    for _, parts in baskets:
        ps = sorted(set(parts))
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                edges.add((a, b))
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    deg = {n: len(v) for n, v in nbrs.items()}
    scores = defaultdict(lambda: [0, 0, 0])  # (u,v) -> [n, aa, ra]
    for w, d in deg.items():
        if d > _MAX_HUB:
            continue
        ns = sorted(nbrs[w])
        aa = math.floor(1_000_000 / math.log(d) + 0.5)  # HALF_UP round
        ra = 1_000_000 // d
        for i, u in enumerate(ns):
            for v in ns[i + 1 :]:
                s = scores[(u, v)]
                s[0] += 1
                s[1] += aa
                s[2] += ra
    out = [
        (u, v, n, a, r)
        for (u, v), (n, a, r) in scores.items()
        if (u, v) not in edges
    ]
    out.sort(key=lambda t: (-t[3], t[0], t[1]))
    return out[:_TOP_K]


def test_matches_python_reference(spark, tmp_path):
    # two co-purchase stars sharing spokes: many open wedges, one hub
    baskets = [
        (1, [10, 11, 12]),
        (2, [10, 13]),
        (3, [11, 13, 14]),
        (4, [12, 14]),
        (5, [10, 15]),
        (6, [15, 16]),
        (7, [13, 16, 17]),
    ]
    got = [
        (r["u"], r["v"], r["n_common"], r["aa_micro"], r["ra_micro"])
        for r in graph_adamic_adar(spark, _sf(spark, tmp_path, baskets)).collect()
    ]
    want = _py_scores(baskets)
    assert got == want
    assert got, "the graph must actually produce predicted links"
    # ranked output: no predicted pair may already be an edge
    direct = {(min(a, b), max(a, b)) for _, ps in baskets for a in ps for b in ps if a != b}
    assert all((u, v) not in direct for u, v, *_ in got)
