"""basket_q + fuzzy_q: every operator is cross-checked against an
independent brute-force Python reference computed from the same parquet
tables (the gate already hash-checks them against DuckDB SQL; this adds
a third, structurally different formulation)."""

import duckdb
import pytest

from composable_logs_spark.queries.basket_q import (
    _ABS_MINSUP,
    _MIN_COOCCUR,
    bfs_purchase_distance,
    frequent_item_pairs,
    triangle_count_copurchase,
)
from composable_logs_spark.queries.fuzzy_q import _MAX_DIST, fuzzy_match_partnames


@pytest.fixture(scope="module")
def baskets(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    by_order = {}
    for o, p in rows:
        by_order.setdefault(o, set()).add(p)
    return by_order


def _edge_set(baskets, min_cooccur):
    from collections import Counter

    cooccur = Counter()
    for items in baskets.values():
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                cooccur[(s[i], s[j])] += 1
    return {e for e, c in cooccur.items() if c >= min_cooccur}


@pytest.fixture(scope="module")
def edges(baskets):
    """Triangle edges: repeat co-purchases (>= _MIN_COOCCUR)."""
    return _edge_set(baskets, _MIN_COOCCUR)


@pytest.fixture(scope="module")
def bfs_edges(baskets):
    """BFS runs on the >= 1 graph (the >= 2 cut disconnects at scale)."""
    return _edge_set(baskets, 1)


def test_frequent_pairs_match_bruteforce(spark, sf_dir, baskets):
    from collections import Counter

    item_cnt = Counter(p for items in baskets.values() for p in items)
    minsup = max(
        _ABS_MINSUP, (11 * sum(item_cnt.values())) // (10 * len(item_cnt)) + 1
    )
    frequent = {p for p, c in item_cnt.items() if c >= minsup}
    pair_cnt = Counter()
    for items in baskets.values():
        s = sorted(p for p in items if p in frequent)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pair_cnt[(s[i], s[j])] += 1
    expect = sorted(
        ((c, a, b) for (a, b), c in pair_cnt.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:20]
    got = [
        (r["pair_support"], r["part_a"], r["part_b"])
        for r in frequent_item_pairs(spark, sf_dir).collect()
    ]
    assert got == expect


def test_triangle_count_matches_bruteforce(spark, sf_dir, edges):
    nodes = {n for e in edges for n in e}
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if c > b  # a < b from edge normalisation; count each once
    )
    row = triangle_count_copurchase(spark, sf_dir).collect()[0]
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == tri


def test_bfs_distances_match_bruteforce(spark, sf_dir, bfs_edges):
    from collections import deque

    adj = {}
    for a, b in bfs_edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    src = min(adj)
    dist = {src: 0}
    q = deque([src])
    while q:
        n = q.popleft()
        if dist[n] >= 4:
            continue
        for m in adj[n]:
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    from collections import Counter

    expect = Counter(dist.values())
    got = {r["dist"]: r for r in bfs_purchase_distance(spark, sf_dir).collect()}
    assert {d: r["n_nodes"] for d, r in got.items()} == dict(expect)
    for d, r in got.items():
        level = [n for n, dd in dist.items() if dd == d]
        assert r["min_node"] == min(level)
        assert r["max_node"] == max(level)
        assert r["node_sum"] == sum(level)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_matches_bruteforce(spark, sf_dir):
    con = duckdb.connect()
    names = con.execute(
        f"SELECT p_name, count(*), min(p_partkey)"
        f" FROM '{sf_dir}/part.parquet' GROUP BY 1"
    ).fetchall()
    expect = set()
    for na, ca, ia in names:
        for nb, cb, ib in names:
            if na < nb and na.split()[-1] == nb.split()[-1]:
                d = _lev(na, nb)
                if d <= _MAX_DIST:
                    expect.add((na, nb, d, ca, cb, ia, ib))
    got = {
        (
            r["name_a"], r["name_b"], r["dist"],
            r["n_parts_a"], r["n_parts_b"], r["canon_a"], r["canon_b"],
        )
        for r in fuzzy_match_partnames(spark, sf_dir).collect()
    }
    assert got == expect
    assert expect  # blocking grid guarantees close pairs exist


def test_pmi_matches_bruteforce(spark, sf_dir, baskets):
    import math
    from collections import Counter

    from composable_logs_spark.queries.basket_q import (
        _PMI_MIN_PAIR,
        copurchase_pmi_topk,
    )

    n = len(baskets)
    item = Counter(p for items in baskets.values() for p in items)
    pair = Counter()
    for items in baskets.values():
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pair[(s[i], s[j])] += 1
    scored = [
        (c * n / (item[a] * item[b]), a, b, c)
        for (a, b), c in pair.items()
        if c >= _PMI_MIN_PAIR
    ]
    expect = [
        (a, b, c, item[a], item[b], round(math.log(r), 4))
        for r, a, b, c in sorted(scored, key=lambda t: (-t[0], t[1], t[2]))[:20]
    ]
    got = [
        (r["part_a"], r["part_b"], r["c_ab"], r["c_a"], r["c_b"], r["pmi"])
        for r in copurchase_pmi_topk(spark, sf_dir).collect()
    ]
    # pmi rounding: Python's round() is banker's; tolerate half-tie ULP
    assert [g[:5] for g in got] == [e[:5] for e in expect]
    for g, e in zip(got, expect):
        assert abs(g[5] - e[5]) <= 1e-4


def test_cheapest_path_matches_bellman_ford(spark, sf_dir, baskets):
    from collections import Counter

    from composable_logs_spark.queries.basket_q import (
        _KNN_K,
        _MAX_COST_HOPS,
        cheapest_path_copurchase,
    )

    cooccur = Counter()
    for items in baskets.values():
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                cooccur[(s[i], s[j])] += 1
    # K-NN digraph: each node keeps its K strongest neighbours
    nbrs = {}
    for (a, b), c in cooccur.items():
        nbrs.setdefault(a, []).append((b, c))
        nbrs.setdefault(b, []).append((a, c))
    adj = {
        u: [
            (v, 1000000 // c)
            for v, c in sorted(lst, key=lambda t: (-t[1], t[0]))[:_KNN_K]
        ]
        for u, lst in nbrs.items()
    }
    src = min(adj)
    dist = {src: 0}
    for _ in range(_MAX_COST_HOPS):
        nxt = dict(dist)
        for u, d in dist.items():
            for v, c in adj[u]:
                if d + c < nxt.get(v, float("inf")):
                    nxt[v] = d + c
        dist = nxt
    expect = sorted(((c, n) for n, c in dist.items()))[:20]
    got = [
        (r["cost_milli"], r["node"])
        for r in cheapest_path_copurchase(spark, sf_dir).collect()
    ]
    assert got == expect


def test_fuzzy_entities_match_union_find(spark, sf_dir):
    import hashlib

    from composable_logs_spark.queries.fuzzy_q import (
        _MAX_DIST,
        fuzzy_entity_clusters,
    )

    con = duckdb.connect()
    names = con.execute(
        f"SELECT p_name, count(*), min(p_partkey)"
        f" FROM '{sf_dir}/part.parquet' GROUP BY 1"
    ).fetchall()
    parent = {cid: cid for _, _, cid in names}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for na, _, ia in names:
        for nb, _, ib in names:
            if na < nb and na.split()[-1] == nb.split()[-1] and _lev(na, nb) <= _MAX_DIST:
                ra, rb = find(ia), find(ib)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for name, cnt, cid in names:
        groups.setdefault(find(cid), []).append((name, cnt))
    expect = {
        eid: (
            len(ms),
            sum(c for _, c in ms),
            hashlib.md5(",".join(sorted(n for n, _ in ms)).encode()).hexdigest(),
        )
        for eid, ms in groups.items()
    }
    got = {
        r["entity_id"]: (r["n_names"], r["n_parts"], r["members_digest"])
        for r in fuzzy_entity_clusters(spark, sf_dir).collect()
    }
    assert got == expect
