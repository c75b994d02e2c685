"""k-core peeling (operators/kcore) on hand graphs where the answer is
known structurally: cascading tendril removal, clique survival, empty
core, and the raise-on-unconverged guard."""

import pytest

from composable_logs_spark.operators.kcore import kcore_subgraph


def _edges_df(spark, pairs):
    return spark.createDataFrame(sorted(pairs), "a long, b long")


def _k4_plus_chain():
    # K4 clique {1,2,3,4} (the 3-core) + a chain 4-5-6-7; at k=3 the
    # whole chain (degrees <= 2) drops in the first round.
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 5), (5, 6), (6, 7)]
    return clique + chain


def test_3core_is_the_clique_and_chain_cascades_off(spark):
    core = kcore_subgraph(_edges_df(spark, _k4_plus_chain()), 3)
    got = {r["node"]: r["core_deg"] for r in core.collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_2core_keeps_cycles_drops_tendrils(spark):
    # triangle + pendant path: the 2-core is exactly the triangle
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    core = kcore_subgraph(_edges_df(spark, edges), 2)
    assert {r["node"] for r in core.collect()} == {1, 2, 3}


def test_empty_core(spark):
    # a tree has no 2-core at all
    edges = [(1, 2), (2, 3), (2, 4)]
    core = kcore_subgraph(_edges_df(spark, edges), 2)
    assert core.count() == 0


def test_rounds_cascade_and_exhaustion_raises(spark):
    # triangle {1,2,3} + chain 3-4-5-6-7 at k=2: interior chain nodes
    # hold degree 2 until their outer neighbor falls, so the peel
    # cascades one node per round (7, then 6, then 5, then 4) — a
    # single-round degree filter would wrongly keep 4, 5 and 6.
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (6, 7)]
    df = _edges_df(spark, edges)
    core, rounds = kcore_subgraph(df, 2, return_rounds=True)
    assert rounds >= 4
    assert {r["node"] for r in core.collect()} == {1, 2, 3}
    with pytest.raises(RuntimeError, match="no fixpoint"):
        kcore_subgraph(df, 2, max_rounds=2)
