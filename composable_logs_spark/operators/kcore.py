"""k-core subgraph extraction (Seidman 1983) by iterative peeling.

The k-core of an undirected graph is the maximal subgraph in which every
node has degree >= k — the standard "dense fabric" extractor a
graph-shaped corpus pipeline runs before community detection or
embedding training (peripheral tendrils contribute noise, the core
carries the signal). Peeling computes it exactly: repeatedly drop every
node whose degree WITHIN THE SURVIVING SUBGRAPH is < k until a
fixpoint; the survivors are the k-core regardless of removal order
(Seidman's theorem), which is what makes the bulk-synchronous Spark
loop below equivalent to the classic sequential min-degree peel.

Scale shape: each round is one degree aggregation over the surviving
edge frame plus two shuffle-free-after-AQE left-semi joins back onto
it; the number of rounds is the peel depth (the graph's degeneracy
ordering depth), which is tiny for real co-occurrence graphs — hubs
lose tendrils in the first rounds and the loop converges as soon as one
round removes nothing (edge count unchanged; filtering only ever
REMOVES edges, so an equal count proves an equal set). Every round
persists its frame and unpersists the previous one, so lineage stays
O(1) deep and a 1000-executor run never re-derives round i-1 from
scratch. Exhausting ``max_rounds`` without the fixpoint RAISES — the
same discipline as ``operators/components.py`` (r12 ADVICE): a
partially-peeled subgraph looks plausible and verifies nowhere.

Reference anchor: none (north-star scope, SURVEY.md §2.10) — the
reference has no graph surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_ROUNDS = 24


def kcore_subgraph(
    edges: DataFrame,
    k: int,
    max_rounds: int = DEFAULT_MAX_ROUNDS,
    return_rounds: bool = False,
):
    """Peel ``edges`` (columns ``a``, ``b``; undirected, one row per
    edge) down to the k-core. Returns the surviving node frame
    ``(node, core_deg)`` where ``core_deg`` is the degree inside the
    core subgraph — or ``(frame, rounds)`` with ``return_rounds``.
    """
    cur = edges.select("a", "b").persist()
    prev_cnt = cur.count()
    rounds = 0
    converged = False
    while rounds < max_rounds:
        rounds += 1
        deg = (
            cur.select(F.col("a").alias("node"))
            .unionAll(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("node")
        nxt = (
            cur.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .persist()
        )
        cnt = nxt.count()
        cur.unpersist()
        cur = nxt
        if cnt == prev_cnt:
            converged = True
            break
        prev_cnt = cnt
    if not converged:
        cur.unpersist()
        raise RuntimeError(
            f"kcore_subgraph: no fixpoint after {max_rounds} peeling "
            f"rounds (edge count still shrinking at {prev_cnt}); the "
            "survivors are NOT the k-core — raise max_rounds"
        )
    core_deg = (
        cur.select(F.col("a").alias("node"))
        .unionAll(cur.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("core_deg"))
    )
    if return_rounds:
        return core_deg, rounds
    return core_deg
