"""Distributed PageRank with exact scaled-integer arithmetic.

Fixed-iteration PageRank over (node_id) / (src, dst) DataFrames — the
join→agg messaging loop (one shuffle join keyed on src + one hash agg
keyed on dst + one |nodes|-sized left join per iteration; see
``queries/graph_q.py`` for the scale discussion and the DuckDB-checked
query built on this).

Ranks are longs in units of 1e-12 of total mass: `div` truncation and
integer sums are bit-exact regardless of partitioning or reduce order,
so two runs — or two engines — can be compared with `==`, not a
tolerance.  Mass lost to truncation and dangling nodes is not
redistributed (deterministic on any engine applying the same rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = 3) -> DataFrame:
    """``nodes``: one `node_id` column (may carry extra columns — they are
    preserved).  ``edges``: directed (src, dst) rows; pass both directions
    for an undirected graph.  Returns nodes + `rank_e12` (long)."""
    extra = [c for c in nodes.columns if c != "node_id"]
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # r13 (guide §3.3/§5): materialize the degree-annotated edge list
    # once — every iteration's message join otherwise re-derived it
    # (including whatever joins/distinct built `edges`), and the replay
    # count doubles per round because `ranks` is referenced twice per
    # round. Same per-round truncation as operators/components.py; the
    # standard iterative-graph materialization (GraphX does the same).
    edged = edges.join(deg, "src").localCheckpoint(eager=True)
    n_nodes = nodes.agg(F.count("*").alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node_id",
        *extra,
        F.expr(f"{SCALE} div n_nodes").alias("rank"),
        F.expr(f"(15 * ({SCALE} div n_nodes)) div 100").alias("base"),
    )
    for _ in range(iters):
        sums = (
            edged.join(ranks.select(F.col("node_id").alias("src"), "rank"), "src")
            .select("dst", F.expr("rank div deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("insum"))
        )
        ranks = (
            ranks.select("node_id", *extra, "base")
            .join(sums, ranks["node_id"] == sums["dst"], "left")
            .select(
                "node_id",
                *extra,
                "base",
                (
                    F.col("base")
                    + F.expr("(85 * coalesce(insum, CAST(0 AS LONG))) div 100")
                ).alias("rank"),
            )
            # r13: per-round truncation — see the `edged` note above
            .localCheckpoint(eager=True)
        )
    return ranks.select("node_id", *extra, F.col("rank").alias("rank_e12"))
