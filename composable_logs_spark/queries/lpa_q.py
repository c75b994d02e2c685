"""Community detection via synchronous label propagation (Raghavan et
al. 2007) over the customer↔supplier purchase graph — the fourth
classic graph shape after closure (operators/closure.py), connected
components (operators/components.py), and PageRank (graph_q):
majority-vote message passing.

Every node starts labelled with its own id; each synchronous round,
every node adopts the most frequent label among its neighbours
(tie → smallest label; isolated nodes keep their label). Unlike the
usual randomized-order LPA, the synchronous schedule with a total
tie-break is fully deterministic, so both engines converge to the
identical labelling and the driver can hash-compare node→community.

Scale shape: per round exactly one shuffle join (edges ⋈ labels on
src) and one two-level aggregation (count per (dst,label), then a
window partitioned BY dst to pick the argmax) — the same join→agg loop
as distributed PageRank, GraphFrames' LPA lowers to precisely this.
At 100 TB the edge list would be pre-bucketed by src so the per-round
join is Exchange-free; rounds are a fixed small constant (``_ITERS``),
not data-dependent.

Reference anchor: none (north-star scope, SURVEY.md §2.10) — the
reference's graph surface stops at tree traversal
(opentelemetry_helpers.py:365-491).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec
from .graph_q import _graph

_ITERS = 3


def lpa(nodes: DataFrame, edges: DataFrame, iters: int) -> DataFrame:
    """Synchronous LPA over (node_id, kind) nodes and (src, dst) edges;
    returns (node_id, kind, community)."""
    labels = nodes.select("node_id", "kind", F.col("node_id").alias("label"))
    # r13 (guide §3.3/§5): materialize the edge list once and each
    # round's labels — labels is referenced twice per round (votes +
    # the coalesce join), so un-materialized the replay count doubles
    # per round and every round re-derived the purchase-graph joins.
    # Same per-round truncation as operators/components.py/pagerank.py.
    edges = edges.localCheckpoint(eager=True)
    for _ in range(iters):
        votes = (
            edges.join(
                labels.select(F.col("node_id").alias("src"), "label"), "src"
            )
            .groupBy("dst", "label")
            .agg(F.count("*").alias("n"))
        )
        w = Window.partitionBy("dst").orderBy(F.desc("n"), F.col("label"))
        winner = (
            votes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(F.col("dst").alias("node_id"), F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(winner, "node_id", "left")
            .select(
                "node_id",
                "kind",
                F.coalesce("new_label", "label").alias("label"),
            )
            .localCheckpoint(eager=True)  # r13: per-round truncation
        )
    return labels.select(
        "node_id", "kind", F.col("label").alias("community")
    ).orderBy("node_id")


def community_label_propagation(spark: SparkSession, sf: str) -> DataFrame:
    nodes, edges = _graph(spark, sf)
    return lpa(nodes, edges, _ITERS)


def _lpa_sql() -> str:
    ctes = [
        """nodes AS (
  SELECT CAST(c_custkey * 2 AS BIGINT) AS node_id, 'customer' AS kind FROM customer
  UNION ALL
  SELECT CAST(s_suppkey * 2 + 1 AS BIGINT), 'supplier' FROM supplier
)""",
        """pairs AS (
  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS cust,
                  CAST(l_suppkey * 2 + 1 AS BIGINT) AS supp
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
)""",
        """edges AS (
  SELECT cust AS src, supp AS dst FROM pairs
  UNION ALL
  SELECT supp AS src, cust AS dst FROM pairs
)""",
        "l0 AS (SELECT node_id, kind, node_id AS label FROM nodes)",
    ]
    prev = "l0"
    for i in range(1, _ITERS + 1):
        ctes.append(
            f"""l{i} AS (
  SELECT l.node_id, l.kind, coalesce(w.new_label, l.label) AS label
  FROM {prev} l LEFT JOIN (
    SELECT dst AS node_id, label AS new_label FROM (
      SELECT e.dst, ll.label, count(*) AS n,
             row_number() OVER (PARTITION BY e.dst
                                ORDER BY count(*) DESC, ll.label) AS rn
      FROM edges e JOIN {prev} ll ON ll.node_id = e.src
      GROUP BY e.dst, ll.label
    ) WHERE rn = 1
  ) w ON w.node_id = l.node_id
)"""
        )
        prev = f"l{i}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node_id, kind, label AS community FROM {prev} ORDER BY node_id"
    )


QUERIES = {
    "community_label_propagation": QuerySpec(community_label_propagation, _lpa_sql()),
}
