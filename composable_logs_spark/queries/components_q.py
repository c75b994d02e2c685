"""Connected components on a LONG-CHAIN graph via pointer doubling —
the O(log diameter) scale path of ``operators/components.py``.

The dedup pipeline's hash-to-min components run in diameter rounds,
which is the right trade for star/clique-shaped duplicate clusters
(diameter 2-3). This query exercises the opposite regime — identity
stitching / session linkage graphs whose components are CHAINS — where
round count IS the scale problem: a million-event device chain would
take a million hash-to-min rounds but ~20 pointer-doubling rounds.

Graph construction: each customer's orders sorted by orderkey, with an
edge between consecutive orders (the "same account seen again" linkage
shape). Components are therefore exactly the per-customer chains, which
gives the oracle a closed form — component = MIN(orderkey) per customer
— while the Spark side must genuinely discover it from the edge list
alone via ``connected_components_doubling``: neighbour-min + pointer
jump per round, converging in ~log2(max orders per customer) rounds.

Output is one row per component with membership count, max member and
member-id sum — any single misassigned node changes at least two rows.

100 TB shape: both per-round steps shuffle on uniformly-hashed long
ids (no skew key exists — every node has degree <= 2 here, and the
label self-join is 1:1); the edge-construction window is partitioned
by customer, never partition-less. Round count is data-LOGARITHMIC,
so a 1000x deeper chain costs +10 rounds, not +999x rounds.

Reference anchor: none (north-star scope, SURVEY.md §2.10) — the
reference's graph surface stops at tree traversal
(opentelemetry_helpers.py:365-491).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, load
from ..operators.components import connected_components_doubling


def _chain_graph(spark: SparkSession, sf: str) -> tuple[DataFrame, DataFrame]:
    """(nodes, edges): orders as nodes, consecutive same-customer orders
    (by orderkey) as edges."""
    orders = load(spark, sf, "orders").select("o_custkey", "o_orderkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    edges = (
        orders.withColumn("nxt", F.lead("o_orderkey").over(w))
        .where(F.col("nxt").isNotNull())
        .select(F.col("o_orderkey").alias("src"), F.col("nxt").alias("dst"))
    )
    nodes = orders.select(F.col("o_orderkey").alias("id"))
    return nodes, edges


def components_chain_doubling(spark: SparkSession, sf: str) -> DataFrame:
    nodes, edges = _chain_graph(spark, sf)
    labels = connected_components_doubling(nodes, edges)
    return labels.groupBy("component").agg(
        F.count("*").alias("n_members"),
        F.max("id").alias("max_id"),
        F.sum("id").alias("id_sum"),
    )


_ORACLE = """
SELECT CAST(MIN(o_orderkey) AS BIGINT) AS component,
       CAST(COUNT(*) AS BIGINT)        AS n_members,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_id,
       CAST(SUM(o_orderkey) AS BIGINT) AS id_sum
FROM orders
GROUP BY o_custkey
"""

QUERIES = {
    "components_chain_doubling": QuerySpec(components_chain_doubling, _ORACLE),
}
