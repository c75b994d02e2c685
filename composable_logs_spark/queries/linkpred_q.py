"""Link prediction over the co-purchase graph: Adamic-Adar (2003) and
Resource-Allocation (Zhou et al. 2009) indices for non-adjacent node
pairs at distance 2 —

    AA(u,v) = Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w))
    RA(u,v) = Σ_{w ∈ N(u) ∩ N(v)} 1 / deg(w)

the "customers who bought X also bought Y" recommendation shape the
existing graph surface (triangles, PMI, BFS, label propagation) does
not cover: it SCORES missing edges rather than describing existing
structure.

Exactness: both indices are integer micro-units. RA's term is the pure
integer ``1_000_000 div deg``; AA's is ``round(1e6 / ln(deg))`` frozen
per-degree (the bm25_q idf_micro discipline — one double op per
DISTINCT degree value, then exact bigint sums in both engines).

100 TB shape: the wedge join (adjacency ⋈ adjacency on the common
neighbor) is the classic distance-2 blow-up — a hub with degree d
emits d² wedge pairs, so common neighbors are pruned to
``deg <= _MAX_HUB`` BEFORE the join. That is a semantic choice, not an
approximation trick: both indices discount hubs by design (a 10⁶-degree
hub contributes ~1/13.8 per AA wedge while exploding the join 10¹²-fold),
and the prune is mirrored exactly in the oracle. Existing edges are
removed with a broadcast-eligible anti-join; the final top-k lowers to
TakeOrderedAndProject (per-partition heaps, no global sort).

Reference anchor: none (north-star scope, SURVEY.md §2.10) — the
reference has no graph surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from .basket_q import _edges, _edges_sql

_MAX_HUB = 64  # wedge-apex degree cap (see module docstring)
_TOP_K = 30


def graph_adamic_adar(spark: SparkSession, sf: str) -> DataFrame:
    e = _edges(spark, sf, 1).cache()  # connectivity graph (>= 1 co-buy)
    adj = e.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionAll(
        e.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count("*").alias("deg"))
    # per-DISTINCT-degree micro weights: one double op per degree value,
    # exact bigint arithmetic everywhere downstream
    weights = deg.select(
        "node",
        "deg",
        F.expr("CAST(round(1000000 / ln(deg)) AS BIGINT)").alias("aa_w"),
        F.expr("1000000 div deg").alias("ra_w"),
    ).where(F.col("deg") <= _MAX_HUB)
    # wedges around each non-hub apex w: every unordered neighbor pair.
    # r13 (guide §3.3): materialized — both sides of the wedge
    # self-join reference apex, so the adjacency+degree derivation
    # otherwise runs twice
    apex = adj.join(weights, "node").localCheckpoint(eager=True)
    wedges = (
        apex.alias("x")
        .join(apex.alias("y"), ["node", "deg", "aa_w", "ra_w"])
        .where(F.col("x.nbr") < F.col("y.nbr"))
        .select(
            F.col("x.nbr").alias("u"),
            F.col("y.nbr").alias("v"),
            "aa_w",
            "ra_w",
        )
    )
    scored = wedges.groupBy("u", "v").agg(
        F.count("*").cast("int").alias("n_common"),
        F.sum("aa_w").alias("aa_micro"),
        F.sum("ra_w").alias("ra_micro"),
    )
    # predicted links only: drop pairs already adjacent (u < v matches
    # the edge normalisation, so one anti-join covers both orientations)
    missing = scored.join(
        e.select(F.col("a").alias("u"), F.col("b").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    return missing.orderBy(
        F.col("aa_micro").desc(), "u", "v"
    ).limit(_TOP_K)


ADAMIC_ADAR_SQL = f"""
WITH e AS ({_edges_sql(1)}),
adj AS (
  SELECT a AS node, b AS nbr FROM e
  UNION ALL
  SELECT b AS node, a AS nbr FROM e
),
weights AS (
  SELECT node, deg,
         CAST(round(1000000 / ln(deg)) AS BIGINT) AS aa_w,
         1000000 // deg AS ra_w
  FROM (SELECT node, count(*) AS deg FROM adj GROUP BY node)
  WHERE deg <= {_MAX_HUB}
),
apex AS (
  SELECT a.node, a.nbr, w.aa_w, w.ra_w
  FROM adj a JOIN weights w ON a.node = w.node
),
wedges AS (
  SELECT x.nbr AS u, y.nbr AS v, x.aa_w, x.ra_w
  FROM apex x JOIN apex y ON x.node = y.node AND x.nbr < y.nbr
),
scored AS (
  SELECT u, v, CAST(count(*) AS INT) AS n_common,
         CAST(sum(aa_w) AS BIGINT) AS aa_micro,
         CAST(sum(ra_w) AS BIGINT) AS ra_micro
  FROM wedges GROUP BY u, v
),
missing AS (
  SELECT s.* FROM scored s
  ANTI JOIN e ON e.a = s.u AND e.b = s.v
)
SELECT u, v, n_common, aa_micro, ra_micro
FROM missing
ORDER BY aa_micro DESC, u, v
LIMIT {_TOP_K}
"""


QUERIES = {
    "graph_adamic_adar": QuerySpec(graph_adamic_adar, ADAMIC_ADAR_SQL),
}
