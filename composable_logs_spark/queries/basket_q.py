"""Market-basket and graph-topology operators over the order/part
bipartite graph — the co-occurrence analytics a training-data pipeline
runs to understand corpus structure (and a retailer runs on baskets):

- ``frequent_item_pairs``: A-priori style frequent-pair mining. The
  scale-critical property is SUPPORT PRUNING BEFORE PAIR GENERATION:
  items below minimum support are dropped from every basket *before*
  the within-basket self-join, so the quadratic step runs over
  frequent items only (Agrawal & Srikant's candidate pruning, the part
  of A-priori that matters on 100 TB). Pair counting is a map-side
  combinable hash agg; the final top-20 is `orderBy().limit(20)` which
  lowers to TakeOrderedAndProject (per-partition heaps, driver merges
  20 rows per partition — no single-reducer sort).
- ``triangle_count_copurchase``: exact triangle counting with DEGREE
  ORIENTATION (Cohen's / Schank-Wagner forward algorithm): each
  undirected edge is directed from its (degree, id)-smaller endpoint,
  so every node's out-degree is bounded and the wedge join
  (e1.src = e2.src) never explodes on hub nodes — the standard trick
  that makes distributed triangle counting survive power-law graphs.
  The oracle counts the same triangles with the naive a<b<c 3-way
  self-join; the counts agree because orientation only canonicalises
  each triangle once.
- ``bfs_purchase_distance``: multi-hop breadth-first distances from a
  fixed source part via iterative frontier expansion — each hop is one
  equi-join of the current frontier against the (small, broadcastable
  here; shuffle-partitioned at scale) edge list plus an anti-join
  against the visited set, with early exit on an empty frontier. The
  oracle is a recursive CTE (DuckDB `WITH RECURSIVE ... UNION`), i.e.
  the engine-native fixpoint — a genuinely independent formulation.

Graph parity with the reference: the reference's only graph surface is
parent-child span traversal (`composable-logs` span trees, see
`operators/closure.py` for that port); these three extend the engine to
general graph/co-occurrence analytics with the same iterative-join
machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

# support pruning keeps items strictly above 1.1x the MEAN item
# support — a data-shape-relative threshold that stays meaningful at
# every scale factor (a fraction-of-baskets threshold like 0.2% goes
# degenerate when the catalog grows with the corpus: at sf0.1 no item
# clears it and the query returns empty). Computed in exact integer
# arithmetic so both engines derive the identical cutoff.
_ABS_MINSUP = 5
_MIN_COOCCUR = 2  # triangle edges: pairs co-occurring at least twice
_MAX_HOPS = 4


def _baskets(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates(["l_orderkey", "l_partkey"])
    )


_BASKETS_SQL = "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"


# ---------------------------------------------------------------------------
def frequent_item_pairs(spark: SparkSession, sf: str) -> DataFrame:
    b = _baskets(spark, sf)
    # stage 1: item supports; cutoff = floor(1.1 * mean support) + 1
    # in integer arithmetic (mean = total occurrences / distinct items)
    support = b.groupBy("l_partkey").agg(F.count("*").alias("item_support"))
    minsup = support.agg(
        F.sum("item_support").alias("tot"), F.count("*").alias("n_items")
    ).select(
        F.greatest(
            F.lit(_ABS_MINSUP).cast("long"),
            F.expr("(11 * tot) div (10 * n_items) + 1"),
        ).alias("minsup")
    )
    frequent = (
        support.crossJoin(F.broadcast(minsup))
        .where(F.col("item_support") >= F.col("minsup"))
        .select("l_partkey")
    )
    # stage 2: prune baskets to frequent items BEFORE the pair self-join
    fb = b.join(frequent, "l_partkey").select("l_orderkey", "l_partkey")
    pairs = (
        fb.alias("x")
        .join(fb.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .groupBy(
            F.col("x.l_partkey").alias("part_a"),
            F.col("y.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("pair_support"))
    )
    # TakeOrderedAndProject: per-partition top-20 heaps, no global sort
    return pairs.orderBy(
        F.col("pair_support").desc(), "part_a", "part_b"
    ).limit(20)


FREQUENT_PAIRS_SQL = f"""
WITH b AS ({_BASKETS_SQL}),
supp AS (SELECT l_partkey, count(*) AS s FROM b GROUP BY l_partkey),
stats AS (
  SELECT greatest({_ABS_MINSUP},
                  (11 * sum(s)) // (10 * count(*)) + 1) AS minsup
  FROM supp
),
frequent AS (
  SELECT l_partkey FROM supp WHERE s >= (SELECT minsup FROM stats)
),
fb AS (SELECT l_orderkey, l_partkey FROM b JOIN frequent USING (l_partkey))
SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
       CAST(count(*) AS BIGINT) AS pair_support
FROM fb x JOIN fb y ON x.l_orderkey = y.l_orderkey
                   AND x.l_partkey < y.l_partkey
GROUP BY 1, 2
ORDER BY pair_support DESC, part_a, part_b
LIMIT 20
"""


# ---------------------------------------------------------------------------
def _edges(spark: SparkSession, sf: str, min_cooccur: int) -> DataFrame:
    """Undirected co-purchase edges (a < b), co-occurrence >= threshold.

    Triangle counting uses >= 2 (repeat co-purchase — the denser, more
    meaningful signal); BFS uses >= 1 because the >= 2 graph thins to
    isolated pairs as the catalog scales (observed at sf0.1) and hop
    distances need the connected fabric.
    """
    b = _baskets(spark, sf)
    pairs = (
        b.alias("x")
        .join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .groupBy(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .agg(F.count("*").alias("w"))
    )
    if min_cooccur > 1:
        pairs = pairs.where(F.col("w") >= min_cooccur)
    return pairs.select("a", "b")


def _edges_sql(min_cooccur: int) -> str:
    having = (
        f" HAVING count(*) >= {min_cooccur}" if min_cooccur > 1 else ""
    )
    return f"""
  SELECT x.l_partkey AS a, y.l_partkey AS b
  FROM ({_BASKETS_SQL}) x JOIN ({_BASKETS_SQL}) y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2{having}
"""


def triangle_count_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    e = _edges(spark, sf, _MIN_COOCCUR).cache()
    # degree per node over the undirected edge set
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # orient each edge from the (deg, id)-smaller endpoint: out-degrees
    # are O(sqrt(m))-bounded, so the wedge join below cannot blow up on
    # hub nodes (forward / degree-ordering algorithm)
    da = deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "deg_a")
    db = deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "deg_b")
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
            )
            .otherwise(F.struct(F.col("b").alias("src"), F.col("a").alias("dst")))
            .alias("e")
        )
        .select("e.src", "e.dst")
        # r13 (guide §3.3): both sides of the wedge self-join reference
        # this frame — un-materialized, the orientation joins run twice
        .localCheckpoint(eager=True)
    )
    # wedges around each apex: every triangle has exactly ONE node whose
    # two triangle edges are both oriented outward (the degree-order
    # minimum), so closing its wedge counts each triangle once — but the
    # symmetric self-join materialises each unordered wedge twice
    # (e1/e2 swapped), hence the /2. The closing edge is looked up in
    # the id-normalised undirected set (a < b), which the normalised
    # wedge (least, greatest) matches at most once.
    w1 = oriented.alias("e1")
    w2 = oriented.alias("e2")
    closing = e.select(F.col("a").alias("v"), F.col("b").alias("w_"))
    tri = (
        w1.join(w2, F.col("e1.src") == F.col("e2.src"))
        .where(F.col("e1.dst") != F.col("e2.dst"))
        .select(
            F.least("e1.dst", "e2.dst").alias("v"),
            F.greatest("e1.dst", "e2.dst").alias("w_"),
        )
        .join(closing, ["v", "w_"])
        .agg((F.count("*") / 2).cast("long").alias("n_triangles"))
    )
    stats = e.agg(
        F.count("*").alias("n_edges"),
    )
    nodes = deg.agg(F.count("*").alias("n_nodes"))
    return (
        tri.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(nodes))
        .select("n_nodes", "n_edges", "n_triangles")
    )


TRIANGLE_SQL = f"""
WITH e AS ({_edges_sql(_MIN_COOCCUR)}),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM e e1 JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e
  ) GROUP BY node
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       tri.n_triangles
FROM tri
"""


# ---------------------------------------------------------------------------
def bfs_purchase_distance(spark: SparkSession, sf: str) -> DataFrame:
    e = _edges(spark, sf, 1)
    # undirected adjacency, hash-partitioned on the join key ONCE: the
    # cached output keeps HashPartitioning(a), so every hop's frontier
    # join re-shuffles only the (small) frontier side — the adjacency
    # never moves again. This is the partitioning-reuse pattern that
    # makes iterative graph traversal viable at cluster scale (the same
    # trick `operators/closure.py` uses for span trees).
    adj = (
        e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .repartition("a")
        .cache()
    )
    src = adj.agg(F.min("a").alias("node"))
    # eager localCheckpoint, not cache(): each hop's plan references
    # every earlier hop, and under AQE a chain of cached iterations
    # makes Catalyst re-optimise a geometrically growing tree (12s+
    # per hop observed by hop 4 with cache()). Checkpointing cuts the
    # lineage so every hop plans against flat leaves — the same
    # trade-off documented at length in operators/closure.py.
    visited = src.withColumn("dist", F.lit(0)).localCheckpoint(eager=True)
    frontier = visited
    for hop in range(1, _MAX_HOPS + 1):
        nxt = (
            frontier.join(adj, frontier["node"] == adj["a"])
            .select(F.col("b").alias("node"))
            .dropDuplicates(["node"])
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break
        # r14 (guide §1.2): visited is a UNION of per-hop checkpoints —
        # already flat (one scan per hop, bounded by _MAX_HOPS), so the
        # old per-hop re-checkpoint of the ENTIRE visited set (one more
        # job per hop, rewriting O(V) rows each time) bought nothing
        visited = visited.unionAll(nxt)
        frontier = nxt
    return (
        visited.groupBy("dist")
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
            F.sum("node").alias("node_sum"),
        )
        .orderBy("dist")
    )


BFS_SQL = f"""
WITH RECURSIVE e AS ({_edges_sql(1)}),
adj AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
src AS (SELECT min(a) AS node FROM adj),
walk AS (
  SELECT node, 0 AS dist FROM src
  UNION
  SELECT adj.b AS node, walk.dist + 1 AS dist
  FROM walk JOIN adj ON adj.a = walk.node
  WHERE walk.dist < {_MAX_HOPS}
),
best AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node)
SELECT CAST(dist AS INTEGER) AS dist,
       CAST(count(*) AS BIGINT) AS n_nodes,
       min(node) AS min_node, max(node) AS max_node,
       CAST(sum(node) AS BIGINT) AS node_sum
FROM best GROUP BY dist ORDER BY dist
"""


# ---------------------------------------------------------------------------
# Pointwise mutual information over co-purchases: PMI(a,b) =
# ln(N * c_ab / (c_a * c_b)) — the association measure that separates
# "bought together because both are popular" from genuine affinity
# (raw pair counts, as in frequent_item_pairs, rank popular-x-popular
# pairs first; PMI normalises by both marginals). Same A-priori-style
# shape: marginal counts + support-floored pair counts, one broadcast
# of the 1-row N, ln only in the final projection. The support floor is c_ab >= 2 (repeat
# co-purchase — the same evidence bar as the triangle edges; a floor
# of 5 leaves 1 pair at sf0.01 and 0 at sf0.1). The ranking key is
# the correctly-rounded double of an exact integer ratio (all inputs
# < 2^53), identical in both engines; ties break on (a, b).
_PMI_MIN_PAIR = 2


def copurchase_pmi_topk(spark: SparkSession, sf: str) -> DataFrame:
    b = _baskets(spark, sf)
    n_baskets = b.agg(F.count_distinct("l_orderkey").alias("nb"))
    item = b.groupBy("l_partkey").agg(F.count("*").alias("c"))
    pairs = (
        b.alias("x")
        .join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .groupBy(
            F.col("x.l_partkey").alias("part_a"),
            F.col("y.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("c_ab"))
        .where(F.col("c_ab") >= _PMI_MIN_PAIR)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b"))
    scored = (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_baskets))
        .withColumn(
            "ratio",
            (F.col("c_ab") * F.col("nb")) / (F.col("c_a") * F.col("c_b")),
        )
    )
    return (
        scored.orderBy(F.col("ratio").desc(), "part_a", "part_b")
        .limit(20)
        .select(
            "part_a",
            "part_b",
            "c_ab",
            "c_a",
            "c_b",
            F.round(F.log("ratio"), 4).alias("pmi"),
        )
    )


PMI_SQL = f"""
WITH b AS ({_BASKETS_SQL}),
nb AS (SELECT count(DISTINCT l_orderkey) AS nb FROM b),
item AS (SELECT l_partkey, count(*) AS c FROM b GROUP BY 1),
pairs AS (
  SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS c_ab
  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
                   AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {_PMI_MIN_PAIR}
),
scored AS (
  SELECT p.part_a, p.part_b, p.c_ab,
         CAST(ia.c AS BIGINT) AS c_a, CAST(ib.c AS BIGINT) AS c_b,
         (p.c_ab * nb.nb) / CAST(ia.c * ib.c AS DOUBLE) AS ratio
  FROM pairs p
  JOIN item ia ON ia.l_partkey = p.part_a
  JOIN item ib ON ib.l_partkey = p.part_b
  CROSS JOIN nb
)
SELECT part_a, part_b, c_ab, c_a, c_b, round(ln(ratio), 4) AS pmi
FROM scored
ORDER BY ratio DESC, part_a, part_b
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Bounded-hop weighted cheapest paths over the K-NN co-purchase graph:
# every node keeps its K=5 strongest neighbours (cooccurrence desc,
# id tie-break) — the similarity-graph construction that keeps degree
# BOUNDED at any corpus size (a raw cooccur>=2 cut fragments to
# isolated pairs at sf0.1, and cooccur>=1 explodes the oracle's path
# enumeration; top-K does neither, by construction). Edge costs are
# integer 1000000 div cooccur ("strong ties are short"). Four
# Bellman-Ford relaxation rounds compute the exact min cost over paths
# of <= 4 edges — each round is ONE join of the current distance table
# against the once-partitioned adjacency plus a min-agg, with eager
# localCheckpoint (the BFS lesson above). The oracle walks the same
# digraph with a recursive CTE accumulating cost under the hop bound
# and takes min per node — the engine-native fixpoint formulation.
# Integer costs make every comparison exact; top-20 tie-breaks on id.
_MAX_COST_HOPS = 4
_KNN_K = 5


def cheapest_path_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    b = _baskets(spark, sf)
    und = (
        b.alias("x")
        .join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .groupBy(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .agg(F.count("*").alias("w"))
    )
    both = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    )
    rn = F.row_number().over(
        W.partitionBy("a").orderBy(F.col("w").desc(), "b")
    )
    adj = (
        both.withColumn("rn", rn)
        .where(F.col("rn") <= _KNN_K)
        .withColumn("cost", F.expr("1000000 div w"))
        .select("a", "b", "cost")
        .repartition("a")
        .cache()
    )
    src = adj.agg(F.min("a").alias("node"))
    dist = src.withColumn("cost", F.lit(0).cast("long")).localCheckpoint(
        eager=True
    )
    # r14: a convergence-fingerprint early exit ((count, sum) unchanged
    # => fixpoint) was implemented and measured SLOWER here — the graph
    # doesn't converge before the 4-round budget at bench SFs, so the
    # per-round signature collect was pure overhead. Reverted.
    for _ in range(_MAX_COST_HOPS):
        cand = (
            dist.join(adj, dist["node"] == adj["a"])
            .select(
                F.col("b").alias("node"),
                (dist["cost"] + adj["cost"]).alias("cost"),
            )
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint(eager=True)
        )
    return (
        dist.orderBy("cost", "node")
        .limit(20)
        .select("node", F.col("cost").alias("cost_milli"))
    )


CHEAPEST_PATH_SQL = f"""
WITH RECURSIVE und AS (
  SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS w
  FROM ({_BASKETS_SQL}) x JOIN ({_BASKETS_SQL}) y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2
),
both_dir AS (SELECT a, b, w FROM und UNION ALL SELECT b, a, w FROM und),
adj AS (
  SELECT a, b, 1000000 // w AS cost FROM (
    SELECT a, b, w,
           row_number() OVER (PARTITION BY a ORDER BY w DESC, b) AS rn
    FROM both_dir
  ) WHERE rn <= {_KNN_K}
),
src AS (SELECT min(a) AS node FROM adj),
walk AS (
  SELECT node, CAST(0 AS BIGINT) AS cost, 0 AS hops FROM src
  UNION
  SELECT adj.b, walk.cost + adj.cost, walk.hops + 1
  FROM walk JOIN adj ON adj.a = walk.node
  WHERE walk.hops < {_MAX_COST_HOPS}
),
best AS (SELECT node, min(cost) AS cost FROM walk GROUP BY node)
SELECT node, CAST(cost AS BIGINT) AS cost_milli
FROM best ORDER BY cost, node LIMIT 20
"""


QUERIES = {
    "frequent_item_pairs": QuerySpec(frequent_item_pairs, FREQUENT_PAIRS_SQL),
    "triangle_count_copurchase": QuerySpec(
        triangle_count_copurchase, TRIANGLE_SQL
    ),
    "bfs_purchase_distance": QuerySpec(bfs_purchase_distance, BFS_SQL),
    "copurchase_pmi_topk": QuerySpec(copurchase_pmi_topk, PMI_SQL),
    "cheapest_path_copurchase": QuerySpec(cheapest_path_copurchase, CHEAPEST_PATH_SQL),
}
