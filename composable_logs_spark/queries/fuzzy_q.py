"""Blocked fuzzy entity resolution over the part catalog.

The canonical record-linkage shape for a 100 TB pipeline, in three
stages that each shrink the data before the next:

1. **Canonicalise**: collapse the corpus to DISTINCT name strings with
   group sizes (one hash agg). Edit-distance work then scales with the
   catalog's distinct-value count, not the row count — on the test
   data 2 000 parts collapse to 64 names.
2. **Block**: candidate pairs are generated only within a blocking key
   (here the name's last word — the head noun; real pipelines use
   soundex/sorted-neighbourhood keys). Blocking turns the quadratic
   all-pairs stage into per-block quadratics; no CartesianProduct
   anywhere (the plan-audit test enforces this repo-wide).
3. **Match**: Levenshtein distance <= threshold inside each block.
   `F.levenshtein` and DuckDB's `levenshtein` both implement the plain
   Wagner-Fischer edit distance, so the two engines agree exactly.

Output is the matched pair list with group sizes — what a dedup/merge
step downstream would consume as its edge list (feeding e.g. the
label-propagation clustering in ``cluster_q``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_MAX_DIST = 4


def fuzzy_match_partnames(spark: SparkSession, sf: str) -> DataFrame:
    names = (
        load(spark, sf, "part")
        .groupBy("p_name")
        .agg(
            F.count("*").alias("n_parts"),
            F.min("p_partkey").alias("canon_id"),
        )
        .withColumn(
            "block", F.element_at(F.split(F.col("p_name"), " "), -1)
        )
        # cached: both sides of the block self-join read this table
        .cache()
    )
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(b, "block")
        .where(F.col("a.p_name") < F.col("b.p_name"))
        .withColumn(
            "dist", F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
        )
        .where(F.col("dist") <= _MAX_DIST)
        .select(
            F.col("block"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("dist").cast("int").alias("dist"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
            F.col("a.canon_id").alias("canon_a"),
            F.col("b.canon_id").alias("canon_b"),
        )
        .orderBy("block", "name_a", "name_b")
    )


FUZZY_SQL = f"""
WITH names AS (
  SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
         min(p_partkey) AS canon_id,
         string_split(p_name, ' ')[-1] AS block
  FROM part GROUP BY p_name
)
SELECT a.block, a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b,
       a.canon_id AS canon_a, b.canon_id AS canon_b
FROM names a JOIN names b
  ON a.block = b.block AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_DIST}
ORDER BY a.block, name_a, name_b
"""


# ---------------------------------------------------------------------------
# End-to-end entity resolution: the matched pairs above are EDGES; what
# a catalog pipeline ships is the entity table — connected components
# over the match graph, one canonical id per entity (min part key),
# with membership rolled up. Reuses the same min-label-propagation
# operator the near-dup corpus pipeline uses (operators/components.py:
# per-round cost O(|E|), rounds = component diameter); the oracle
# recomputes the clustering with a recursive CTE, cluster_q's pattern.
def fuzzy_entity_clusters(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.components import connected_components

    names = (
        load(spark, sf, "part")
        .groupBy("p_name")
        .agg(
            F.count("*").alias("n_parts"),
            F.min("p_partkey").alias("canon_id"),
        )
        .withColumn(
            "block", F.element_at(F.split(F.col("p_name"), " "), -1)
        )
        .cache()
    )
    a = names.alias("a")
    b = names.alias("b")
    edges = (
        a.join(b, "block")
        .where(
            (F.col("a.p_name") < F.col("b.p_name"))
            & (F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= _MAX_DIST)
        )
        .select(
            F.col("a.canon_id").alias("src"), F.col("b.canon_id").alias("dst")
        )
    )
    comp = connected_components(
        names.select(F.col("canon_id").alias("id")), edges
    )
    labeled = comp.join(
        names.select(F.col("canon_id").alias("id"), "p_name", "n_parts"), "id"
    )
    return (
        labeled.groupBy(F.col("component").alias("entity_id"))
        .agg(
            F.count("*").alias("n_names"),
            F.sum("n_parts").alias("n_parts"),
            F.md5(
                F.concat_ws(",", F.array_sort(F.collect_list("p_name")))
            ).alias("members_digest"),
        )
        .orderBy("entity_id")
    )


ENTITY_SQL = f"""
WITH RECURSIVE names AS (
  SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
         min(p_partkey) AS canon_id,
         string_split(p_name, ' ')[-1] AS block
  FROM part GROUP BY p_name
),
pairs AS (
  SELECT a.canon_id AS src, b.canon_id AS dst
  FROM names a JOIN names b
    ON a.block = b.block AND a.p_name < b.p_name
  WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_DIST}
),
edges AS (
  SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
),
reach(id, anc) AS (
  SELECT canon_id, canon_id FROM names
  UNION
  SELECT e.dst AS id, r.anc FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id, min(anc) AS entity_id FROM reach GROUP BY id)
SELECT c.entity_id,
       CAST(count(*) AS BIGINT) AS n_names,
       CAST(sum(n.n_parts) AS BIGINT) AS n_parts,
       md5(array_to_string(list(n.p_name ORDER BY n.p_name), ','))
         AS members_digest
FROM comp c JOIN names n ON n.canon_id = c.id
GROUP BY c.entity_id
ORDER BY c.entity_id
"""


QUERIES = {
    "fuzzy_match_partnames": QuerySpec(fuzzy_match_partnames, FUZZY_SQL),
    "fuzzy_entity_clusters": QuerySpec(fuzzy_entity_clusters, ENTITY_SQL),
}
