"""Near-duplicate CLUSTER assignment (north-star L5, the step after
pair-finding).

LSH pair-finding emits duplicate edges; a pipeline needs per-document
cluster ids plus one canonical keeper per cluster. This wires
``operators.components.connected_components`` over the verified
MinHash-LSH edges (``dedup_q.dedup_minhash_lsh``) and assigns
``cluster_id = min(doc_id in component)``, ``is_canonical = (doc_id ==
cluster_id)`` — the deterministic keep-lowest-id policy every dedup recipe
uses.

The DuckDB oracle recomputes the FULL pipeline independently: same
shingle→minhash→band→verify SQL, then transitive closure via a recursive
CTE (min reachable id per node ≡ min label propagation fixpoint), so both
the edge set and the clustering are value-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from ..operators.components import connected_components
from .dedup_q import _NEAR_DUP_CORPUS_SQL, _minhash_sql, _near_dup_corpus, dedup_minhash_lsh


def dedup_cluster_assign(spark: SparkSession, sf: str) -> DataFrame:
    pairs = dedup_minhash_lsh(spark, sf).select("doc_a", "doc_b")
    nodes = _near_dup_corpus(spark, sf).select(F.col("doc_id").alias("id"))
    comp = connected_components(
        nodes,
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
    )
    # cluster sizes: groupBy on the component key the labels already
    # carry; the join back is component-key equi-join (post-agg, small)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("id") == F.col("component")).alias("is_canonical"),
        )
    )


CLUSTER_SQL = f"""
WITH RECURSIVE corpus AS ({_NEAR_DUP_CORPUS_SQL}),
pairs AS (
  SELECT doc_a, doc_b FROM ({_minhash_sql()}) mh_pairs
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(id, anc) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT e.dst AS id, r.anc FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (
  SELECT id AS doc_id, min(anc) AS cluster_id FROM reach GROUP BY id
),
sizes AS (
  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1
)
SELECT c.doc_id, c.cluster_id, s.cluster_size,
       c.doc_id = c.cluster_id AS is_canonical
FROM comp c JOIN sizes s USING (cluster_id)
"""


def dedup_corpus_keep(spark: SparkSession, sf: str) -> DataFrame:
    """The corpus-dedup end-product: per cluster keep the highest-quality
    document (quality = text length, ties broken by lowest doc_id), mark
    the rest dropped.

    Scale shape: the arg-max is ONE hash aggregation on cluster_id
    (max over a (n_chars, -doc_id) struct — map-side combined), and the
    join back is an equi-join against the post-agg keeper table, which is
    |clusters| rows, not |docs|. No windows over the full corpus.
    """
    corpus = _near_dup_corpus(spark, sf).select(
        "doc_id", F.length("text").alias("n_chars")
    )
    assign = dedup_cluster_assign(spark, sf).select("doc_id", "cluster_id")
    labeled = assign.join(corpus, "doc_id")
    keepers = (
        labeled.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))
            ).alias("best")
        )
        .select("cluster_id", (-F.col("best.neg_id")).alias("keeper_id"))
    )
    return labeled.join(keepers, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "keeper_id",
        F.col("n_chars").cast("int").alias("n_chars"),
        (F.col("doc_id") == F.col("keeper_id")).alias("kept"),
    )


KEEP_SQL = f"""
WITH RECURSIVE corpus AS ({_NEAR_DUP_CORPUS_SQL}),
pairs AS (
  SELECT doc_a, doc_b FROM ({_minhash_sql()}) mh_pairs
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(id, anc) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT e.dst AS id, r.anc FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (
  SELECT id AS doc_id, min(anc) AS cluster_id FROM reach GROUP BY id
),
lab AS (
  SELECT c.doc_id, c.cluster_id, CAST(length(co.text) AS INT) AS n_chars
  FROM comp c JOIN corpus co USING (doc_id)
),
keep AS (
  SELECT cluster_id, doc_id AS keeper_id
  FROM (SELECT cluster_id, doc_id,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM lab) ranked
  WHERE rn = 1
)
SELECT l.doc_id, l.cluster_id, k.keeper_id, l.n_chars,
       l.doc_id = k.keeper_id AS kept
FROM lab l JOIN keep k USING (cluster_id)
"""


QUERIES = {
    "dedup_cluster_assign": QuerySpec(dedup_cluster_assign, CLUSTER_SQL),
    "dedup_corpus_keep": QuerySpec(dedup_corpus_keep, KEEP_SQL),
}
