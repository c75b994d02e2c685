"""Hard-negative mining over the embeddings table — the contrastive-
training data op: for each anchor, the most-similar vectors from a
DIFFERENT class are exactly the negatives a retrieval/reranker model
should train against (harder than random negatives by construction).

The reference has no vector surface (north-star scope). This reuses the
``similarity_q`` machinery verbatim — broadcast anchor batch, one
corpus pass, salted two-phase top-k — with the class constraint pushed
INTO the join condition (label <> qlabel), so excluded-class vectors
never get a dot product computed at all.

100 TB design: identical to ``ann_cosine_top5`` (scan-everything
baseline; an IVF-celled variant composes exactly like
``ann_ivf_label_probe`` by probing cells rather than the full scan).
The label inequality makes the join condition NON-equi only on the
broadcast side — still a BroadcastHashJoin-free broadcast nested loop
over 10 anchor rows, never a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load
from .similarity_q import (
    _N_QUERIES,
    _TOP_K,
    _as_double,
    _dot,
    _norm,
    _topk_two_phase,
)


def embedding_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings").select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("vec")
    ).withColumn("norm", _norm(F.col("vec")))
    anchors = e.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    scored = (
        e.join(F.broadcast(anchors), F.col("label") != F.col("qlabel"))
        .select(
            "query_id",
            "vec_id",
            F.col("label").alias("neighbor_label"),
            F.round(
                _dot(F.col("vec"), F.col("qvec")) / (F.col("norm") * F.col("qnorm")),
                4,
            ).alias("cosine"),
        )
    )
    return _topk_two_phase(scored, _TOP_K, extra_cols=["neighbor_label"]).orderBy(
        "query_id", "rank"
    )


HARDNEG_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
  FROM embeddings
),
a AS (SELECT vec_id AS query_id, label AS qlabel, vec AS qvec, nrm AS qnrm
      FROM e WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT a.query_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
         round(list_sum(list_transform(range(1, 65), i -> e.vec[i] * a.qvec[i]))
               / (e.nrm * a.qnrm), 4) AS cosine
  FROM e JOIN a ON e.label <> a.qlabel
)
SELECT query_id, neighbor_id, neighbor_label, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {_TOP_K}
ORDER BY query_id, rank
"""


QUERIES = {
    "embedding_hard_negatives": QuerySpec(embedding_hard_negatives, HARDNEG_SQL),
}
