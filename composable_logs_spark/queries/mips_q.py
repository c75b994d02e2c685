"""Maximum inner-product search (MIPS) with Cauchy-Schwarz norm-bound
pruning — the retrieval mode recommendation and reward models actually
use (un-normalized dot products), where cosine ANN is the wrong metric.

The reference has no vector surface (north-star scope). The family here
(``similarity_q``) covers cosine and quantized metrics; MIPS differs
because the corpus norm matters: a short vector can never beat a long
one, and that inequality IS the index.

Plan (exact result, prune proven by the oracle):

1. One pass computes per-vector norms (map-side, no shuffle).
2. Shortlist: the ``_SHORTLIST`` largest-norm corpus vectors via
   ``orderBy().limit()`` (TakeOrderedAndProject — per-partition heaps,
   never a global sort), broadcast against the query batch; the k-th
   best shortlist dot per query is a LOWER BOUND L_q on the final k-th
   best score.
3. Prune: Cauchy-Schwarz gives dot(x, q) <= ||x|| * ||q||, so any
   corpus vector with ||x|| * ||q|| < L_q - margin cannot enter the
   top-k; the full scan filters on that product BEFORE computing any
   dot product (64 multiply-adds saved per pruned row; with a
   norm-sorted parquet layout the filter becomes a min/max zone-map
   skip and prunes whole row groups).
4. Survivors get exact dots and the salted two-phase top-k
   (``similarity_q._topk_two_phase`` shape).

The margin covers the 4dp score rounding plus double noise: a pruned
row's true dot < L_q - 1e-3, so its rounded score sits strictly below
the k-th best — dropping it cannot change the result. The DuckDB
oracle runs the UNpruned brute force, so gate equality proves the
bound logic exactly (a wrongly-pruned true neighbor would hash-fail).

Why the high-norm shortlist works at 100 TB: L_q tightens with the
largest achievable products, and those concentrate in the largest-norm
vectors (the LEMP/FEXIPRO observation); the shortlist is O(_SHORTLIST)
rows broadcast once, independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import QuerySpec, load
from .similarity_q import _N_QUERIES, _SALT_BUCKETS, _TOP_K, _as_double, _dot, _norm

_SHORTLIST = 64
_MARGIN = 1e-3


def ann_mips_norm_prune(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("vec")
    ).withColumn("nrm", _norm(F.col("vec")))
    queries = e.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    # phase A: per-query lower bound from the high-norm shortlist
    shortlist = e.orderBy(F.col("nrm").desc(), "vec_id").limit(_SHORTLIST)
    sl_scored = (
        shortlist.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(_dot(F.col("vec"), F.col("qvec")), 4).alias("dot"),
        )
    )
    w_sl = W.partitionBy("query_id").orderBy(F.col("dot").desc(), "vec_id")
    bounds = (
        sl_scored.withColumn("_r", F.row_number().over(w_sl))
        .where(F.col("_r") == _TOP_K)
        .select("query_id", F.col("dot").alias("lq"))
    )
    # phase B: prune on the norm product BEFORE any dot product
    pruned = (
        e.join(F.broadcast(queries.join(bounds, "query_id")),
               F.col("vec_id") != F.col("query_id"))
        .where(F.col("nrm") * F.col("qnrm") >= F.col("lq") - F.lit(_MARGIN))
        .select(
            "query_id",
            "vec_id",
            F.round(_dot(F.col("vec"), F.col("qvec")), 4).alias("dot"),
        )
    )
    # salted two-phase top-k (the similarity_q discipline, keyed on dot)
    salted = pruned.withColumn(
        "_salt", F.pmod(F.hash(F.col("vec_id")), F.lit(_SALT_BUCKETS))
    )
    order = [F.col("dot").desc(), F.col("vec_id")]
    local = (
        salted.withColumn(
            "_lr", F.row_number().over(W.partitionBy("query_id", "_salt").orderBy(*order))
        )
        .where(F.col("_lr") <= _TOP_K)
    )
    return (
        local.withColumn(
            "rank", F.row_number().over(W.partitionBy("query_id").orderBy(*order))
        )
        .where(F.col("rank") <= _TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "dot", "rank")
        .orderBy("query_id", "rank")
    )


MIPS_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
),
q AS (SELECT vec_id AS query_id, vec AS qvec FROM e WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_sum(list_transform(range(1, 65), i -> e.vec[i] * q.qvec[i])), 4) AS dot
  FROM e JOIN q ON e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, dot, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY dot DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {_TOP_K}
ORDER BY query_id, rank
"""


QUERIES = {
    "ann_mips_norm_prune": QuerySpec(ann_mips_norm_prune, MIPS_SQL),
}
