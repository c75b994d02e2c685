"""Matryoshka-style truncated-embedding retrieval (Kusupati et al.
2022, "Matryoshka Representation Learning"): rank by the first
``_PREFIX_D`` dimensions only, and measure how much of the
full-dimension top-k survives — the production trade every
embedding-heavy pipeline prices out, because a d/4 prefix index costs
a quarter of the scan bytes and RAM.

Both rankings reuse the ``ann_cosine_top5`` discipline exactly
(round-4dp cosine, neighbor-id tie-break, salted two-phase top-k), so
the overlap column measures the REPRESENTATION, not rank
nondeterminism. Output per query: the two top-5 id lists (rank order,
comma-joined — pins exact membership AND order cross-engine) and the
overlap count.

100 TB shape: one corpus scan computes both cosines per candidate row
(the prefix slice reads the same vector already in registers — no
second scan, no second shuffle); the broadcast query side and the
two-phase top-k are the standard ANN plan. A real deployment would
scan a physically-truncated prefix INDEX instead — this query measures
whether that index's answers are good enough before you build it.

Reference anchor: none (north-star scope, SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load
from .similarity_q import _as_double, _dot, _norm, _topk_two_phase

_N_QUERIES = 10
_TOP_K = 5
_PREFIX_D = 16  # retrieval prefix: first 16 of 64 dims


def _ranked_lists(topk: DataFrame, col: str) -> DataFrame:
    """(query_id, <col> = 'id1,id2,...' in rank order) from a two-phase
    top-k frame — <= _TOP_K rows per query, so the collect_list is
    bounded and sort_array makes it deterministic."""
    return topk.groupBy("query_id").agg(
        F.concat_ws(
            ",",
            F.expr(
                "transform(sort_array(collect_list(struct(rank, neighbor_id))),"
                " s -> cast(s.neighbor_id as string))"
            ),
        ).alias(col)
    )


def ann_matryoshka_prefix(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("vec")
    )
    e = e.select(
        "vec_id", "vec", F.slice("vec", 1, _PREFIX_D).alias("pvec")
    ).withColumn("norm", _norm(F.col("vec"))).withColumn(
        "pnorm", _norm(F.col("pvec"))
    )
    queries = e.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("pvec").alias("qpvec"),
        F.col("norm").alias("qnorm"),
        F.col("pnorm").alias("qpnorm"),
    )
    # ONE corpus pass scores both representations per candidate row.
    # Zero-norm convention, pinned on BOTH engines: cosine vs a zero
    # vector is 0.0, not NaN/Inf — an all-zero prefix (perfectly
    # possible for a real embedding's first 16 dims) would otherwise
    # divide by zero, and Spark and DuckDB disagree on NaN ordering, so
    # one pathological vector would nondeterministically reorder top-k
    # instead of ranking last.
    def _cos(dot, na, nb):
        return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(
            F.round(dot / (na * nb), 4)
        )

    scored = e.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        _cos(
            _dot(F.col("vec"), F.col("qvec")), F.col("norm"), F.col("qnorm")
        ).alias("cos_full"),
        _cos(
            _dot(F.col("pvec"), F.col("qpvec")), F.col("pnorm"), F.col("qpnorm")
        ).alias("cos_prefix"),
    )
    # cache the (query_id, vec_id, 2 cosines) frame: 24-byte rows, one
    # per candidate — the two differently-ordered top-k reductions and
    # the overlap join all read it without re-running the 128-mult dot
    # products per row (the same signatures-only-materialisation rule
    # the dedup family follows; spills to disk at scale)
    scored = scored.cache()
    full_top = _topk_two_phase(
        scored.withColumnRenamed("cos_full", "cosine"), _TOP_K, extra_cols=[]
    )
    pref_top = _topk_two_phase(
        scored.withColumnRenamed("cos_prefix", "cosine"), _TOP_K, extra_cols=[]
    )
    overlap = (
        full_top.select("query_id", "neighbor_id")
        .join(pref_top.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )
    return (
        _ranked_lists(full_top, "full_top")
        .join(_ranked_lists(pref_top, "prefix_top"), "query_id")
        .join(overlap, "query_id", "left")
        .select(
            "query_id",
            "full_top",
            "prefix_top",
            F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
        )
    )


_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
         CAST(embedding[1:{_PREFIX_D}] AS DOUBLE[]) AS pvec,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))
           AS nrm,
         sqrt(list_sum(list_transform(CAST(embedding[1:{_PREFIX_D}] AS DOUBLE[]),
                                      x -> x * x))) AS pnrm
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, vec AS qvec, pvec AS qpvec,
             nrm AS qnrm, pnrm AS qpnrm
      FROM e WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         CASE WHEN e.nrm = 0 OR q.qnrm = 0 THEN 0.0 ELSE
           round(list_sum(list_transform(range(1, 65), i -> e.vec[i] * q.qvec[i]))
                 / (e.nrm * q.qnrm), 4) END AS cos_full,
         CASE WHEN e.pnrm = 0 OR q.qpnrm = 0 THEN 0.0 ELSE
           round(list_sum(list_transform(range(1, {_PREFIX_D} + 1),
                                         i -> e.pvec[i] * q.qpvec[i]))
                 / (e.pnrm * q.qpnrm), 4) END AS cos_prefix
  FROM e JOIN q ON e.vec_id <> q.query_id
),
full_top AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cos_full DESC, neighbor_id) AS INT) AS rank
    FROM scored
  ) WHERE rank <= {_TOP_K}
),
pref_top AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cos_prefix DESC, neighbor_id) AS INT) AS rank
    FROM scored
  ) WHERE rank <= {_TOP_K}
)
SELECT f.query_id, f.full_top, p.prefix_top,
       CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap
FROM (SELECT query_id, string_agg(CAST(neighbor_id AS VARCHAR), ',' ORDER BY rank)
        AS full_top FROM full_top GROUP BY query_id) f
JOIN (SELECT query_id, string_agg(CAST(neighbor_id AS VARCHAR), ',' ORDER BY rank)
        AS prefix_top FROM pref_top GROUP BY query_id) p USING (query_id)
LEFT JOIN (SELECT f2.query_id, count(*) AS n_overlap
           FROM full_top f2 JOIN pref_top p2
             ON f2.query_id = p2.query_id AND f2.neighbor_id = p2.neighbor_id
           GROUP BY f2.query_id) o USING (query_id)
"""

QUERIES = {
    "ann_matryoshka_prefix": QuerySpec(ann_matryoshka_prefix, _ORACLE),
}
