"""DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
Optimizing Data Mixtures Speeds Up Language Model Pretraining"),
composed on the discovered document clusters: the step that turns
``cluster_docs_hashed_tf``'s unsupervised domains into a new training
MIXTURE.

The reference has no corpus surface (span-log analytics only) —
north-star scope; this is the composition VERDICT r8 item 5 names:
cluster assignment -> per-domain multiplicative-weights update ->
quota sampling on the ``mix_q`` machinery, one gated query whose
digest proves the whole chain (the ``pipeline_dedup_then_cut``
pattern).

DoReMi's update: alpha_k proportional to u_k * exp(eta * excess_k),
where u_k is the baseline share and excess_k the proxy-vs-reference
excess loss on domain k. No proxy model runs inside the engine, so
excess loss is SYNTHETIC-DETERMINISTIC, and it is *defined in its
exponentiated form* to keep the update integer-exact cross-engine:

    boost_k = (1000 + (sum of n_chars in k) mod 1000) / 1000
    (i.e. excess_k = ln(boost_k) / eta, reported at 4dp)
    w_k = n_k * (1000 + m_k)        -- exact int64, = u_k*exp(eta*excess)*1000*N

A real DoReMi run swaps the (cell, boost) table for measured losses;
nothing downstream changes.

Quotas realise the new mixture exactly (the ``mix_sources_to_target``
device) with the float lambda eliminated: the largest corpus with
proportions alpha has quota_k = floor(min_j(n_j/alpha_j) * alpha_k) =
min_j((n_j * w_k) div w_j) — floor commutes with min, so the whole
quota computation is integer division, immune to the 1-ulp
floor-boundary risk the exp/double path would carry. Documents are
drawn per cluster in md5(doc_id) order (content-hash order:
coordination-free, reproducible), and the sampled-id digest proves the
SELECTION cross-engine, not just its size.

100 TB design: clustering is the cluster_docs_q plan (broadcast
centroids, map-side argmin); the stats/weights table is K rows (tiny,
broadcast); the K x K quota min is over that K-row table, never the
corpus; sampling is one window per cluster. Envelope: the integer
quota product n_j * w_k stays under 2^63 while n^2 * 2000 < 2^63
(n < ~2^26 docs per job partition of the mixture); past that, divide
the w_k by their GCD (they share the construction factor) or fall
back to the mix_q double-lambda path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import QuerySpec, load
from .cluster_docs_q import FEATURE_CTES, assign_doc_clusters
from .similarity_q import _km_cte_chain


def domain_reweight_doremi(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    assigned = assign_doc_clusters(d).join(
        d.select("doc_id", "n_chars"), "doc_id"
    )
    stats = assigned.groupBy("cell").agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_chars") % 1000).alias("m"),
    )
    w = stats.select(
        "cell",
        "n_docs",
        "m",
        (F.col("n_docs") * (F.col("m") + 1000)).alias("w_int"),
    )
    # K x K quota min over the K-row weights table (broadcast; K is the
    # cluster count, never the corpus)
    other = F.broadcast(
        w.select(
            F.col("n_docs").alias("n_j"), F.col("w_int").alias("w_j")
        )
    )
    quota = (
        w.crossJoin(other)
        .groupBy("cell", "n_docs", "m", "w_int")
        .agg(
            F.min(F.expr("(n_j * w_int) div w_j")).cast("long").alias("n_quota")
        )
    )
    total_w = w.agg(F.sum("w_int").alias("w_total"))
    ranked = assigned.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("cell").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        ),
    )
    sampled = (
        ranked.join(F.broadcast(quota.select("cell", "n_quota")), "cell")
        .where(F.col("rn") <= F.col("n_quota"))
        .groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list("doc_id")),
                        lambda v: v.cast("string"),
                    ),
                )
            ).alias("sampled_digest"),
        )
    )
    return (
        quota.crossJoin(F.broadcast(total_w))
        .join(sampled, "cell")
        .select(
            "cell",
            F.col("n_docs").cast("long").alias("n_docs"),
            # the synthetic excess loss, reported in DoReMi's units
            F.round(F.log((F.col("m") + 1000) / 1000.0), 4).alias("excess_loss"),
            F.round(F.col("w_int") / F.col("w_total"), 4).alias("alpha"),
            "n_sampled",
            "sampled_digest",
        )
        .orderBy("cell")
    )


def _doremi_sql() -> str:
    km_ctes, _ = _km_cte_chain("SELECT vec_id, vec FROM corpus0")
    return (
        "WITH "
        + ",\n".join(FEATURE_CTES + km_ctes)
        + """,
assigned AS (
  SELECT f.vec_id AS doc_id, f.cell, d.n_chars
  FROM finaln f JOIN documents d ON d.doc_id = f.vec_id
),
stats AS (
  SELECT cell, count(*) AS n_docs, sum(n_chars) % 1000 AS m
  FROM assigned GROUP BY cell
),
w AS (
  SELECT cell, n_docs, m, n_docs * (m + 1000) AS w_int FROM stats
),
quota AS (
  SELECT a.cell, a.n_docs, a.m, a.w_int,
         CAST(min((b.n_docs * a.w_int) // b.w_int) AS BIGINT) AS n_quota
  FROM w a CROSS JOIN w b
  GROUP BY a.cell, a.n_docs, a.m, a.w_int
),
tw AS (SELECT sum(w_int) AS w_total FROM w),
ranked AS (
  SELECT a.cell, a.doc_id,
         row_number() OVER (PARTITION BY a.cell
                            ORDER BY md5(CAST(a.doc_id AS VARCHAR)), a.doc_id)
           AS rn
  FROM assigned a
),
sampled AS (
  SELECT r.cell,
         CAST(count(*) AS BIGINT) AS n_sampled,
         md5(array_to_string(
               list(CAST(r.doc_id AS VARCHAR) ORDER BY r.doc_id), ','))
           AS sampled_digest
  FROM ranked r JOIN quota q ON q.cell = r.cell
  WHERE r.rn <= q.n_quota
  GROUP BY r.cell
)
SELECT q.cell,
       CAST(q.n_docs AS BIGINT) AS n_docs,
       round(ln((q.m + 1000) / CAST(1000 AS DOUBLE)), 4) AS excess_loss,
       round(q.w_int / CAST(tw.w_total AS DOUBLE), 4) AS alpha,
       s.n_sampled,
       s.sampled_digest
FROM quota q CROSS JOIN tw JOIN sampled s ON s.cell = q.cell
ORDER BY q.cell
"""
    )


QUERIES = {
    "domain_reweight_doremi": QuerySpec(domain_reweight_doremi, _doremi_sql()),
}
