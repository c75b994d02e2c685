"""Classifier evaluation: exact AUC (Mann-Whitney U) over the learned
quality classifier's logits — the number that decides whether a trained
filter is good enough to gate a corpus, computed distributed WITHOUT a
global sort.

``text_quality_classifier`` trains and scores; a pipeline operator
needs the ranking quality of those scores against the planted labels.
AUC = P(score_pos > score_neg) + 0.5 * P(tie) over all pos x neg pairs
— equivalently the normalized Mann-Whitney U statistic. The reference
has no evaluation surface (north-star scope; its span log records pass/
fail only, opentelemetry_helpers.py:365-491).

Exactness: ranking key is the UNnormalized integer logit
(``logit_micro``), so every comparison is exact int64 — no mean, no
division, no rounding anywhere before the final one-row output. 2U is
accumulated (twice the U statistic) so tie contributions (0.5 each)
stay integral.

100 TB design — the hierarchical prefix-sum, never a global sort:

1. histogram: groupBy(logit) -> (n_pos, n_neg); map-side combinable,
   output bounded by |distinct logits| (score resolution, not corpus
   size).
2. coarse level: logits shifted non-negative (broadcast 1-row min) and
   bucketed to whole nats (1e6 micro) -> a few-hundred-row relation;
   cumulative negatives-below via broadcast inequality self-join (the
   ``hll_cumulative_users`` truth pattern — NOT a partition-less
   window).
3. fine level: within each coarse bucket, a window PARTITIONED BY the
   bucket (bounded partitions) accumulates the remainder.
4. 2U = sum over logits of n_pos * (2 * negatives_below + ties); one
   final 1-row agg.

A partition-less window over the histogram would funnel every distinct
score through one reducer — the exact shape ``tests/test_plan_audit``
rejects; the two-level split keeps the only ordered scan inside bounded
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import QuerySpec
from .text_classifier_q import _SCORED_CTES, scored_examples

_COARSE_MICRO = 1_000_000  # one whole nat per coarse bucket


def text_classifier_auc(spark: SparkSession, sf: str) -> DataFrame:
    s = scored_examples(spark, sf).select("is_prose", "logit_micro")
    hist = s.groupBy("logit_micro").agg(
        F.sum(F.when(F.col("is_prose"), 1).otherwise(0)).alias("p"),
        F.sum(F.when(F.col("is_prose"), 0).otherwise(1)).alias("m"),
    )
    # shift logits non-negative so integer `div` is a true floor on both
    # engines (Spark `div` truncates toward zero, DuckDB `//` floors —
    # they only agree on non-negatives)
    lo = hist.agg(F.min("logit_micro").alias("lo"))
    hist = hist.crossJoin(F.broadcast(lo)).select(
        (F.col("logit_micro") - F.col("lo")).alias("s2"), "p", "m"
    )
    hist = hist.withColumn("c", F.expr(f"s2 div {_COARSE_MICRO}"))
    # coarse cumulative: negatives in strictly-lower coarse buckets,
    # via a broadcast inequality join over the few-hundred-row coarse agg
    coarse = hist.groupBy("c").agg(F.sum("m").alias("mc"))
    below = (
        coarse.alias("a")
        .join(
            F.broadcast(coarse.alias("b")), F.col("b.c") < F.col("a.c"), "left"
        )
        .groupBy(F.col("a.c").alias("c"))
        .agg(F.coalesce(F.sum("b.mc"), F.lit(0)).alias("m_coarse_below"))
    )
    # fine cumulative: negatives below WITHIN the coarse bucket — the
    # window is partitioned (bounded by bucket occupancy), never global
    w_fine = W.partitionBy("c").orderBy("s2").rowsBetween(
        W.unboundedPreceding, -1
    )
    fine = hist.withColumn(
        "m_fine_below", F.coalesce(F.sum("m").over(w_fine), F.lit(0))
    )
    joined = fine.join(F.broadcast(below), "c")
    return (
        joined.agg(
            F.sum("p").cast("long").alias("n_pos"),
            F.sum("m").cast("long").alias("n_neg"),
            F.sum(
                F.col("p")
                * (2 * (F.col("m_coarse_below") + F.col("m_fine_below")) + F.col("m"))
            ).alias("u2"),
        )
        .select(
            "n_pos",
            "n_neg",
            "u2",
            F.round(
                F.col("u2") / (2.0 * F.col("n_pos") * F.col("n_neg")), 6
            ).alias("auc"),
        )
    )


# oracle: same scored CTE chain, then the textbook rank-free formula —
# DuckDB may use the unrestricted window the Spark plan must avoid
AUC_SQL = f"""
WITH {_SCORED_CTES},
hist AS (
  SELECT logit_micro,
         sum(CASE WHEN is_prose THEN 1 ELSE 0 END) AS p,
         sum(CASE WHEN is_prose THEN 0 ELSE 1 END) AS m
  FROM scored GROUP BY logit_micro
),
cum AS (
  SELECT p, m,
         coalesce(sum(m) OVER (ORDER BY logit_micro
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS m_below
  FROM hist
)
SELECT CAST(sum(p) AS BIGINT) AS n_pos,
       CAST(sum(m) AS BIGINT) AS n_neg,
       CAST(sum(p * (2 * m_below + m)) AS BIGINT) AS u2,
       round(sum(p * (2 * m_below + m)) / (2.0 * sum(p) * sum(m)), 6) AS auc
FROM cum
"""


QUERIES = {
    "text_classifier_auc": QuerySpec(text_classifier_auc, AUC_SQL),
}
