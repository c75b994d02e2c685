"""Per-group classifier evaluation (worst-group AUC) — the robustness
report a filter needs before gating a MULTILINGUAL corpus: a single
global AUC (``text_classifier_auc``) can hide a language on which the
filter is no better than chance, and the worst GROUP, not the average,
is what Group-DRO-style data work optimizes. Reference: no evaluation
surface (north-star scope).

Same exact Mann-Whitney arithmetic as the global AUC (integer 2U from
a (group, logit) histogram), but the cumulative-negatives scan runs in
a window PARTITIONED BY the group — bounded partitions (one language's
distinct logits), so this is plan-audit-clean where a global
partition-less window would not be; the global query's two-level
prefix-sum trick is unnecessary here precisely because the group key
provides the partitioning.

Every example maps to its source document (ex_id div 2 — the planted
negative shares its positive's doc), so groups come from the
documents.lang column. Output: one row per language with exact integer
(n_pos, n_neg, u2) and the rounded AUC, plus is_worst — computed on
the ROUNDED value via a broadcast 1-row min, identical in both
engines.

100 TB shape: the histogram is groupBy(lang, logit) — map-side
combinable, bounded by groups x score resolution, not corpus size;
everything downstream is group-count-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import QuerySpec, load
from .text_classifier_q import _SCORED_CTES, scored_examples


def classifier_group_auc(spark: SparkSession, sf: str) -> DataFrame:
    s = scored_examples(spark, sf).withColumn("doc_id", F.expr("ex_id div 2"))
    langs = load(spark, sf, "documents").select("doc_id", "lang")
    hist = (
        s.join(langs, "doc_id")
        .groupBy("lang", "logit_micro")
        .agg(
            F.sum(F.when(F.col("is_prose"), 1).otherwise(0)).alias("p"),
            F.sum(F.when(F.col("is_prose"), 0).otherwise(1)).alias("m"),
        )
    )
    w = (
        W.partitionBy("lang")
        .orderBy("logit_micro")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = hist.withColumn("m_below", F.coalesce(F.sum("m").over(w), F.lit(0)))
    g = cum.groupBy("lang").agg(
        F.sum("p").alias("n_pos"),
        F.sum("m").alias("n_neg"),
        F.sum(F.expr("p * (2 * m_below + m)")).alias("u2"),
    ).withColumn(
        "auc",
        F.round(F.col("u2") / (2.0 * F.col("n_pos") * F.col("n_neg")), 6),
    )
    worst = g.agg(F.min("auc").alias("worst_auc"))
    return (
        g.crossJoin(F.broadcast(worst))
        .select(
            "lang",
            "n_pos",
            "n_neg",
            "u2",
            "auc",
            (F.col("auc") == F.col("worst_auc")).alias("is_worst"),
        )
        .orderBy("lang")
    )


GROUP_AUC_SQL = f"""
WITH {_SCORED_CTES},
grouped AS (
  SELECT s.ex_id // 2 AS doc_id, s.is_prose, s.logit_micro, d.lang
  FROM scored s JOIN documents d ON d.doc_id = s.ex_id // 2
),
hist AS (
  SELECT lang, logit_micro,
         sum(CASE WHEN is_prose THEN 1 ELSE 0 END) AS p,
         sum(CASE WHEN is_prose THEN 0 ELSE 1 END) AS m
  FROM grouped GROUP BY lang, logit_micro
),
cum AS (
  SELECT lang, p, m,
         coalesce(sum(m) OVER (PARTITION BY lang ORDER BY logit_micro
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS m_below
  FROM hist
),
g AS (
  SELECT lang,
         CAST(sum(p) AS BIGINT) AS n_pos,
         CAST(sum(m) AS BIGINT) AS n_neg,
         CAST(sum(p * (2 * m_below + m)) AS BIGINT) AS u2,
         round(sum(p * (2 * m_below + m))
               / (2.0 * sum(p) * sum(m)), 6) AS auc
  FROM cum GROUP BY lang
),
worst AS (SELECT min(auc) AS worst_auc FROM g)
SELECT lang, n_pos, n_neg, u2, auc, auc = w.worst_auc AS is_worst
FROM g CROSS JOIN worst w
ORDER BY lang
"""


QUERIES = {
    "classifier_group_auc": QuerySpec(classifier_group_auc, GROUP_AUC_SQL),
}
