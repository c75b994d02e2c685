"""Classifier precision/recall curve — the fourth leg of the learned-
filter evaluation family: ``text_quality_classifier`` trains and
scores, ``text_classifier_auc`` measures ranking quality,
``classifier_calibration`` checks that scores mean what they say, and
this operator answers the question a pipeline actually acts on: AT
WHICH THRESHOLD, and what does each choice cost? One row per candidate
keep/drop threshold with exact (tp, fp, fn) and integer-milli
precision / recall / F1 — the table a data engineer reads to pick the
gate for a corpus filter. Reference: no evaluation surface
(north-star scope).

Thresholds sweep the calibration query's one-nat grid over the same
statistic (the integer per-feature mean logit, ``logit_micro div
n_feats`` — the proven cross-engine expression), predicting positive
at score >= t nats for t in [-8, +8].

Exactness: every count is an exact int64 conditional sum over the
SCORE HISTOGRAM; ratios are integer-milli divisions with
``nullif(0)`` guards (an empty predicted-positive set yields NULL
precision identically on both engines), so no float enters before the
output.

100 TB shape: the corpus-linear work is ONE map-side-combinable
groupBy(score) histogram (bounded by score resolution, not example
count); the 17-row threshold grid cross-joins the HISTOGRAM, never the
examples, and the final agg is 17 groups. No window anywhere — unlike
the AUC's cumulative scan, a threshold sweep needs only conditional
sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from .text_classifier_q import _SCORED_CTES, scored_examples

_T_LO, _T_HI = -8, 8  # one-nat grid, the calibration query's clamp range


def classifier_pr_curve(spark: SparkSession, sf: str) -> DataFrame:
    s = scored_examples(spark, sf)
    hist = (
        s.select(F.expr("logit_micro div n_feats").alias("score"), "is_prose")
        .groupBy("score")
        .agg(
            F.sum(F.when(F.col("is_prose"), 1).otherwise(0)).alias("p"),
            F.sum(F.when(F.col("is_prose"), 0).otherwise(1)).alias("m"),
        )
    )
    thr = spark.range(_T_LO, _T_HI + 1).select(F.col("id").cast("int").alias("t_nat"))
    predicted = F.col("score") >= F.col("t_nat").cast("long") * 1_000_000
    agg = (
        hist.crossJoin(F.broadcast(thr))
        .groupBy("t_nat")
        .agg(
            F.sum(F.when(predicted, F.col("p")).otherwise(0)).cast("long").alias("tp"),
            F.sum(F.when(predicted, F.col("m")).otherwise(0)).cast("long").alias("fp"),
            F.sum("p").cast("long").alias("n_pos"),
        )
    )
    return agg.select(
        "t_nat",
        "tp",
        "fp",
        (F.col("n_pos") - F.col("tp")).alias("fn"),
        F.expr("(1000 * tp) div nullif(tp + fp, 0)").alias("precision_milli"),
        F.expr("(1000 * tp) div n_pos").alias("recall_milli"),
        F.expr(
            "(2000 * tp) div nullif(2 * tp + fp + (n_pos - tp), 0)"
        ).alias("f1_milli"),
    ).orderBy("t_nat")


PR_CURVE_SQL = f"""
WITH {_SCORED_CTES},
hist AS (
  SELECT logit_micro // n_feats AS score,
         sum(CASE WHEN is_prose THEN 1 ELSE 0 END) AS p,
         sum(CASE WHEN is_prose THEN 0 ELSE 1 END) AS m
  FROM scored GROUP BY 1
),
agg AS (
  SELECT t.t_nat,
         CAST(sum(CASE WHEN score >= t.t_nat * 1000000 THEN p ELSE 0 END)
              AS BIGINT) AS tp,
         CAST(sum(CASE WHEN score >= t.t_nat * 1000000 THEN m ELSE 0 END)
              AS BIGINT) AS fp,
         CAST(sum(p) AS BIGINT) AS n_pos
  FROM hist CROSS JOIN range({_T_LO}, {_T_HI + 1}) t(t_nat)
  GROUP BY t.t_nat
)
SELECT CAST(t_nat AS INT) AS t_nat, tp, fp,
       n_pos - tp AS fn,
       (1000 * tp) // nullif(tp + fp, 0) AS precision_milli,
       (1000 * tp) // n_pos AS recall_milli,
       (2000 * tp) // nullif(2 * tp + fp + (n_pos - tp), 0) AS f1_milli
FROM agg
ORDER BY t_nat
"""


QUERIES = {
    "classifier_pr_curve": QuerySpec(classifier_pr_curve, PR_CURVE_SQL),
}
