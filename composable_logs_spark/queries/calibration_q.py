"""Classifier calibration (reliability bins) — the third leg of the
learned-filter evaluation family: ``text_quality_classifier`` trains
and scores, ``text_classifier_auc`` measures ranking quality, and this
operator measures whether the SCORES MEAN what they say: group examples
into fixed-width bins of the per-feature mean logit and report each
bin's observed positive rate. A well-calibrated filter's rate rises
with the bin; a filter that ranks well but is miscalibrated (common
with naive Bayes' independence double-counting) shows saturated rates
— the number a pipeline needs before turning a score into a keep/drop
THRESHOLD. Reference: no evaluation surface (north-star scope).

Exactness: the binned statistic is the integer mean logit
(``logit_micro div n_feats``), binned by a SHIFTED non-negative
integer division (Spark ``div`` truncates toward zero while floor is
wanted — shifting by 1000 nats makes the dividend provably
non-negative, where the two definitions coincide in both engines),
then clamped to [-8, +8] one-nat-wide bins (_CLAMP / _BIN_MICRO).
Rates are integer milli.

100 TB shape: scoring is the classifier's broadcast join; this adds
ONE map-side-combinable groupBy on an 11-value key. Nothing here
scales with anything but the example count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from .text_classifier_q import _SCORED_CTES, scored_examples

_BIN_MICRO = 1_000_000  # one nat per bin
_SHIFT = 1_000_000_000  # 1000 nats: mean logits provably above -1000
_CLAMP = 8


def classifier_calibration(spark: SparkSession, sf: str) -> DataFrame:
    s = scored_examples(spark, sf)
    bin_expr = F.expr(
        f"greatest(-{_CLAMP}, least({_CLAMP},"
        f" (logit_micro div n_feats + {_SHIFT}) div {_BIN_MICRO}"
        f" - {_SHIFT // _BIN_MICRO}))"
    )
    return (
        s.withColumn("bin", bin_expr.cast("int"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("is_prose"), 1).otherwise(0)).alias("n_pos"),
        )
        .withColumn("pos_rate_milli", F.expr("(1000 * n_pos) div n"))
        .orderBy("bin")
    )


CALIBRATION_SQL = f"""
WITH {_SCORED_CTES},
binned AS (
  SELECT CAST(greatest(-{_CLAMP}, least({_CLAMP},
           (logit_micro // n_feats + {_SHIFT}) // {_BIN_MICRO}
           - {_SHIFT // _BIN_MICRO})) AS INT) AS bin,
         is_prose
  FROM scored
)
SELECT bin, COUNT(*) AS n,
       CAST(sum(CASE WHEN is_prose THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       (1000 * CAST(sum(CASE WHEN is_prose THEN 1 ELSE 0 END) AS BIGINT))
         // COUNT(*) AS pos_rate_milli
FROM binned GROUP BY bin ORDER BY bin
"""


QUERIES = {
    "classifier_calibration": QuerySpec(classifier_calibration, CALIBRATION_SQL),
}
