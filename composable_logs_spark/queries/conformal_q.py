"""Split-conformal prediction intervals with an empirical coverage
audit (Vovk et al. 2005; Lei et al. 2018 popularised the split
construction): the distribution-free way to attach a finite-sample
guarantee to ANY point predictor — calibrate a nonconformity quantile
on held-out data, then |y - yhat| <= q holds for a fresh point with
probability >= ceil((n+1)(1-α))/(n+1), no matter how wrong the model
is. For a data pipeline this is the monitoring primitive: "the metric
moved outside its conformal band" is an alarm with a real guarantee,
unlike a z-score under an assumed Gaussian.

Construction per event type, α = 0.1:

- hash-split rows into calibration / evaluation halves (md5 parity of
  event_id — the repo's deterministic-split convention, same as
  ``split_no_leakage``);
- predictor: the calibration-half mean (deliberately simple — the
  conformal guarantee is predictor-agnostic, and a trained model would
  only change yhat, not the machinery being verified);
- nonconformity: s = |cents - mean_cents| — integer cents minus one
  shared double, identical IEEE subtraction both engines;
- q = the k-th SMALLEST calibration score with k = ceil(0.9·(n+1))
  (exact order statistic, row_number picks one element; ties broken on
  event_id) — clamped to n so tiny groups degrade to max rather than
  an out-of-range index;
- audit: the fraction of EVAL rows with s <= q, which the theorem says
  lands at ~k/(n+1) >= 0.9 in expectation — reported next to the
  nominal level so the gate hash-proves both the quantile pick and the
  coverage arithmetic.

100 TB shape: the split and scores are one scan; the order statistic is
a per-group window over the CALIBRATION half (groups here are the 5
event types; a deployment with billion-row groups would swap the exact
pick for the repo's mergeable quantile sketch — ``approx_sketch_stats``
— trading the finite-sample constant for a sketch bound); coverage is
one hash-aggregate. Nothing driver-side, nothing broadcast that grows.

Reference anchor: none (north-star scope, SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import QuerySpec, load

_ALPHA_NUM = 9  # coverage level 1-α = 9/10, spelled as integers
_ALPHA_DEN = 10


def conformal_audit(events: DataFrame) -> DataFrame:
    """Per-event-type conformal quantile + eval-half coverage over a
    (event_id, event_type, value) frame — the reusable core."""
    base = events.select(
        "event_id",
        "event_type",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
        (
            F.expr(
                "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15),"
                " 16, 10) AS BIGINT) % 2"
            )
            == 0
        ).alias("is_cal"),
    )
    mean_c = (
        base.where("is_cal")
        .groupBy("event_type")
        .agg(
            (F.sum("cents").cast("double") / F.count("*").cast("double")).alias(
                "mean_cents"
            ),
            F.count("*").alias("n_cal"),
        )
    )
    scored = base.join(F.broadcast(mean_c), "event_type").withColumn(
        "s", F.abs(F.col("cents").cast("double") - F.col("mean_cents"))
    )
    # k = ceil(0.9 * (n_cal + 1)) via integer arithmetic, clamped to n_cal
    kq = mean_c.withColumn(
        "k",
        F.least(
            F.expr(
                f"CAST(({_ALPHA_NUM} * (n_cal + 1) + {_ALPHA_DEN} - 1)"
                f" div {_ALPHA_DEN} AS BIGINT)"
            ),
            F.col("n_cal"),
        ),
    )
    cal_ranked = (
        scored.where("is_cal")
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("event_type").orderBy("s", "event_id")
            ),
        )
        .join(F.broadcast(kq.select("event_type", "k")), "event_type")
        .where(F.col("rk") == F.col("k"))
        .select("event_type", F.col("s").alias("q"))
    )
    cov = (
        scored.where(~F.col("is_cal"))
        .join(F.broadcast(cal_ranked), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_eval"),
            F.sum(F.when(F.col("s") <= F.col("q"), 1).otherwise(0)).alias(
                "n_cov"
            ),
        )
    )
    return (
        kq.join(cal_ranked, "event_type")
        .join(cov, "event_type")
        .select(
            "event_type",
            "n_cal",
            "n_eval",
            F.round(F.col("mean_cents") / 100.0, 4).alias("pred_r"),
            F.round(F.col("q") / 100.0, 4).alias("q_r"),
            F.round(
                F.col("k").cast("double") / (F.col("n_cal") + 1).cast("double"),
                4,
            ).alias("nominal_r"),
            F.round(
                F.col("n_cov").cast("double") / F.col("n_eval").cast("double"),
                4,
            ).alias("coverage_r"),
        )
        .orderBy("event_type")
    )


def events_conformal_audit(spark: SparkSession, sf: str) -> DataFrame:
    return conformal_audit(load(spark, sf, "events"))


CONFORMAL_SQL = f"""
WITH base AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100) AS BIGINT) AS cents,
         (CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15)
               AS BIGINT) % 2) = 0 AS is_cal
  FROM events
),
mean_c AS (
  SELECT event_type,
         CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_cents,
         CAST(count(*) AS BIGINT) AS n_cal
  FROM base WHERE is_cal GROUP BY event_type
),
kq AS (
  SELECT event_type, mean_cents, n_cal,
         least(CAST(({_ALPHA_NUM} * (n_cal + 1) + {_ALPHA_DEN} - 1)
                    // {_ALPHA_DEN} AS BIGINT), n_cal) AS k
  FROM mean_c
),
scored AS (
  SELECT b.event_type, b.event_id, b.is_cal,
         abs(CAST(b.cents AS DOUBLE) - m.mean_cents) AS s
  FROM base b JOIN mean_c m ON m.event_type = b.event_type
),
cal_ranked AS (
  SELECT s.event_type, s.s AS q
  FROM (
    SELECT event_type, s,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY s, event_id) AS rk
    FROM scored WHERE is_cal
  ) s
  JOIN kq ON kq.event_type = s.event_type AND s.rk = kq.k
),
cov AS (
  SELECT s.event_type,
         CAST(count(*) AS BIGINT) AS n_eval,
         CAST(sum(CASE WHEN s.s <= c.q THEN 1 ELSE 0 END) AS BIGINT) AS n_cov
  FROM scored s JOIN cal_ranked c ON c.event_type = s.event_type
  WHERE NOT s.is_cal
  GROUP BY s.event_type
)
SELECT k.event_type, k.n_cal, c2.n_eval,
       round(k.mean_cents / 100.0, 4) AS pred_r,
       round(c.q / 100.0, 4) AS q_r,
       round(CAST(k.k AS DOUBLE) / CAST(k.n_cal + 1 AS DOUBLE), 4)
         AS nominal_r,
       round(CAST(c2.n_cov AS DOUBLE) / CAST(c2.n_eval AS DOUBLE), 4)
         AS coverage_r
FROM kq k
JOIN cal_ranked c ON c.event_type = k.event_type
JOIN cov c2 ON c2.event_type = k.event_type
ORDER BY k.event_type
"""


QUERIES = {
    "events_conformal_audit": QuerySpec(events_conformal_audit, CONFORMAL_SQL),
}
