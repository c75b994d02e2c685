"""Data-drift monitors — the checks an ML data pipeline runs before
trusting a new data window against the one it trained on.

- ``drift_psi_events``: Population Stability Index of the ``value``
  distribution, first half of the month (reference) vs second half
  (current), per event type. PSI = Σ (p_i − q_i)·ln(p_i/q_i) over 10
  equal-width bins; ≥ 0.2 is the conventional "significant drift"
  flag. All bin counts are exact integers from ONE pass over each
  half (map-side combinable); shares and the ln enter only in the
  final projection, so both engines compute bit-identical PSI.
- ``cusum_changepoint_events``: CUSUM change-point detection on daily
  event counts per type. The textbook statistic S_d = Σ_{k≤d}(n_k − μ)
  is kept EXACT by scaling: with D days and total T, D·S_d =
  Σ_{k≤d}(D·n_k − T) is a running sum of integers — no float drift in
  the argmax. The flagged day is argmax |S_d| (the classic estimate of
  where the level shifted); the peak is reported in original units.
  The window partitions by event_type (a |days|-row series per group
  — never a partition-less window).

Scale shape for both: the raw stream reduces to a tiny grid
(types × bins / types × days) in one hash agg; everything after runs
on the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_CUTOFF = "2024-01-16 00:00:00"
_N_BINS = 10
_PSI_FLAG = 0.2


def drift_psi_events(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").select("event_type", "ts", "value")
    bounds = e.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    binned = (
        e.join(F.broadcast(bounds), "event_type")
        .select(
            "event_type",
            (F.col("ts") < _CUTOFF).alias("is_ref"),
            F.least(
                F.lit(_N_BINS - 1),
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / _N_BINS + 1e-12)
                ).cast("int"),
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.col("is_ref").cast("long")).alias("n_ref"),
            F.sum((~F.col("is_ref")).cast("long")).alias("n_cur"),
        )
    )
    tot = binned.groupBy("event_type").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p = F.col("n_ref") / F.col("t_ref")
    q = F.col("n_cur") / F.col("t_cur")
    contrib = F.when(
        (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
        (p - q) * F.log(p / q),
    ).otherwise(F.lit(0.0))
    return (
        binned.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("t_ref").alias("n_ref"),
            F.max("t_cur").alias("n_cur"),
            F.round(F.sum(contrib), 4).alias("psi"),
            F.sum(
                ((F.col("n_ref") == 0) | (F.col("n_cur") == 0)).cast("long")
            ).alias("n_onesided_bins"),
        )
        .withColumn("drifted", F.col("psi") >= _PSI_FLAG)
        .orderBy("event_type")
    )


PSI_SQL = f"""
WITH bounds AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi
  FROM events GROUP BY event_type
),
binned AS (
  SELECT e.event_type,
         least({_N_BINS - 1},
               CAST(floor((e.value - b.lo)
                          / ((b.hi - b.lo) / {_N_BINS} + 1e-12)) AS INT)) AS bin,
         CAST(count(*) FILTER (WHERE e.ts < TIMESTAMP '{_CUTOFF}') AS BIGINT)
           AS n_ref,
         CAST(count(*) FILTER (WHERE e.ts >= TIMESTAMP '{_CUTOFF}') AS BIGINT)
           AS n_cur
  FROM events e JOIN bounds b USING (event_type)
  GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(sum(n_ref) AS BIGINT) AS t_ref,
         CAST(sum(n_cur) AS BIGINT) AS t_cur
  FROM binned GROUP BY event_type
)
SELECT b.event_type,
       max(t.t_ref) AS n_ref,
       max(t.t_cur) AS n_cur,
       round(sum(CASE WHEN b.n_ref > 0 AND b.n_cur > 0
                      THEN (b.n_ref / CAST(t.t_ref AS DOUBLE)
                            - b.n_cur / CAST(t.t_cur AS DOUBLE))
                           * ln((b.n_ref / CAST(t.t_ref AS DOUBLE))
                                / (b.n_cur / CAST(t.t_cur AS DOUBLE)))
                      ELSE 0.0 END), 4) AS psi,
       CAST(count(*) FILTER (WHERE b.n_ref = 0 OR b.n_cur = 0) AS BIGINT)
         AS n_onesided_bins,
       round(sum(CASE WHEN b.n_ref > 0 AND b.n_cur > 0
                      THEN (b.n_ref / CAST(t.t_ref AS DOUBLE)
                            - b.n_cur / CAST(t.t_cur AS DOUBLE))
                           * ln((b.n_ref / CAST(t.t_ref AS DOUBLE))
                                / (b.n_cur / CAST(t.t_cur AS DOUBLE)))
                      ELSE 0.0 END), 4) >= {_PSI_FLAG} AS drifted
FROM binned b JOIN tot t USING (event_type)
GROUP BY b.event_type
ORDER BY b.event_type
"""


# ---------------------------------------------------------------------------
def cusum_changepoint_events(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load(spark, sf, "events")
    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count("*").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("d"), F.sum("n").alias("t")
    )
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    scaled = (
        daily.join(F.broadcast(stats), "event_type")
        # D*n_k - T summed exactly in integers (clears the mean's
        # denominator); |S_d| maximised on the exact value
        .withColumn(
            "cusum_scaled",
            F.sum(F.col("d") * F.col("n") - F.col("t")).over(w),
        )
    )
    ranked = scaled.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(
                F.abs("cusum_scaled").desc(), "day"
            )
        ),
    )
    # round(cusum_scaled/d, 2) via the exact integer half-step (same
    # pattern as mv_q's avg4 / relational._money2): round() on the raw
    # double ratio ties HALF_UP on Spark's shortest-decimal repr vs
    # DuckDB's binary double whenever the ratio lands near .xx5.
    # Doubled form (200x + d) div (2d) == floor(100x/d + 1/2) exactly,
    # odd or even d; decimal cast keeps the *200 within range when the
    # cumulative sum reaches i64-scale magnitudes.
    peak = F.expr(
        "(CASE WHEN cusum_scaled < 0 THEN -1 ELSE 1 END)"
        " * CAST((CAST(abs(cusum_scaled) AS DECIMAL(38,0)) * 200 + d)"
        "        div (d * 2) AS BIGINT)"
        " / CAST(100 AS DOUBLE)"
    )
    return (
        ranked.where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            peak.alias("cusum_peak"),
            "d",
        )
        .orderBy("event_type")
    )


CUSUM_SQL = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS d,
         CAST(sum(n) AS BIGINT) AS t
  FROM daily GROUP BY event_type
),
scaled AS (
  SELECT dy.event_type, dy.day, s.d,
         CAST(sum(s.d * dy.n - s.t)
              OVER (PARTITION BY dy.event_type ORDER BY dy.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cusum_scaled
  FROM daily dy JOIN stats s USING (event_type)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY abs(cusum_scaled) DESC, day) AS rk
  FROM scaled
)
SELECT event_type, day AS changepoint_day,
       (CASE WHEN cusum_scaled < 0 THEN -1 ELSE 1 END)
       * ((abs(cusum_scaled)::HUGEINT * 200 + d) // (d * 2)) / 100.0
         AS cusum_peak, d
FROM ranked WHERE rk = 1 ORDER BY event_type
"""


QUERIES = {
    "drift_psi_events": QuerySpec(drift_psi_events, PSI_SQL),
    "cusum_changepoint_events": QuerySpec(
        cusum_changepoint_events, CUSUM_SQL
    ),
}
