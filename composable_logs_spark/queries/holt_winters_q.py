"""Holt-Winters ADDITIVE seasonal smoothing (Winters 1960) per
event-type daily series — the third rung of the forecasting ladder
(global OLS line -> Holt level+trend -> level+trend+seasonal), and the
smoother that actually fits operational traffic, which is weekly-
periodic almost by definition.

    lvl_t = α·(y_t - s_{t-m}) + (1-α)·(lvl_{t-1} + trd_{t-1})
    trd_t = β·(lvl_t - lvl_{t-1}) + (1-β)·trd_{t-1}
    s_t   = γ·(y_t - lvl_t) + (1-γ)·s_{t-m}          (m = 7)

Cross-engine exactness extends ``holt_q``'s recipe (integer-cent daily
sums so input order can't perturb doubles; α=0.5, β=γ=0.25 exact binary
fractions; identical IEEE expression trees both sides) with one new
element: the seasonal state is a ROTATING QUEUE of the last m seasonal
values, advanced with pure slice+concat —

    seas' = concat(slice(seas, 2, m-1), array(s_t))

so Spark's ``aggregate`` lambda and DuckDB's recursive CTE step the
exact same array ops (``seas[2:] || [s_t]``) and ``element_at(seas, 1)``
/ ``seas[1]`` is always the phase-(t-m) value. No index arithmetic, no
engine-specific list mutation.

Initialisation (classic): lvl₀ = mean of the first m observations
(integer-cent sum, ONE division by ``100·m`` spelled identically),
trd₀ = 0, s_i = y_i - lvl₀ for the first m points; the fold consumes
points m+1..T. Keys need ≥ 2m days (mirrored HAVING both sides).

Seasonality is POSITION-based (rn mod m), which equals day-of-week
exactly when the daily series is gap-free — true for this events table;
a gapped deployment would compose ``gapfill_hourly_locf`` first (the
composition is the point of having both operators).

Output: h = 1..m ahead forecasts, lvl + h·trd + s_{T+h-m}, one row per
(event_type, h) — the queue's h-th slot IS the phase of day T+h.

100 TB shape: identical to ``ts_holt_linear`` — one hash-aggregate to
days (the only corpus-sized step), then an independent per-key fold
whose state is 2 doubles + an m-array; series length is
calendar-bounded, not corpus-bounded.

Reference anchor: none (north-star scope, SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_ALPHA = "0.5"
_BETA = "0.25"
_GAMMA = "0.25"
_M = 7  # weekly season


def hw_fold_expr(arr: str, init_lvl: str, init_trd: str, init_seas: str) -> str:
    """The Holt-Winters recurrence as a JVM-side ``aggregate`` fold over
    an array of ``(day, y)`` structs (y in integer cents). The lambda
    cannot name lvl_t, so trd_t and s_t recompute its expression —
    bit-identical to computing it once (same IEEE ops, same order)."""
    lvl_t = (
        f"{_ALPHA} * ((CAST(x.y AS DOUBLE) / 100.0)"
        f" - element_at(acc.seas, 1))"
        f" + (1.0 - {_ALPHA}) * (acc.lvl + acc.trd)"
    )
    s_t = (
        f"{_GAMMA} * ((CAST(x.y AS DOUBLE) / 100.0) - ({lvl_t}))"
        f" + (1.0 - {_GAMMA}) * element_at(acc.seas, 1)"
    )
    return f"""aggregate(
  {arr},
  named_struct('lvl', {init_lvl}, 'trd', {init_trd}, 'seas', {init_seas}),
  (acc, x) -> named_struct(
    'lvl', {lvl_t},
    'trd', {_BETA} * (({lvl_t}) - acc.lvl) + (1.0 - {_BETA}) * acc.trd,
    'seas', concat(slice(acc.seas, 2, {_M} - 1), array({s_t}))),
  acc -> acc)"""


def hw_over_daily(daily: DataFrame) -> DataFrame:
    """Holt-Winters over a (event_type, day, y) integer-cent daily frame
    — the reusable core; the registered query binds it to the events
    table's daily sums."""
    series = (
        daily.groupBy("event_type")
        .agg(
            F.sort_array(F.collect_list(F.struct("day", "y"))).alias("s"),
            F.count("*").alias("n_days"),
            F.max("day").alias("last_day"),
        )
        .where(F.col("n_days") >= 2 * _M)
    )
    # named init columns OUTSIDE the lambda (engines may name
    # intermediates freely — only in-lambda naming is restricted)
    init = series.select(
        "event_type",
        "n_days",
        "last_day",
        "s",
        F.expr(
            f"CAST(aggregate(slice(s, 1, {_M}), CAST(0 AS BIGINT),"
            f" (a, x) -> a + x.y) AS DOUBLE) / {100 * _M}.0"
        ).alias("lvl0"),
    ).withColumn(
        "seas0",
        F.expr(f"transform(slice(s, 1, {_M}), x -> CAST(x.y AS DOUBLE) / 100.0 - lvl0)"),
    )
    folded = init.select(
        "event_type",
        "n_days",
        "last_day",
        F.expr(
            hw_fold_expr(
                f"slice(s, {_M} + 1, size(s) - {_M})",
                "lvl0",
                "CAST(0.0 AS DOUBLE)",
                "seas0",
            )
        ).alias("st"),
    )
    h = folded.select(
        "event_type",
        "n_days",
        "last_day",
        F.col("st.lvl").alias("lvl"),
        F.col("st.trd").alias("trd"),
        F.col("st.seas").alias("seas"),
        F.explode(F.expr(f"sequence(1, {_M})")).alias("h"),
    )
    return (
        h.select(
            "event_type",
            F.col("h").cast("int").alias("h"),
            "n_days",
            "last_day",
            F.round("lvl", 4).alias("level_r"),
            F.round("trd", 4).alias("trend_r"),
            F.round(F.expr("element_at(seas, h)"), 4).alias("seasonal_r"),
            F.round(
                F.expr("lvl + CAST(h AS DOUBLE) * trd + element_at(seas, h)"), 4
            ).alias("forecast_r"),
        )
        .orderBy("event_type", "h")
    )


def ts_holt_winters(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    daily = (
        e.select(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("y"))
    )
    return hw_over_daily(daily)


HW_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events
  GROUP BY 1, 2
),
ordered AS (
  SELECT event_type, day, y,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM daily
),
bounds AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days, max(day) AS last_day
  FROM ordered GROUP BY 1
  HAVING count(*) >= {2 * _M}
),
init AS (
  SELECT o.event_type,
         CAST(sum(o.y) AS DOUBLE) / {100 * _M}.0 AS lvl0
  FROM ordered o JOIN bounds b ON b.event_type = o.event_type
  WHERE o.rn <= {_M}
  GROUP BY o.event_type
),
seas_init AS (
  SELECT o.event_type, i.lvl0,
         list(CAST(o.y AS DOUBLE) / 100.0 - i.lvl0 ORDER BY o.rn) AS seas0
  FROM ordered o JOIN init i ON i.event_type = o.event_type
  WHERE o.rn <= {_M}
  GROUP BY o.event_type, i.lvl0
),
fold AS (
  SELECT event_type, CAST({_M} AS BIGINT) AS rn,
         lvl0 AS lvl, CAST(0.0 AS DOUBLE) AS trd, seas0 AS seas
  FROM seas_init
  UNION ALL
  SELECT o.event_type, o.rn,
         {_ALPHA} * ((CAST(o.y AS DOUBLE) / 100.0) - f.seas[1])
           + (1.0 - {_ALPHA}) * (f.lvl + f.trd) AS lvl,
         {_BETA} * (({_ALPHA} * ((CAST(o.y AS DOUBLE) / 100.0) - f.seas[1])
           + (1.0 - {_ALPHA}) * (f.lvl + f.trd)) - f.lvl)
           + (1.0 - {_BETA}) * f.trd AS trd,
         f.seas[2:] || [{_GAMMA} * ((CAST(o.y AS DOUBLE) / 100.0)
           - ({_ALPHA} * ((CAST(o.y AS DOUBLE) / 100.0) - f.seas[1])
              + (1.0 - {_ALPHA}) * (f.lvl + f.trd)))
           + (1.0 - {_GAMMA}) * f.seas[1]] AS seas
  FROM fold f
  JOIN ordered o ON o.event_type = f.event_type AND o.rn = f.rn + 1
),
final AS (
  SELECT b.event_type, b.n_days, b.last_day, f.lvl, f.trd, f.seas
  FROM fold f
  JOIN bounds b ON b.event_type = f.event_type AND f.rn = b.n_days
),
hs AS (SELECT unnest(generate_series(1, {_M})) AS h)
SELECT final.event_type,
       CAST(hs.h AS INT) AS h,
       final.n_days, final.last_day,
       round(final.lvl, 4) AS level_r,
       round(final.trd, 4) AS trend_r,
       round(final.seas[hs.h], 4) AS seasonal_r,
       round(final.lvl + CAST(hs.h AS DOUBLE) * final.trd
             + final.seas[hs.h], 4) AS forecast_r
FROM final CROSS JOIN hs
ORDER BY final.event_type, hs.h
"""


QUERIES = {
    "ts_holt_winters": QuerySpec(ts_holt_winters, HW_SQL),
}
