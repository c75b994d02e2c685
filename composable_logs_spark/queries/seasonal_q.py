"""Seasonal-baseline anomaly detection: hour-of-day profile with
3-sigma residual flagging.

Complements ``session_q.events_rate_anomaly`` (trailing-24h z-score —
a LOCAL baseline that adapts but is blind to daily rhythm) with the
GLOBAL seasonal profile a production monitor keeps: the expected load
for "14:00" learned from all history. The profile grain is
hour-of-day; the production dow × hod variant is the same plan with
one more group key, but this dataset spans only 30 days, so dow cells
would hold 4-5 samples each and the sample std is too noisy to flag
anything (verified: max |z| 1.79 at dow × hod vs 3.90 at hod).

Scale shape: the profile is a tiny dimension — |event_types| × 24
cells aggregated once with map-side combine from the hourly counts —
and the corpus of hourly counts joins against it BROADCAST; nothing
big ever shuffles twice. Moments are exact integer sums (count,
sum(n), sum(n²)); mean/variance become doubles only at the final
projection, mirrored verbatim in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_Z_CUT = 3.0


def seasonal_anomaly_events(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    hourly = e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias(
            "hour"
        ),
        F.hour("ts").alias("hod"),
    ).agg(F.count("*").alias("n"))
    profile = hourly.groupBy("event_type", "hod").agg(
        F.count("*").alias("cnt"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    j = hourly.join(F.broadcast(profile), ["event_type", "hod"])
    mean = F.col("s1") / F.col("cnt")
    # sample variance from exact integer moments; nullif guards ANSI
    # divide-by-zero under codegen (see events_rate_anomaly)
    var = (F.col("cnt") * F.col("s2") - F.col("s1") * F.col("s1")) / F.nullif(
        F.col("cnt") * (F.col("cnt") - 1), F.lit(0)
    )
    z = F.when(
        (F.col("cnt") >= 3) & (var > 0),
        (F.col("n") - mean) / F.sqrt(var),
    )
    # filter on the RAW z before projecting the rounded one (rounding
    # must never decide membership — only display)
    return (
        j.where(F.abs(z) > _Z_CUT)
        .select(
            "event_type",
            "hour",
            "n",
            F.round(mean, 4).alias("expected"),
            F.round(z, 4).alias("z"),
        )
        .orderBy("event_type", "hour")
    )


SEASONAL_SQL = f"""
WITH hourly AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
         CAST(extract(hour FROM ts) AS INTEGER) AS hod,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
),
profile AS (
  SELECT event_type, hod,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(n) AS BIGINT) AS s1,
         CAST(sum(n * n) AS BIGINT) AS s2
  FROM hourly GROUP BY 1, 2
),
j AS (
  SELECT h.event_type, h.hour, h.n,
         p.s1 / CAST(p.cnt AS DOUBLE) AS mean,
         CASE WHEN p.cnt >= 3
                   AND (p.cnt * p.s2 - p.s1 * p.s1)
                       / CAST(nullif(p.cnt * (p.cnt - 1), 0) AS DOUBLE) > 0
              THEN (h.n - p.s1 / CAST(p.cnt AS DOUBLE))
                   / sqrt((p.cnt * p.s2 - p.s1 * p.s1)
                          / CAST(nullif(p.cnt * (p.cnt - 1), 0) AS DOUBLE))
         END AS z
  FROM hourly h JOIN profile p USING (event_type, hod)
)
SELECT event_type, hour, n,
       round(mean, 4) AS expected, round(z, 4) AS z
FROM j WHERE abs(z) > {_Z_CUT}
ORDER BY event_type, hour
"""


# ---------------------------------------------------------------------------
# Grouped linear-trend forecast: per-event-type OLS over daily counts,
# fitted in closed form from EXACT integer moments (n, Sx, Sy, Sxy,
# Sxx, Syy) — one map-side-combinable agg per group, no window, no
# iteration; the regression becomes doubles only in the final
# projection, identically on both engines. The 100 TB shape: millions
# of series fit in a single hash agg (one pass), each group carrying
# six integers of state.
_FORECAST_H = 3  # days ahead


def forecast_linear_events(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count("*").alias("y"))
    origin = daily.agg(F.min("day").alias("d0"))
    xy = daily.crossJoin(F.broadcast(origin)).select(
        "event_type",
        F.datediff(F.col("day"), F.col("d0")).cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
    )
    m = xy.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.max("x").alias("xmax"),
    )
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / det
    intercept = (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")) / det
    sst = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    r2_num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    r2 = (r2_num * r2_num) / (det * F.nullif(sst, F.lit(0)))
    cols = [
        "event_type",
        F.col("n").alias("n_days"),
        F.round(slope, 4).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
        F.round(r2, 4).alias("r2"),
    ]
    for h in range(1, _FORECAST_H + 1):
        cols.append(
            F.round(intercept + slope * (F.col("xmax") + h), 2).alias(
                f"forecast_{h}"
            )
        )
    return m.select(*cols).orderBy("event_type")


def _forecast_sql() -> str:
    fcols = ",\n       ".join(
        f"round((1.0 * sy * sxx - 1.0 * sx * sxy) / det"
        f" + ((1.0 * n * sxy - 1.0 * sx * sy) / det) * (xmax + {h}), 2)"
        f" AS forecast_{h}"
        for h in range(1, _FORECAST_H + 1)
    )
    return f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
origin AS (SELECT min(day) AS d0 FROM daily),
xy AS (
  SELECT event_type, CAST(day - d0 AS BIGINT) AS x, y
  FROM daily CROSS JOIN origin
),
m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(max(x) AS BIGINT) AS xmax,
         CAST(count(*) AS BIGINT) * CAST(sum(x * x) AS BIGINT)
           - CAST(sum(x) AS BIGINT) * CAST(sum(x) AS BIGINT) AS det
  FROM xy GROUP BY event_type
)
SELECT event_type, n AS n_days,
       round((1.0 * n * sxy - 1.0 * sx * sy) / det, 4) AS slope,
       round((1.0 * sy * sxx - 1.0 * sx * sxy) / det, 4) AS intercept,
       round(((1.0 * n * sxy - 1.0 * sx * sy) * (1.0 * n * sxy - 1.0 * sx * sy))
             / (det * nullif(1.0 * n * syy - 1.0 * sy * sy, 0)), 4) AS r2,
       {fcols}
FROM m ORDER BY event_type
"""


QUERIES = {
    "seasonal_anomaly_events": QuerySpec(
        seasonal_anomaly_events, SEASONAL_SQL
    ),
    "forecast_linear_events": QuerySpec(forecast_linear_events, _forecast_sql()),
}
