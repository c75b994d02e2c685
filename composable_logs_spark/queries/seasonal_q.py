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


QUERIES = {
    "seasonal_anomaly_events": QuerySpec(
        seasonal_anomaly_events, SEASONAL_SQL
    ),
}
