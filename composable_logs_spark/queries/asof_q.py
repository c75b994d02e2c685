"""As-of join and quantile operators.

Spark has no native ASOF JOIN (guide: common OLAP patterns); the scalable
composition is the union-window trick below — no per-key loop, no range
explosion, one shuffle on the key:

1. tag both streams, union them,
2. sort within key by (ts, tag) so the reference stream sorts first at
   equal timestamps (>= semantics),
3. ``last(value, ignorenulls)`` over an unbounded-preceding window
   carries the most recent reference row forward,
4. keep only probe rows.

DuckDB has a native ASOF JOIN — the oracle checks our composition
against it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import QuerySpec, load


def asof_join_purchase_click(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    # reference stream deduped to one row per (user, ts) for determinism
    clicks = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    unioned = clicks.select(
        "user_id",
        "ts",
        "click_id",
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(0).alias("tag"),
    ).unionByName(
        purchases.select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("click_id"),
            "purchase_id",
            F.lit(1).alias("tag"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        unioned.withColumn(
            "matched_click_id", F.last("click_id", ignorenulls=True).over(w)
        )
        .where(F.col("tag") == 1)
        .select("purchase_id", "user_id", "matched_click_id")
    )


ASOF_SQL = """
WITH clicks AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
p AS (
  SELECT user_id, ts, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, c.click_id AS matched_click_id
FROM p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def agg_percentiles_events(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles per event type (both engines use the
    same linear-interpolation definition on the sorted values)."""
    e = load(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


PERCENTILE_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4)  AS p50,
       round(quantile_cont(value, 0.9), 4)  AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Tolerance-bounded as-of: same carry-forward composition, but a match
# only counts if the reference row is within 10 minutes — the kdb-style
# `tolerance` parameter. The lag is computed in exact integer
# microseconds so the cutoff can't float-drift between engines.
_TOL_US = 600 * 1_000_000


def _us(col):
    """Epoch microseconds, NTZ-safe: PySpark 4.x reads the testdata's
    ``timestamp[us]`` parquet columns as TIMESTAMP_NTZ, which
    ``unix_micros`` rejects — guard with ``to_timestamp`` exactly as
    plans/summarize.py does."""
    return F.unix_micros(F.to_timestamp(col))


def asof_join_with_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    clicks = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    unioned = clicks.select(
        "user_id",
        "ts",
        "click_id",
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(0).alias("tag"),
    ).unionByName(
        purchases.select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("click_id"),
            "purchase_id",
            F.lit(1).alias("tag"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = (
        unioned.withColumn(
            "matched_click_id", F.last("click_id", ignorenulls=True).over(w)
        )
        .withColumn(
            "matched_click_ts",
            F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True).over(w),
        )
        .where(F.col("tag") == 1)
    )
    lag_us = _us("ts") - _us("matched_click_ts")
    valid = F.col("matched_click_id").isNotNull() & (lag_us <= _TOL_US)
    return carried.select(
        "purchase_id",
        "user_id",
        F.when(valid, F.col("matched_click_id")).alias("matched_click_id"),
        F.when(valid, lag_us).alias("lag_us"),
    )


ASOF_TOL_SQL = f"""
WITH clicks AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
p AS (
  SELECT user_id, ts, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id,
       CASE WHEN c.click_id IS NOT NULL
             AND epoch_us(p.ts) - epoch_us(c.ts) <= {_TOL_US}
            THEN c.click_id END AS matched_click_id,
       CASE WHEN c.click_id IS NOT NULL
             AND epoch_us(p.ts) - epoch_us(c.ts) <= {_TOL_US}
            THEN epoch_us(p.ts) - epoch_us(c.ts) END AS lag_us
FROM p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# ---------------------------------------------------------------------------
# Time-weighted average of `value` per user: each observation holds until
# the next one (step interpolation), weights are exact integer
# microsecond durations, values are scaled to exact integer millis —
# so the big sums are order-independent longs and only ONE double
# division happens at the end. One window (lead) + one hash agg.
def time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = e.select(
        "user_id",
        F.round(F.col("value") * 1000).cast("long").alias("v_milli"),
        (_us(F.lead("ts").over(w)) - _us("ts")).alias("dur_us"),
    ).where(F.col("dur_us").isNotNull())
    return stepped.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.round(
            F.sum(F.col("v_milli") * F.col("dur_us"))
            / (F.sum("dur_us") * 1000.0),
            4,
        ).alias("twa_value"),
    )


TWA_SQL = """
WITH s AS (
  SELECT user_id,
         CAST(round(value * 1000, 0) AS BIGINT) AS v_milli,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dur_us
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_intervals,
       round(sum(v_milli * dur_us) / (sum(dur_us) * 1000.0), 4) AS twa_value
FROM s WHERE dur_us IS NOT NULL
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Gap-fill / resample: an hourly grid per user spanning their activity,
# forward-filled with the last observed value (step interpolation) — the
# timeseries-DB "resample + locf" op. The grid generates from one tiny
# per-user agg (sequence+explode: |users x hours| rows, no join against
# raw events to build it), and the fill is the same union-window carry
# as the as-of join: one shuffle on user_id.
def gapfill_hourly_locf(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    span = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("ts"),
    )
    unioned = e.select(
        "user_id", "ts", F.col("value").alias("obs"), F.lit(0).alias("tag")
    ).unionByName(
        grid.select(
            "user_id", "ts", F.lit(None).cast("double").alias("obs"), F.lit(1).alias("tag")
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        unioned.withColumn("filled", F.last("obs", ignorenulls=True).over(w))
        .where(F.col("tag") == 1)
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:00:00").alias("hour"),
            F.round("filled", 4).alias("value_locf"),
        )
    )


GAPFILL_SQL = """
WITH span AS (
  SELECT user_id,
         date_trunc('hour', CAST(min(ts) AS TIMESTAMP)) AS h0,
         date_trunc('hour', CAST(max(ts) AS TIMESTAMP)) AS h1
  FROM events GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS g
  FROM span
),
obs AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
)
SELECT grid.user_id,
       strftime(grid.g, '%Y-%m-%d %H:00:00') AS hour,
       round(o.value, 4) AS value_locf
FROM grid ASOF LEFT JOIN obs o
  ON grid.user_id = o.user_id AND grid.g >= o.ts
"""


QUERIES = {
    "asof_join_purchase_click": QuerySpec(asof_join_purchase_click, ASOF_SQL),
    "agg_percentiles_events": QuerySpec(agg_percentiles_events, PERCENTILE_SQL),
    "asof_join_with_tolerance": QuerySpec(asof_join_with_tolerance, ASOF_TOL_SQL),
    "time_weighted_avg": QuerySpec(time_weighted_avg, TWA_SQL),
    "gapfill_hourly_locf": QuerySpec(gapfill_hourly_locf, GAPFILL_SQL),
}
