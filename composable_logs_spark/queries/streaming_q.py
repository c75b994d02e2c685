"""Windowed / streaming-shaped aggregations over the events table.

The reference's only streaming behavior is incremental append-only span
files (SURVEY §2.9); our engine adds the standard streaming operator set.
These queries use the SAME operators Structured Streaming executes
(``F.window`` tumbling/sliding/session groupings) on the batch API, so
the DuckDB oracle can check values; ``streaming/ingest.py`` wires the
identical plans to ``readStream`` (tests assert batch == stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load


def stream_tumbling_counts(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0, 2).alias(
                "total_value"
            ),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start,
       event_type, count(*) AS n,
       round(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0, 2) AS total_value
FROM events GROUP BY 1, 2
"""


def stream_sliding_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding window (1 h window, 30 min slide): each event lands in 2
    windows. Oracle: explode the two half-hour-aligned window starts."""
    e = load(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
        )
    )


SLIDING_SQL = """
WITH f AS (
  SELECT event_type,
         date_trunc('hour', ts)
           + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                  ELSE INTERVAL 0 MINUTE END AS floor30
  FROM events
),
slid AS (
  SELECT event_type, unnest([floor30, floor30 - INTERVAL 30 MINUTE]) AS wstart FROM f
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M') AS window_start, event_type, count(*) AS n
FROM slid GROUP BY 1, 2
"""


def stream_dedup_events(spark: SparkSession, sf: str) -> DataFrame:
    """Id-based dedup — the streaming dropDuplicates pattern (SURVEY §2.9:
    late/duplicate tolerance is id-anti-join / last-wins). Input doubled
    to prove the dedup; keep-first by (event_id)."""
    e = load(spark, sf, "events")
    doubled = e.unionByName(e)
    return (
        doubled.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0, 2).alias(
                "total_value"
            ),
        )
    )


STREAM_DEDUP_SQL = """
WITH doubled AS (
  SELECT * FROM events UNION ALL SELECT * FROM events
),
d AS (
  SELECT DISTINCT ON (event_id) event_id, event_type, value FROM doubled
)
SELECT event_type, count(*) AS n,
       round(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0, 2) AS total_value
FROM d GROUP BY event_type
"""


QUERIES = {
    "stream_tumbling_counts": QuerySpec(stream_tumbling_counts, TUMBLING_SQL),
    "stream_sliding_counts": QuerySpec(stream_sliding_counts, SLIDING_SQL),
    "stream_dedup_events": QuerySpec(stream_dedup_events, STREAM_DEDUP_SQL),
}
