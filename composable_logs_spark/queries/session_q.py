"""Native session_window sessionization — cross-validated against the
lag+cumsum SQL reconstruction (same 30-minute gap), so Spark's built-in
session windows (the streaming-capable operator) are hash-checked against
a from-first-principles oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load


def session_window_stats(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    sessions = (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    return sessions.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
    )


SESSION_WINDOW_SQL = """
WITH g AS (
  SELECT user_id, ts,
         -- exact µs arithmetic, >= not >: Spark's session window is
         -- [start, start+gap), so an event exactly gap after the previous
         -- one opens a NEW session; date_diff('second', …) would count
         -- whole-second boundary crossings and misclassify sub-second gaps
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                         ORDER BY ts, event_id))
                   >= 1800 * 1000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM s GROUP BY user_id, session_id
)
SELECT user_id,
       count(*) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(max(n_events) AS BIGINT) AS max_session_events
FROM per_session GROUP BY user_id
"""


QUERIES = {
    "session_window_stats": QuerySpec(session_window_stats, SESSION_WINDOW_SQL),
}
