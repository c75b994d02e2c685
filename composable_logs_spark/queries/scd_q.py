"""Slowly-changing-dimension type-2 history build — the warehouse
operator that turns an append-only event stream into versioned validity
intervals (valid_from / valid_to / is_current), then audits the
resulting dimension per entity.

Every serving layer over a 100 TB event store needs this exact shape:
"what was the entity's state AT time t" requires interval rows, not
events. The reference has no temporal-versioning surface (its span log
is append-only, opentelemetry_helpers.py:365-491) — north-star scope.

Semantics (textbook SCD2 with run-length collapse):

1. Per user, order events by (ts, event_id); consecutive events with
   the SAME event_type belong to one version (a state only "changes"
   when the value changes).
2. Version k's valid_from = first event ts of the run; valid_to = the
   next version's valid_from; the last version is open (NULL valid_to,
   is_current).
3. The gated output is the per-user audit of that dimension: version
   count, the current state and since when, and the longest CLOSED
   version's exact duration in microseconds — numbers that depend on
   every interval boundary, so the hash proves the whole SCD2 build.

100 TB design: ONE shuffle on user_id serves every stage — the
change-flag lag window, the version running-sum window, the per-version
aggregation, and the valid_to lead window are all partitioned by
user_id (Catalyst reuses the exchange; no partition-less window, no
second shuffle). Durations are exact int64 microsecond arithmetic —
no doubles anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import QuerySpec, load


def scd2_versions(ev: DataFrame) -> DataFrame:
    """(user_id, version, event_type, valid_from, valid_to): the SCD2
    dimension itself — reusable by at-time-t lookups."""
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id", "ts", "event_id", "event_type"
    ).withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w_ord).isNull()
            | (F.lag("event_type").over(w_ord) != F.col("event_type")),
            1,
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "version",
        F.sum("chg").over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    vers = runs.groupBy("user_id", "version").agg(
        F.first("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
    )
    w_ver = W.partitionBy("user_id").orderBy("version")
    return vers.withColumn("valid_to", F.lead("valid_from").over(w_ver))


def scd2_user_history(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    vers = scd2_versions(ev)
    # events.ts reads as TIMESTAMP_NTZ; the session TZ is pinned UTC by
    # `load`, so the cast to TIMESTAMP is the identity on the epoch
    dur_us = F.unix_micros(F.col("valid_to").cast("timestamp")) - F.unix_micros(
        F.col("valid_from").cast("timestamp")
    )
    return (
        vers.groupBy("user_id")
        .agg(
            F.count("*").cast("int").alias("n_versions"),
            F.max_by("event_type", "version").alias("current_type"),
            F.max_by("valid_from", "version").alias("current_since"),
            F.max(F.when(F.col("valid_to").isNotNull(), dur_us)).alias(
                "longest_closed_us"
            ),
        )
        .orderBy("user_id")
    )


SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, ts, event_type,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
  FROM ordered
),
vers AS (
  SELECT user_id, version,
         min(ts) AS valid_from,
         arg_min(event_type, ts) AS event_type
  FROM runs GROUP BY user_id, version
),
dim AS (
  SELECT user_id, version, event_type, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to
  FROM vers
)
SELECT user_id,
       CAST(count(*) AS INT) AS n_versions,
       arg_max(event_type, version) AS current_type,
       arg_max(valid_from, version) AS current_since,
       max(CASE WHEN valid_to IS NOT NULL
                THEN epoch_us(valid_to) - epoch_us(valid_from) END)
         AS longest_closed_us
FROM dim
GROUP BY user_id
ORDER BY user_id
"""


QUERIES = {
    "scd2_user_history": QuerySpec(scd2_user_history, SCD2_SQL),
}
