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


# ---------------------------------------------------------------------------
# Ordered funnel: view -> click -> purchase, each step strictly after the
# user's previous step. ONE shuffle (partitionBy user_id), then three
# chained whole-partition window minima: first_view = min view ts,
# first_click = min click ts strictly after it, first_purchase = min
# purchase ts strictly after that. No per-user timestamp ARRAYS anywhere
# — a power-law whale user (tens of millions of events) would OOM a
# collect_list buffer, while WindowExec's partition buffer spills to
# disk and each min is one scalar of running state.
def funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    return funnel_over(load(spark, sf, "events"))


def funnel_over(e: DataFrame) -> DataFrame:
    """Funnel core over any (user_id, event_type, ts) frame — split out so
    tests can property-check it on generated event sets."""
    from pyspark.sql import Window as W

    wp = W.partitionBy("user_id")
    staged_rows = (
        e.withColumn(
            "first_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wp),
        )
        .withColumn(
            "first_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("first_view")),
                    F.col("ts"),
                )
            ).over(wp),
        )
        .withColumn(
            "first_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("first_click")),
                    F.col("ts"),
                )
            ).over(wp),
        )
    )
    # the three firsts are constant per user; collapse without reshuffling
    # (the groupBy key matches the window partitioning)
    staged = staged_rows.groupBy("user_id").agg(
        F.min("first_view").alias("first_view"),
        F.min("first_click").alias("first_click"),
        F.min("first_purchase").alias("first_purchase"),
    )
    s = staged.agg(
        F.count("first_view").alias("n_view"),
        F.count("first_click").alias("n_click"),
        F.count("first_purchase").alias("n_purchase"),
    )
    return s.select(
        F.expr(
            # nullif: a step with zero reached users yields NULL conversion
            # downstream, not an ANSI DIVIDE_BY_ZERO (found by the
            # hypothesis property test with a single-view event set)
            "stack(3,"
            " 'view', n_view, CAST(1.0 AS DOUBLE),"
            " 'click', n_click, round(n_click / CAST(nullif(n_view, 0) AS DOUBLE), 4),"
            " 'purchase', n_purchase, round(n_purchase / CAST(nullif(n_click, 0) AS DOUBLE), 4)"
            ") AS (step, users, conv_from_prev)"
        )
    )


FUNNEL_SQL = """
WITH u AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'view')                  AS first_view,
         list_sort(list(ts) FILTER (WHERE event_type = 'click'))     AS clicks,
         list_sort(list(ts) FILTER (WHERE event_type = 'purchase'))  AS purchases
  FROM events GROUP BY user_id
), fc AS (
  SELECT first_view, purchases,
         list_min(list_filter(clicks, t -> t > first_view)) AS first_click
  FROM u
), fp AS (
  SELECT first_view, first_click,
         list_min(list_filter(purchases, t -> t > first_click)) AS first_purchase
  FROM fc
), s AS (
  SELECT count(first_view) AS n_view,
         count(first_click) AS n_click,
         count(first_purchase) AS n_purchase
  FROM fp
)
SELECT step, users, conv_from_prev FROM (
  SELECT 'view' AS step, CAST(n_view AS BIGINT) AS users,
         CAST(1.0 AS DOUBLE) AS conv_from_prev FROM s
  UNION ALL
  SELECT 'click', CAST(n_click AS BIGINT),
         round(n_click / CAST(nullif(n_view, 0) AS DOUBLE), 4) FROM s
  UNION ALL
  SELECT 'purchase', CAST(n_purchase AS BIGINT),
         round(n_purchase / CAST(nullif(n_click, 0) AS DOUBLE), 4) FROM s
) x
"""


# ---------------------------------------------------------------------------
# Rate-anomaly detection: hourly event counts per type, z-scored against
# the trailing 24 hours. The variance comes from INTEGER sums
# (n*sum(x^2) - sum(x)^2 over the frame) so both engines feed bit-equal
# doubles into the one sqrt/division at the end — no float-summation-
# order hazard. Scale shape: one hash agg to hourly grain (map-side
# combined; output is |types x hours|, tiny vs raw events), then a
# window over that compacted series — the window never sees raw events.
def events_rate_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load(spark, sf, "events")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00:00")
    counts = e.groupBy(F.col("event_type"), hour.alias("hour")).agg(
        F.count("*").alias("n")
    )
    w = W.partitionBy("event_type").orderBy("hour").rowsBetween(-24, -1)
    s1 = F.sum("n").over(w)
    s2 = F.sum(F.col("n") * F.col("n")).over(w)
    cnt = F.count("n").over(w)
    # nullif: cnt < 2 rows would hit an ANSI DIVIDE_BY_ZERO even though
    # the surrounding when() rejects them (codegen evaluates both sides)
    var = (cnt * s2 - s1 * s1) / F.nullif(cnt * (cnt - 1), F.lit(0))
    z = F.when(
        (cnt >= 2) & (var > 0),
        F.round((F.col("n") - s1 / cnt) / F.sqrt(var), 4),
    )
    return counts.select(
        "event_type",
        "hour",
        "n",
        z.alias("z"),
        (z > 3.0).alias("is_spike"),
    )


ANOMALY_SQL = """
WITH c AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), w AS (
  SELECT event_type, hour, n,
         sum(n)     OVER fr AS s1,
         sum(n * n) OVER fr AS s2,
         count(n)   OVER fr AS cnt
  FROM c
  WINDOW fr AS (PARTITION BY event_type ORDER BY hour
                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour, n,
       CASE WHEN cnt >= 2 AND (cnt * s2 - s1 * s1) / (cnt * (cnt - 1.0)) > 0
            THEN round((n - CAST(s1 AS DOUBLE) / cnt)
                       / sqrt((cnt * s2 - s1 * s1) / (cnt * (cnt - 1.0))), 4)
            END AS z,
       CASE WHEN cnt >= 2 AND (cnt * s2 - s1 * s1) / (cnt * (cnt - 1.0)) > 0
            THEN round((n - CAST(s1 AS DOUBLE) / cnt)
                       / sqrt((cnt * s2 - s1 * s1) / (cnt * (cnt - 1.0))), 4) > 3.0
            END AS is_spike
FROM w
"""


# ---------------------------------------------------------------------------
# Weekly retention cohorts: users grouped by first-seen week, retention =
# distinct active users per (cohort, weeks-since-cohort) offset. Two hash
# aggs (first-seen per user, then cohort cell counts) — the standard
# "count distinct by cohort matrix" with no self-join of events.
def retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    week = F.date_trunc("week", F.col("ts"))
    first_week = e.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    active = e.select("user_id", week.alias("week")).distinct()
    return (
        active.join(first_week, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort"),
            ((F.unix_timestamp("week") - F.unix_timestamp("cohort_week")) / (7 * 86400))
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


RETENTION_SQL = """
WITH fw AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT strftime(fw.cohort_week, '%Y-%m-%d')                       AS cohort,
       CAST(floor((epoch_us(a.week) - epoch_us(fw.cohort_week))
                  / (7 * 86400 * 1000000.0)) AS BIGINT)           AS week_offset,
       CAST(count(*) AS BIGINT)                                   AS n_users
FROM active a JOIN fw USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Event transition matrix: per user, count consecutive event-type pairs
# (ordered by ts with event_id as the deterministic tie-break), then
# aggregate corpus-wide. One window (partitioned by user — bounded state)
# + one hash agg; the classic Markov-chain / clickstream-path input.
def event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
    )


TRANSITIONS_SQL = """
WITH t AS (
  SELECT user_id, event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
)
SELECT src, dst, CAST(count(*) AS BIGINT) AS n
FROM t WHERE dst IS NOT NULL
GROUP BY src, dst
"""


# ---------------------------------------------------------------------------
# Top-k behavioural paths: the most common 3-step event-type sequences
# WITHIN a session (30-minute inactivity gap, same definition as
# sessionize_user_events). Extends event_transitions (bigrams, no
# session boundary) to session-scoped trigram paths — the "what do
# users actually do" query behind funnel design.
#
# Scale shape: one shuffle on user_id; sessionisation and both leads
# ride the SAME (user_id, ts) window sort (one Exchange + one Sort
# feeds three window functions); path counting is a map-side-combined
# hash agg; top-10 lowers to TakeOrderedAndProject.
_PATH_K = 10


def session_path_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load(spark, sf, "events").select("user_id", "ts", "event_type", "event_id")
    # event_id tiebreak: lead() over tied (user_id, ts) rows is otherwise
    # partition-order-nondeterministic (same convention as TRANSITIONS_SQL).
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    from .asof_q import _us

    # integer-microsecond gap (NTZ-safe via _us) — a seconds cast
    # truncates differently from DuckDB's fractional epoch()
    gap = _us(F.col("ts")) - F.lag(_us(F.col("ts"))).over(w)
    sess = F.sum(
        F.when(gap.isNull() | (gap >= 1800 * 1000000), 1).otherwise(0)
    ).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    d = e.withColumn("sess", sess)
    ws = W.partitionBy("user_id", "sess").orderBy("ts", "event_id")
    d = d.withColumn("e2", F.lead("event_type", 1).over(ws)).withColumn(
        "e3", F.lead("event_type", 2).over(ws)
    )
    return (
        d.where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .groupBy(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(_PATH_K)
    )


SESSION_PATH_SQL = f"""
WITH o AS (
  SELECT user_id, ts, event_type, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 1800 * 1000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sessed AS (
  SELECT user_id, ts, event_type, event_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess
  FROM o
),
tri AS (
  SELECT event_type || '>' ||
         lead(event_type, 1) OVER fr || '>' ||
         lead(event_type, 2) OVER fr AS path,
         lead(event_type, 2) OVER fr AS e3
  FROM sessed
  WINDOW fr AS (PARTITION BY user_id, sess ORDER BY ts, event_id)
)
SELECT path, CAST(count(*) AS BIGINT) AS n
FROM tri WHERE e3 IS NOT NULL
GROUP BY path
ORDER BY n DESC, path
LIMIT {_PATH_K}
"""


QUERIES = {
    "session_window_stats": QuerySpec(session_window_stats, SESSION_WINDOW_SQL),
    "funnel_conversion": QuerySpec(funnel_conversion, FUNNEL_SQL),
    "events_rate_anomaly": QuerySpec(events_rate_anomaly, ANOMALY_SQL),
    "retention_cohorts": QuerySpec(retention_cohorts, RETENTION_SQL),
    "event_transitions": QuerySpec(event_transitions, TRANSITIONS_SQL),
    "session_path_topk": QuerySpec(session_path_topk, SESSION_PATH_SQL),
}
