"""Nearest-direction as-of join (back-registered extension of asof_q).

``asof_join_purchase_click`` matches the most recent click BEFORE each
purchase (backward as-of). The nearest variant considers both
directions and keeps whichever click is closer in time — the kdb
``aj``-with-`nearest` / pandas ``merge_asof(direction='nearest')``
semantics. Composition: run the backward union-window carry and its
mirror (forward carry = last-over-reversed-order), then pick the
smaller |lag| (tie -> the earlier click, matching pandas).

Scale shape: same as the one-direction as-of — both carries share ONE
shuffle on user_id (two windows over the same partitioning, opposite
orders), no range explosion, no self-join of events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import QuerySpec, load
from .asof_q import _us


def asof_join_nearest(spark: SparkSession, sf: str) -> DataFrame:
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
    # backward: reference rows sort before probes at equal ts (>= match);
    # forward mirror: probes sort before references (<= match)
    wb = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("tag").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = (
        unioned.withColumn("b_id", F.last("click_id", ignorenulls=True).over(wb))
        .withColumn(
            "b_ts",
            F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True).over(wb),
        )
        .withColumn("f_id", F.last("click_id", ignorenulls=True).over(wf))
        .withColumn(
            "f_ts",
            F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True).over(wf),
        )
        .where(F.col("tag") == 1)
    )
    b_lag = _us("ts") - _us("b_ts")       # >= 0 when backward match exists
    f_lag = _us("f_ts") - _us("ts")       # >= 0 when forward match exists
    pick_backward = F.col("b_id").isNotNull() & (
        F.col("f_id").isNull() | (b_lag <= f_lag)  # tie -> earlier (backward)
    )
    return carried.select(
        "purchase_id",
        "user_id",
        F.when(pick_backward, F.col("b_id")).otherwise(F.col("f_id")).alias(
            "nearest_click_id"
        ),
        F.when(pick_backward, b_lag).otherwise(-f_lag).alias("signed_lag_us"),
    )


ASOF_NEAREST_SQL = """
WITH clicks AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
p AS (
  SELECT user_id, ts, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
),
back AS (
  SELECT p.purchase_id, p.user_id, p.ts, c.click_id AS b_id, c.ts AS b_ts
  FROM p ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
),
fwd AS (
  SELECT p.purchase_id, c.click_id AS f_id, c.ts AS f_ts
  FROM p ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts <= c.ts
)
SELECT b.purchase_id, b.user_id,
       CASE WHEN b.b_id IS NOT NULL
             AND (f.f_id IS NULL
                  OR epoch_us(b.ts) - epoch_us(b.b_ts)
                     <= epoch_us(f.f_ts) - epoch_us(b.ts))
            THEN b.b_id ELSE f.f_id END AS nearest_click_id,
       CASE WHEN b.b_id IS NOT NULL
             AND (f.f_id IS NULL
                  OR epoch_us(b.ts) - epoch_us(b.b_ts)
                     <= epoch_us(f.f_ts) - epoch_us(b.ts))
            THEN epoch_us(b.ts) - epoch_us(b.b_ts)
            ELSE -(epoch_us(f.f_ts) - epoch_us(b.ts)) END AS signed_lag_us
FROM back b JOIN fwd f USING (purchase_id)
"""


QUERIES = {
    "asof_join_nearest": QuerySpec(asof_join_nearest, ASOF_NEAREST_SQL),
}
