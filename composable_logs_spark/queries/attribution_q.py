"""Multi-touch attribution with time decay — the marketing-analytics
counterpart of the funnel/sessionization family: every purchase's value
is split across the user's view/click touchpoints in the preceding
24 h, weighted by recency, and rolled up per channel. Purchases with no
prior touch credit a 'direct' channel.

Decay is RECIPROCAL, not exponential, so that both engines compute the
identical integer weight with no pow()/exp() float hazard:

    weight_micro = (1e6 * HL) div (HL + age_seconds),  HL = 3600 s

(half the weight at age = HL, a quarter at 3 HL — same shape class as
exponential decay, exactly representable). Credit per touch is then

    credit_cents = (value_cents * weight_micro) div sum(weight_micro)

per purchase — exact int64; the <= 1-cent truncation remainder per
purchase is NOT redistributed, the same documented simplification both
engines share in the integer PageRank (graph_q).

Scale shape: one range join (touch within (purchase - 24h, purchase)),
keyed on user_id first — the equi half of the condition — exactly like
range_join_error_attribution; then two hash aggregations (per purchase,
per channel), both map-side combinable. The 'direct' leg is a
broadcast-friendly LEFT ANTI on the same keys. No windows, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_HL_S = 3600
_LOOKBACK_S = 86400


def attribute_over(e: DataFrame) -> DataFrame:
    """Core attribution over an events frame with columns
    (event_id, ts, user_id, event_type, value)."""
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("p_us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    touches = e.where(F.col("event_type").isin("view", "click")).select(
        F.col("user_id"),
        F.col("event_type").alias("channel"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
    )
    joined = purchases.join(touches, "user_id").where(
        (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - F.lit(_LOOKBACK_S * 1_000_000))
    )
    weighted = joined.withColumn(
        "w",
        # the numerator literal is precomputed: 1000000 * 3600 would be
        # folded as INT x INT and overflow under ANSI mode
        F.expr(
            f"{_HL_S * 1_000_000} div ({_HL_S} + (p_us - t_us) div 1000000)"
        ),
    ).cache()
    # cached (narrow integer columns): the per-purchase sums, the credit
    # join, and the direct anti-join all read weighted — without the
    # cache the range join would execute three times (dedup_q.py:255
    # discipline; pinned because the returned plan is lazy)
    sums = weighted.groupBy("purchase_id").agg(F.sum("w").alias("sumw"))
    credits = (
        weighted.join(sums, "purchase_id")
        .withColumn("credit", F.expr("(cents * w) div sumw"))
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_touches"),
            F.sum("credit").alias("attributed_cents"),
        )
    )
    direct = (
        purchases.join(
            weighted.select("purchase_id").distinct(), "purchase_id", "left_anti"
        )
        .agg(
            F.count("*").alias("n_touches"),
            F.coalesce(F.sum("cents"), F.lit(0)).alias("attributed_cents"),
        )
        .select(F.lit("direct").alias("channel"), "n_touches", "attributed_cents")
    )
    return credits.unionByName(direct).orderBy("channel")


def attribution_time_decay(spark: SparkSession, sf: str) -> DataFrame:
    return attribute_over(load(spark, sf, "events"))


_ATTR_SQL = f"""
WITH purchases AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id, event_type AS channel, epoch_us(ts) AS t_us
  FROM events WHERE event_type IN ('view', 'click')
),
weighted AS (
  SELECT p.purchase_id, p.cents, t.channel,
         {_HL_S * 1_000_000} // ({_HL_S} + (p.p_us - t.t_us) // 1000000) AS w
  FROM purchases p JOIN touches t
    ON p.user_id = t.user_id
   AND t.t_us < p.p_us
   AND t.t_us >= p.p_us - {_LOOKBACK_S * 1_000_000}
),
sums AS (
  SELECT purchase_id, SUM(w) AS sumw FROM weighted GROUP BY purchase_id
),
credits AS (
  SELECT w.channel,
         COUNT(*) AS n_touches,
         CAST(SUM((w.cents * w.w) // s.sumw) AS BIGINT) AS attributed_cents
  FROM weighted w JOIN sums s ON w.purchase_id = s.purchase_id
  GROUP BY w.channel
),
direct AS (
  SELECT 'direct' AS channel, COUNT(*) AS n_touches,
         CAST(coalesce(SUM(cents), 0) AS BIGINT) AS attributed_cents
  FROM purchases
  WHERE purchase_id NOT IN (SELECT purchase_id FROM weighted)
)
SELECT channel, n_touches, attributed_cents FROM credits
UNION ALL
SELECT channel, n_touches, attributed_cents FROM direct
ORDER BY channel
"""


QUERIES = {
    "attribution_time_decay": QuerySpec(attribution_time_decay, _ATTR_SQL),
}
