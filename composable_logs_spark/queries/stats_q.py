"""Robust-statistics operators for corpus/stream quality control.

Two north-star (SURVEY.md §2.10) operators a training-data pipeline runs
constantly:

- MAD outlier detection: flag events whose value deviates from the
  per-group median by more than k·MAD (median absolute deviation) — the
  robust z-score every telemetry/quality pipeline uses because mean/std
  are themselves corrupted by the outliers being hunted.
- Winsorized length trimming: per-language p05/p95 document-length
  fences, with counts of docs falling outside — the first stage of a
  length-filter recipe.

Scale shape: exact `percentile` requires per-group sort state, which is
fine when groups are few (event types, languages) and is the price of an
oracle-exact gate; the documented 100 TB swap-in is
`percentile_approx` (t-digest sketch, mergeable, map-side combined) with
identical plan shape.  Everything after the percentile is one equi-join
against a |groups|-row aggregate (broadcast) plus a second hash agg — no
window over the full table, nothing collected.

Cross-engine exactness: values are scaled to integer cents before any
aggregation; medians/percentiles of integers interpolate with the same
`a + (b-a)·frac` formula in Spark (`percentile`) and DuckDB
(`quantile_cont`), so both engines produce bit-identical doubles; the
MAD fence multiplier is the single literal 4.4478 (= 3·1.4826) on both
sides so constant folding cannot diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

# 3 * 1.4826 (the normal-consistency constant), pre-folded to ONE literal
# so both engines parse the identical double
_MAD_FENCE = "4.4478"


def outlier_mad_events(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.expr("percentile(cents, 0.5)").alias("med_cents"),
    )
    dev = ev.join(F.broadcast(stats), "event_type").withColumn(
        "absdev", F.abs(F.col("cents") - F.col("med_cents"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(absdev, 0.5)").alias("mad_cents")
    )
    flagged = dev.join(F.broadcast(mad), "event_type").withColumn(
        "is_outlier",
        F.col("absdev") > F.expr(f"{_MAD_FENCE} * mad_cents"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.first("n_events").alias("n_events"),
            F.round(F.first("med_cents") / 100, 4).alias("median_value"),
            F.round(F.first("mad_cents") / 100, 4).alias("mad_value"),
            F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
        )
        .withColumn(
            "outlier_ratio",
            F.round(F.col("n_outliers") / F.col("n_events"), 4),
        )
    )


_OUTLIER_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
stats AS (
  SELECT event_type, count(*) AS n_events,
         quantile_cont(cents, 0.5) AS med_cents
  FROM ev GROUP BY event_type
),
dev AS (
  SELECT e.event_type, s.n_events, s.med_cents,
         abs(e.cents - s.med_cents) AS absdev
  FROM ev e JOIN stats s USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(absdev, 0.5) AS mad_cents
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       any_value(d.n_events) AS n_events,
       round(any_value(d.med_cents) / 100, 4) AS median_value,
       round(any_value(m.mad_cents) / 100, 4) AS mad_value,
       CAST(sum(CAST(d.absdev > {_MAD_FENCE} * m.mad_cents AS BIGINT)) AS BIGINT) AS n_outliers,
       round(sum(CAST(d.absdev > {_MAD_FENCE} * m.mad_cents AS BIGINT))
             / any_value(d.n_events), 4) AS outlier_ratio
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""


def winsorize_doc_lengths(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("lang", "n_chars")
    fences = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.expr("percentile(n_chars, 0.05)"), 4).alias("p05"),
        F.round(F.expr("percentile(n_chars, 0.95)"), 4).alias("p95"),
    )
    return (
        d.join(F.broadcast(fences), "lang")
        .groupBy("lang")
        .agg(
            F.first("n_docs").alias("n_docs"),
            F.first("p05").alias("p05"),
            F.first("p95").alias("p95"),
            F.sum((F.col("n_chars") < F.col("p05")).cast("long")).alias("n_below"),
            F.sum((F.col("n_chars") > F.col("p95")).cast("long")).alias("n_above"),
        )
        .withColumn(
            "kept_ratio",
            F.round(
                (F.col("n_docs") - F.col("n_below") - F.col("n_above"))
                / F.col("n_docs"),
                4,
            ),
        )
    )


_WINSOR_SQL = """
WITH fences AS (
  SELECT lang, count(*) AS n_docs,
         round(quantile_cont(n_chars, 0.05), 4) AS p05,
         round(quantile_cont(n_chars, 0.95), 4) AS p95
  FROM documents GROUP BY lang
)
SELECT d.lang,
       any_value(f.n_docs) AS n_docs,
       any_value(f.p05) AS p05,
       any_value(f.p95) AS p95,
       CAST(sum(CAST(d.n_chars < f.p05 AS BIGINT)) AS BIGINT) AS n_below,
       CAST(sum(CAST(d.n_chars > f.p95 AS BIGINT)) AS BIGINT) AS n_above,
       round((any_value(f.n_docs)
              - sum(CAST(d.n_chars < f.p05 AS BIGINT))
              - sum(CAST(d.n_chars > f.p95 AS BIGINT)))
             / any_value(f.n_docs), 4) AS kept_ratio
FROM documents d JOIN fences f USING (lang)
GROUP BY d.lang
"""


QUERIES = {
    "outlier_mad_events": QuerySpec(outlier_mad_events, _OUTLIER_SQL),
    "winsorize_doc_lengths": QuerySpec(winsorize_doc_lengths, _WINSOR_SQL),
}
