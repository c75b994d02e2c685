"""Watermarked stream-stream joins (SURVEY §2.9 extension).

The reference has no streaming joins (its streams are span ingest only);
this is part of the engine's Structured-Streaming surface for the
training-data/event pipelines the repo targets. Semantics: inner
interval join — each purchase matches the clicks of the SAME user within
``max_lag_s`` seconds before it.

Scale notes:
- Both sides shuffle once on the equi-key (user_id); the range predicate
  evaluates inside the joined partitions, so there is no time-bucket
  explosion and no cross-key fan-out.
- State is BOUNDED by the watermarks: a click older than
  (max event time - watermark - max_lag) can never match a future
  purchase and is evicted; without watermarks a stream-stream join's
  state grows forever — the operator therefore REQUIRES both.
- Inner-join rows emit as soon as both inputs arrive (watermark only
  gates state eviction and late-input drop), so latency is per-batch,
  not per-watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    clicks: DataFrame,
    purchases: DataFrame,
    max_lag_s: int = 1800,
    watermark_s: int = 600,
    how: str = "inner",
) -> DataFrame:
    """Join each purchase to the same user's clicks within ``max_lag_s``
    seconds before the purchase. Both inputs need (user_id, ts, ...).
    Works identically on streaming and batch DataFrames (the test
    asserts stream == batch).

    ``how="left_outer"`` keeps purchases with NO qualifying click
    (click columns null). Streaming semantics: an unmatched purchase is
    emitted only once the watermark guarantees no matching click can
    still arrive — so null rows surface one watermark delay after the
    purchase's window closes, and a final idle stream may hold back the
    newest unmatched rows until a later batch advances the watermark.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError("how must be 'inner' or 'left_outer'")
    c = clicks
    p = purchases
    if clicks.isStreaming:
        c = c.withWatermark("ts", f"{watermark_s} seconds")
    if purchases.isStreaming:
        p = p.withWatermark("ts", f"{watermark_s} seconds")
    joined = p.alias("p").join(
        c.alias("c"),
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("c.ts") <= F.col("p.ts"))
        & (F.col("c.ts") >= F.col("p.ts") - F.expr(f"INTERVAL {max_lag_s} SECONDS")),
        "leftOuter" if how == "left_outer" else "inner",
    )
    return joined.select(
        F.col("p.user_id").alias("user_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("p.ts").alias("purchase_ts"),
        (
            # to_timestamp guard: parquet-sourced batch inputs arrive as
            # TIMESTAMP_NTZ under PySpark 4.x, which unix_micros rejects.
            F.unix_micros(F.to_timestamp(F.col("p.ts")))
            - F.unix_micros(F.to_timestamp(F.col("c.ts")))
        ).alias("lag_us"),
    )
