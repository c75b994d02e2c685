"""Streaming Holt smoothing — the 13th incremental module: per-key
level/trend state folds forward one micro-batch at a time and lands on
EXACTLY the batch query's numbers, because the recurrence is a left
fold: fold(fold(init, days 1..k), days k+1..n) == fold(init, days 1..n)
whenever the split respects day order. Both paths run the SAME
``holt_fold_expr`` (queries/holt_q.py), so stream and batch cannot
drift.

Ordering contract (stated, not assumed silently): micro-batches arrive
in event-time order and a calendar DAY never straddles a batch
boundary — the shape a daily-rollup ingestion (one file per day/hour)
produces naturally. A batch that violates the contract — any row whose
day is <= its key's folded ``last_day`` — RAISES before any state is
written (the r12 ADVICE discipline: a silently-mauled fold state looks
plausible and verifies nowhere). Watermark-style lateness belongs in
the upstream daily rollup, not in the fold.

Replay idempotence: state versions are keyed by batch_id; a replayed
batch re-folds from its PREDECESSOR version (the mv_sink / CDC-sink
scheme), so restart-before-offset-commit rewrites the same version
instead of double-applying.

100 TB shape: per micro-batch one hash-aggregate of the BATCH to
daily cents, one outer join against key-count state rows (5 keys here;
bounded by key cardinality, not corpus), one fold per key over the
batch's own days. The corpus is never re-scanned.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.holt_q import holt_fold_expr

_STATE_SCHEMA = (
    "event_type string, n_days bigint, last_day date, lvl double, trd double"
)


def _daily_cents(batch_df: DataFrame) -> DataFrame:
    """The batch query's day/cents rollup, applied to one micro-batch."""
    return (
        batch_df.select(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("y"))
    )


class HoltStateSink:
    """foreachBatch target maintaining per-key (n_days, last_day, lvl,
    trd) Holt state over versioned parquet."""

    def __init__(self, spark: SparkSession, state_dir: str, retain: int = 3):
        assert retain >= 2, "replay needs the newest version's predecessor"
        self.spark = spark
        self.state_dir = state_dir
        self.retain = retain
        os.makedirs(state_dir, exist_ok=True)

    def _versions(self) -> list[int]:
        return sorted(
            int(d[2:]) for d in os.listdir(self.state_dir) if d.startswith("v=")
        )

    def current_state(self) -> DataFrame:
        vs = self._versions()
        if not vs:
            return self.spark.createDataFrame([], _STATE_SCHEMA)
        return self.spark.read.parquet(f"{self.state_dir}/v={vs[-1]}")

    def fold(self, batch_df: DataFrame, batch_id: int) -> None:
        prev = [v for v in self._versions() if v < batch_id]
        state = (
            self.spark.read.parquet(f"{self.state_dir}/v={prev[-1]}")
            if prev
            else self.spark.createDataFrame([], _STATE_SCHEMA)
        )
        daily = _daily_cents(batch_df)
        late = daily.join(state, "event_type").where(
            F.col("day") <= F.col("last_day")
        )
        n_late = late.count()
        if n_late:
            raise RuntimeError(
                f"incremental_holt: batch {batch_id} carries {n_late} "
                "day-rows at or before their key's folded last_day — the "
                "fold would silently corrupt; roll days up upstream"
            )
        merged = (
            daily.groupBy("event_type")
            .agg(
                F.sort_array(F.collect_list(F.struct("day", "y"))).alias("arr"),
                F.count("*").alias("b_days"),
                F.max("day").alias("b_last"),
            )
            .join(state, "event_type", "full_outer")
        )
        folded = merged.select(
            "event_type",
            F.expr(
                "CASE WHEN arr IS NULL THEN n_days "
                "WHEN lvl IS NULL THEN b_days "
                "ELSE n_days + b_days END"
            ).alias("n_days"),
            F.expr(
                "CASE WHEN arr IS NULL THEN last_day "
                "WHEN lvl IS NULL THEN b_last "
                "ELSE b_last END"
            ).alias("last_day"),
            F.expr(
                # keys absent from this batch keep their state; fresh keys
                # init from their first day; continuing keys fold forward
                # from (lvl, trd) over ALL the batch's days
                f"""CASE
  WHEN arr IS NULL THEN named_struct('lvl', lvl, 'trd', trd)
  WHEN lvl IS NULL THEN {holt_fold_expr(
      "slice(arr, 2, size(arr) - 1)",
      "CAST(arr[0].y AS DOUBLE) / 100.0",
      "CAST(0.0 AS DOUBLE)",
  )}
  ELSE {holt_fold_expr("arr", "lvl", "trd")}
END"""
            ).alias("st"),
        ).select(
            "event_type",
            "n_days",
            "last_day",
            F.col("st.lvl").alias("lvl"),
            F.col("st.trd").alias("trd"),
        )
        out = f"{self.state_dir}/v={batch_id}"
        folded.write.mode("overwrite").parquet(out)
        for v in self._versions()[: -self.retain]:
            shutil.rmtree(f"{self.state_dir}/v={v}", ignore_errors=True)
