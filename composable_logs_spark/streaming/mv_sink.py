"""Update-mode materialized-view maintenance for an UNBOUNDED key space.

The complete-mode streaming fold (tests/test_mv_streaming.py) re-emits
the whole aggregate every micro-batch — correct, but only viable while
the key space fits in streaming state and the sink tolerates full
rewrites. At 100 TB the key space is unbounded, so the scale shape is a
MERGE SINK: the streaming query itself is stateless (no streaming agg,
no complete-mode re-emit); each micro-batch's raw rows are aggregated
batch-locally into mergeable (cnt, sum_micro) partials and folded into
a persisted MV table with the SAME full-outer merge the batch operator
uses (``queries.mv_q.merge_partials`` — one shared implementation, so
stream and batch cannot drift).

Per micro-batch cost: one map-side-combined hash agg over the batch,
then a key-space-sized merge join touching only the state table — never
a re-aggregation of history. State versions are immutable parquet
directories keyed by the foreachBatch ``batch_id`` (monotonic, replay-
stable), so a restarted query that replays the last batch OVERWRITES
the same version instead of double-counting — the idempotence
foreachBatch requires for exactly-once sinks. On a lake deployment the
same fold runs as MERGE INTO against a table format; parquet versions
keep this container-testable with identical semantics.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.mv_q import _segment, finalize_mv, merge_partials

_STATE_SCHEMA = (
    "event_type string, day date, cnt bigint, sum_micro bigint"
)


class MVMergeSink:
    """foreachBatch target maintaining the MV state table.

    ``retain`` bounds state growth: a long-running stream would
    otherwise accumulate one immutable version directory per
    micro-batch forever. After each successful fold, versions older
    than the ``retain`` newest are deleted. ``retain`` must be >= 2 so
    the predecessor of the newest version always survives — that is
    the version a restart-replay of the last batch folds from (Spark
    commits source offsets only after the fold completes, so at most
    the final batch ever replays)."""

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
        """One micro-batch: batch-local partials -> merge -> new state
        version. Re-delivery of the same batch_id (restart replay)
        rewrites its version from the PREDECESSOR state — idempotent."""
        prev = [v for v in self._versions() if v < batch_id]
        state = (
            self.spark.read.parquet(f"{self.state_dir}/v={prev[-1]}")
            if prev
            else self.spark.createDataFrame([], _STATE_SCHEMA)
        )
        delta = _segment(batch_df)
        out = f"{self.state_dir}/v={batch_id}"
        merge_partials(state, delta).write.mode("overwrite").parquet(out)
        # retention AFTER the new version is durable: drop everything
        # older than the retain newest (replay folds only from the
        # newest version's predecessor, which retain >= 2 preserves)
        for v in self._versions()[: -self.retain]:
            shutil.rmtree(f"{self.state_dir}/v={v}", ignore_errors=True)

    def view(self) -> DataFrame:
        """The finished MV (derived columns from merged state only)."""
        return finalize_mv(
            self.current_state().select(
                "event_type", "day", F.col("cnt").alias("n_events"), "sum_micro"
            )
        )


def start_mv_merge_stream(
    stream_df: DataFrame, spark: SparkSession, state_dir: str, ckpt: str
):
    """Attach the merge sink to a RAW event stream (columns event_type,
    ts, value). Append mode + stateless plan: Spark tracks only source
    offsets; all aggregate state lives in the versioned MV table."""
    sink = MVMergeSink(spark, state_dir)
    q = (
        stream_df.writeStream.foreachBatch(sink.fold)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    return q, sink
