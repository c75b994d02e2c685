"""Streaming CDC snapshot maintenance — the row-level sibling of the
aggregate merge sink (``mv_sink.MVMergeSink``): each micro-batch of
change records (upserts + deletes) folds into a persisted snapshot via
the SAME last-writer-wins apply the batch operator uses
(``queries.cdc_q.apply_changes`` — one shared implementation, so
stream and batch cannot drift).

Ordering contract: change sequence numbers dedupe WITHIN a micro-batch
(the keyed window in apply_changes); ACROSS batches the source's
arrival order is the order — the standard CDC-mirror assumption, which
Structured Streaming's per-source offset ordering provides. A replayed
micro-batch (restart before the offset commit) rewrites its own state
version from the PREDECESSOR version, exactly the mv_sink idempotence
scheme; ``retain >= 2`` keeps that predecessor alive.

100 TB shape: per micro-batch one keyed window over the BATCH (tiny)
and one full-outer merge join against the snapshot — the same cost as
the MERGE INTO a lakehouse mirror job issues; the snapshot never gets
re-derived from history.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..queries.cdc_q import apply_changes

_SNAP_SCHEMA = "key bigint, bal_cents bigint"


class CDCSnapshotSink:
    """foreachBatch target maintaining a last-writer-wins snapshot."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        initial: DataFrame | None = None,
        retain: int = 3,
    ):
        assert retain >= 2, "replay needs the newest version's predecessor"
        self.spark = spark
        self.state_dir = state_dir
        self.retain = retain
        os.makedirs(state_dir, exist_ok=True)
        if initial is not None and not self._versions():
            # version -1: the pre-stream base snapshot (batch_ids are >= 0)
            initial.select("key", "bal_cents").write.mode("overwrite").parquet(
                f"{state_dir}/v=-1"
            )

    def _versions(self) -> list[int]:
        return sorted(
            int(d[2:]) for d in os.listdir(self.state_dir) if d.startswith("v=")
        )

    def current_snapshot(self) -> DataFrame:
        vs = self._versions()
        if not vs:
            return self.spark.createDataFrame([], _SNAP_SCHEMA)
        return self.spark.read.parquet(f"{self.state_dir}/v={vs[-1]}")

    def fold(self, batch_df: DataFrame, batch_id: int) -> None:
        """One micro-batch of (key, seq, op, new_bal_cents) changes."""
        prev = [v for v in self._versions() if v < batch_id]
        state = (
            self.spark.read.parquet(f"{self.state_dir}/v={prev[-1]}")
            if prev
            else self.spark.createDataFrame([], _SNAP_SCHEMA)
        )
        snap = apply_changes(state, batch_df).select("key", "bal_cents")
        out = f"{self.state_dir}/v={batch_id}"
        snap.write.mode("overwrite").parquet(out)
        for v in self._versions()[: -self.retain]:
            shutil.rmtree(f"{self.state_dir}/v={v}", ignore_errors=True)
