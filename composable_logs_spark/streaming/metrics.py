"""Streaming observability: capture per-micro-batch progress metrics.

An always-on ingest needs numbers (rows/batch, processing rate, batch
duration, state-store size) to alert on lag or state growth.
Structured Streaming already emits all of it per batch through
``StreamingQueryListener``; this wires those events into a plain list of
dicts the caller can assert on, export, or feed to a metrics sink.
Listener callbacks run on a driver event thread — they only append to a
list here (never touch Spark), so they cannot deadlock a query.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Collects one record per finished micro-batch."""

    def __init__(self) -> None:
        self.progress: list[dict] = []
        self.terminated: list[dict] = []

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rec = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "duration_ms": dict(p.durationMs or {}),
            "state_rows_total": sum(
                (s.numRowsTotal or 0) for s in (p.stateOperators or [])
            ),
        }
        self.progress.append(rec)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.terminated.append({"query_id": str(event.id)})


def attach_progress_recorder(spark: SparkSession) -> ProgressRecorder:
    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    return rec


def detach(spark: SparkSession, rec: Optional[ProgressRecorder]) -> None:
    if rec is not None:
        spark.streams.removeListener(rec)
