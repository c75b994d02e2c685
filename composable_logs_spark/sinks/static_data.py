"""Static-site dataset sink (SURVEY §2.1 S7).

Reference: cli_generate_static_data.py:75-201 — union the workflow entry
and task entries of every run into one ``static_data.json`` under a
www-root, plus per-span artifact directories.

Spark shape: ``workflow_runs ∪ task_runs`` via unionByName with missing
columns (U3), serialised to one JSON document. The union is computed
distributed; the final single-file write is a driver-side dump of the
per-run reporting dataset (small). The mermaid artifacts per run reuse
the S9 generators.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from ..plans.summarize import SpanSummary
from .mermaid import make_mermaid_dag, make_mermaid_gantt


def static_data_frame(summary: SpanSummary):
    """The U3 union as a DataFrame (one row per workflow or task run)."""
    wf = summary.workflow_runs.select(
        F.lit("workflow").alias("entry_type"),
        "run_id",
        "span_id",
        F.lit(None).cast("string").alias("task_id"),
        F.lit(None).cast("string").alias("task_type"),
        "start_time",
        "end_time",
        "duration_s",
        "is_success",
        "attributes",
    )
    tasks = summary.task_runs.select(
        F.lit("task").alias("entry_type"),
        "run_id",
        "span_id",
        "task_id",
        "task_type",
        "start_time",
        "end_time",
        "duration_s",
        "is_success",
        "attributes",
    )
    return wf.unionByName(tasks)


def write_static_data(
    summary: SpanSummary, www_root: str | Path, with_mermaid: bool = True
) -> Path:
    root = Path(www_root)
    root.mkdir(parents=True, exist_ok=True)
    entries = [r.asDict() for r in static_data_frame(summary).collect()]
    for e in entries:
        e["start_time"] = str(e["start_time"])
        e["end_time"] = str(e["end_time"])
        e["attributes"] = dict(e["attributes"] or {})

    out = root / "static_data.json"
    out.write_text(json.dumps(entries, indent=2))

    if with_mermaid:
        for run_id in sorted({e["run_id"] for e in entries}):
            run_dir = root / run_id.replace("/", "_").replace(".", "_")
            run_dir.mkdir(parents=True, exist_ok=True)
            (run_dir / "dag.mmd").write_text(make_mermaid_dag(summary, run_id))
            (run_dir / "gantt.mmd").write_text(make_mermaid_gantt(summary, run_id))
    return out
