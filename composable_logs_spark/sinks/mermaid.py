"""Mermaid DAG / Gantt text generation (SURVEY §2.1 S9).

Reference: mermaid_graphs.py:49-114 (dag), :117-161 (gantt),
cli_pynb_log_parser.py:126-146. Text formatting is presentation-layer and
runs driver-side over the (small) per-run summary — the heavy lifting
(summarisation) already happened distributed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.summarize import SpanSummary


def _human_duration(seconds: float) -> str:
    """'1m 20s' style rendering (reference mermaid_graphs.py:9-22)."""
    seconds = round(seconds, 1)
    if seconds < 60:
        return f"{seconds:g}s"
    m, s = int(seconds // 60), seconds % 60
    if m < 60:
        return f"{m}m {s:g}s" if s else f"{m}m"
    h, m = m // 60, m % 60
    return f"{h}h {m}m"


def _task_link(task_id: str, span_id: str) -> str:
    """'#/experiments/{task}/runs/{span}' URL building (reference
    cli_pynb_log_parser.py:59-70, mermaid_graphs.py:25-46)."""
    safe_task = task_id.replace("/", "_").replace(".", "_")
    return f"#/experiments/{safe_task}/runs/{span_id}"


def make_mermaid_dag(summary: SpanSummary, run_id: str) -> str:
    """Render one run's task DAG as mermaid 'graph LR' text
    (reference mermaid_graphs.py:49-114)."""
    tasks = (
        summary.task_runs.where(F.col("run_id") == run_id)
        .select("span_id", "task_id", "duration_s", "is_success")
        .orderBy("start_time")
        .collect()
    )
    deps = (
        summary.deps.where(F.col("run_id") == run_id)
        .select("from_span_id", "to_span_id")
        .collect()
    )
    by_id = {t["span_id"]: t for t in tasks}
    lines = ["graph LR"]
    for t in tasks:
        label = f"{t['task_id']} ({_human_duration(t['duration_s'] or 0.0)})"
        mark = "" if t["is_success"] else " ❌"
        lines.append(f'    TASK_{t["span_id"]}["{label}{mark}"]')
        lines.append(
            f'    click TASK_{t["span_id"]} href "{_task_link(t["task_id"], t["span_id"])}" _self'
        )
    for d in deps:
        if d["from_span_id"] in by_id and d["to_span_id"] in by_id:
            lines.append(f'    TASK_{d["from_span_id"]} --> TASK_{d["to_span_id"]}')
    return "\n".join(lines) + "\n"


def make_mermaid_gantt(summary: SpanSummary, run_id: str, title: str = "Workflow run") -> str:
    """Render one run's tasks as a mermaid gantt chart
    (reference mermaid_graphs.py:117-161)."""
    tasks = (
        summary.task_runs.where(F.col("run_id") == run_id)
        .select("task_id", "start_time", "end_time", "duration_s", "is_success")
        .orderBy("start_time")
        .collect()
    )
    lines = [
        "gantt",
        f"    title {title}",
        "    dateFormat YYYY-MM-DDTHH:mm:ss.SSS",
        "    axisFormat %H:%M:%S",
    ]
    for t in tasks:
        status = "" if t["is_success"] else "crit, "
        start = t["start_time"].strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3]
        dur = _human_duration(t["duration_s"] or 0.0)
        lines.append(
            f"    {t['task_id']} ({dur}) : {status}{start}, {t['duration_s'] or 0}s"
        )
    return "\n".join(lines) + "\n"
