"""Coverage queries for the individual Spans operators (SURVEY §2.2-2.6)
that the composite summaries exercise only indirectly. Deterministic
fixtures → VALUES oracles.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import QuerySpec
from ..operators import (
    descendants,
    exception_events,
    root_spans,
    span_edges,
    union_attributes,
)
from ..spanlog import fixtures as FX
from ..spanlog.schema import SPAN_SCHEMA


def _spans_df(spark: SparkSession, span_dicts) -> DataFrame:
    from .span_q import _spans_df as _memoized

    return _memoized(spark, span_dicts)


def _run_id(i: int) -> str:
    return f"0x{i:032x}"


# ---------------------------------------------------------------------------
# A5: exception flattening across a span set.
def spanlog_exceptions(spark: SparkSession, sf: str) -> DataFrame:
    spans = _spans_df(spark, FX.parallel_fail(1) + FX.timeout_fixture(3))
    return exception_events(spans).select(
        "exception_type", "exception_message"
    )


EXCEPTIONS_SQL = """
SELECT exception_type, exception_message FROM (VALUES
  ('ValueError', 'task g failed'),
  ('Exception', 'Timeout error: execution did not finish within timeout limit')
) AS t(exception_type, exception_message)
"""


# ---------------------------------------------------------------------------
# J6/U2: root finding — the dag-top-span of each run.
def spanlog_roots(spark: SparkSession, sf: str) -> DataFrame:
    spans = _spans_df(spark, FX.compose3(0) + FX.diamond5(2))
    return root_spans(spans).select(
        F.col("context.trace_id").alias("run_id"), "name"
    )


ROOTS_SQL = f"""
SELECT run_id, name FROM (VALUES
  ('{_run_id(0)}', 'dag-top-span'),
  ('{_run_id(2)}', 'dag-top-span')
) AS t(run_id, name)
"""


# ---------------------------------------------------------------------------
# J2/J3: closure — descendant count per execute-task span of compose3.
# input_1/input_2 subtrees: timeout-guard + call-python-function = 2;
# process adds two legacy task-dependency spans = 4.
def spanlog_descendant_counts(spark: SparkSession, sf: str) -> DataFrame:
    spans = _spans_df(spark, FX.compose3(0))
    closure = descendants(span_edges(spans.withColumn("run_id", F.col("context.trace_id"))))
    tasks = spans.where(F.col("name") == "execute-task").select(
        F.col("context.trace_id").alias("run_id"),
        F.col("context.span_id").alias("ancestor_span_id"),
        F.col("attributes").getItem("task.id").alias("task_id"),
    )
    return (
        tasks.join(closure, ["run_id", "ancestor_span_id"])
        .groupBy("task_id")
        .agg(F.count("*").alias("n_descendants"))
    )


DESCENDANTS_SQL = """
SELECT task_id, n_descendants FROM (VALUES
  ('input_1', CAST(2 AS BIGINT)),
  ('input_2', CAST(2 AS BIGINT)),
  ('process', CAST(4 AS BIGINT))
) AS t(task_id, n_descendants)
"""


# ---------------------------------------------------------------------------
# A1: conflict-checked attribute union over a run's spans (workflow scope).
def spanlog_attr_union(spark: SparkSession, sf: str) -> DataFrame:
    spans = _spans_df(spark, FX.compose3(0))
    return union_attributes(spans, prefixes=("workflow.",)).select(
        "key", "value", "n_values"
    )


ATTR_UNION_SQL = """
SELECT key, value, CAST(n_values AS INT) AS n_values FROM (VALUES
  ('workflow.env', 'xyz', 1)
) AS t(key, value, n_values)
"""


# ---------------------------------------------------------------------------
# A9/O3: last-value-wins dedup of a twice-logged name (legacy reader).
def spanlog_last_value_wins(spark: SparkSession, sf: str) -> DataFrame:
    spans = _spans_df(spark, FX.dup_value_error(6))
    named = spans.where(F.col("name") == "named-value").select(
        F.col("attributes").getItem("name").alias("name"),
        F.col("attributes").getItem("content_encoded").alias("value"),
        F.to_timestamp("start_time").alias("start_time"),
    )
    w = W.partitionBy("name").orderBy(F.col("start_time").desc())
    return (
        named.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("name", "value")
    )


LAST_VALUE_SQL = """
SELECT name, value FROM (VALUES ('twice', 'dup-b')) AS t(name, value)
"""


QUERIES = {
    "spanlog_exceptions": QuerySpec(spanlog_exceptions, EXCEPTIONS_SQL),
    "spanlog_roots": QuerySpec(spanlog_roots, ROOTS_SQL),
    "spanlog_descendant_counts": QuerySpec(spanlog_descendant_counts, DESCENDANTS_SQL),
    "spanlog_attr_union": QuerySpec(spanlog_attr_union, ATTR_UNION_SQL),
    "spanlog_last_value_wins": QuerySpec(spanlog_last_value_wins, LAST_VALUE_SQL),
}


# ---------------------------------------------------------------------------
# Failure root-cause: per failed run, the EARLIEST failed task (start
# time, task_id tie-break) — the reference's is_success/exception model
# (A5-A7) turned into the "what broke first" triage query every
# multi-run dashboard needs. One window over the (small) failed subset.
def spanlog_failure_root_cause(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..plans import summarize_spans

    spans = _spans_df(
        spark,
        FX.parallel_fail(1) + FX.diamond5(2, fail_at="t2") + FX.timeout_fixture(3),
    )
    s = summarize_spans(spans)
    failed = s.task_runs.where(~F.col("is_success"))
    w = W.partitionBy("run_id").orderBy("start_time", "task_id")
    rc = (
        failed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("run_id", F.col("task_id").alias("root_cause_task_id"), "n_exceptions")
    )
    nf = failed.groupBy("run_id").agg(F.count("*").cast("int").alias("n_failed_tasks"))
    return (
        rc.join(nf, "run_id")
        .join(
            s.workflow_runs.select(
                "run_id", F.col("duration_s").alias("run_duration_s")
            ),
            "run_id",
        )
        .select(
            "run_id",
            "root_cause_task_id",
            F.col("n_exceptions").cast("int").alias("n_exceptions"),
            "n_failed_tasks",
            F.col("run_duration_s").cast("double").alias("run_duration_s"),
        )
    )


ROOT_CAUSE_SQL = f"""
SELECT run_id, root_cause_task_id,
       CAST(n_exceptions AS INT) AS n_exceptions,
       CAST(n_failed_tasks AS INT) AS n_failed_tasks,
       CAST(run_duration_s AS DOUBLE) AS run_duration_s
FROM (VALUES
  ('{_run_id(1)}', 'g', 1, 1, 2.0),
  ('{_run_id(2)}', 't2', 1, 1, 2.5),
  ('{_run_id(3)}', 'stuck', 1, 1, 0.5)
) AS t(run_id, root_cause_task_id, n_exceptions, n_failed_tasks, run_duration_s)
"""

QUERIES["spanlog_failure_root_cause"] = QuerySpec(
    spanlog_failure_root_cause, ROOT_CAUSE_SQL
)
