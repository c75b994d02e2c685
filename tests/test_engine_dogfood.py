"""End-to-end dogfood: a DAG whose task bodies are this engine's own
Spark queries over the testdata, span-logged by the orchestrator, the
resulting span log archived columnar, and the summaries computed from
the archive — every layer of the engine in one flow."""

from composable_logs_spark.orchestrator import Success, get_task_context, run_dag, task
from composable_logs_spark.plans import summarize_spans
from composable_logs_spark.queries import all_queries
from composable_logs_spark.spanlog.archive import archive_spans, read_span_archive


def test_dag_of_spark_queries(spark, sf_dir, tmp_path):
    log_dir = tmp_path / "log"
    archive = tmp_path / "archive"
    qs = all_queries()

    @task(task_id="tpch_q6")
    def q6():
        n = qs["q6_forecast_revenue"].fn(spark, sf_dir).count()
        get_task_context().log_value("q6_rows", n)
        return n

    @task(task_id="dedup_exact")
    def dedup():
        n = qs["dedup_exact"].fn(spark, sf_dir).count()
        get_task_context().log_value("dedup_rows", n)
        return n

    @task(task_id="report")
    def report(a, b):
        get_task_context().log_value("total_rows", a + b)
        return a + b

    res = run_dag(
        report(q6(), dedup()),
        workflow_parameters={"env": "dogfood"},
        log_dir=log_dir,
    )
    assert isinstance(res, Success)

    archive_spans(spark, log_dir, archive)
    s = summarize_spans(read_span_archive(spark, archive))

    rows = {r["task_id"]: r for r in s.task_runs.collect()}
    assert set(rows) == {"tpch_q6", "dedup_exact", "report"}
    assert all(r["is_success"] for r in rows.values())

    ids = {r["span_id"]: r["task_id"] for r in rows.values()}
    vals = {
        (ids[r["task_span_id"]], r["name"]): r["value_long"]
        for r in s.logged_values.collect()
    }
    assert vals[("tpch_q6", "q6_rows")] is not None
    assert vals[("report", "total_rows")] == (
        vals[("tpch_q6", "q6_rows")] + vals[("dedup_exact", "dedup_rows")]
    )

    deps = {(ids[r["from_span_id"]], ids[r["to_span_id"]]) for r in s.deps.collect()}
    assert deps == {("tpch_q6", "report"), ("dedup_exact", "report")}
