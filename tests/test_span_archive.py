"""Span archive: summarize(parquet archive) == summarize(raw JSONL)."""

from composable_logs_spark.plans import summarize_spans
from composable_logs_spark.spanlog import SpanWriter, read_span_jsonl
from composable_logs_spark.spanlog import fixtures as FX
from composable_logs_spark.spanlog.archive import archive_spans, read_span_archive


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_archive_summarize_equivalence(spark, tmp_path):
    log_dir = tmp_path / "log"
    archive = tmp_path / "archive"
    log_dir.mkdir()
    SpanWriter(log_dir).write_many(FX.compose3(0))
    SpanWriter(log_dir).write_many(FX.parallel_fail(1))

    archive_spans(spark, log_dir, archive)

    raw = summarize_spans(read_span_jsonl(spark, log_dir))
    arch = summarize_spans(read_span_archive(spark, archive))
    assert _rows(arch.task_runs) == _rows(raw.task_runs)
    assert _rows(arch.workflow_runs) == _rows(raw.workflow_runs)
    assert _rows(arch.deps) == _rows(raw.deps)

    # layout: hive date partitions exist
    parts = [p.name for p in archive.iterdir() if p.name.startswith("archive_date=")]
    assert parts, list(archive.iterdir())
