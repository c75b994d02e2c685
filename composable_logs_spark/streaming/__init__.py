from .ingest import read_span_stream, stream_task_runs, SpanRecorder

__all__ = ["read_span_stream", "stream_task_runs", "SpanRecorder"]
