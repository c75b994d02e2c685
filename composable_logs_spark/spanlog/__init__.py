from .schema import SPAN_SCHEMA, span_row
from .codec import SerializedData
from .writer import SpanWriter
from .sources import read_span_jsonl, read_span_json, read_spans_from_zip

__all__ = [
    "SPAN_SCHEMA",
    "span_row",
    "SerializedData",
    "SpanWriter",
    "read_span_jsonl",
    "read_span_json",
    "read_spans_from_zip",
]
