from .spans_ops import (
    filter_by_path,
    sort_by_start_time,
    span_edges,
    root_spans,
    exception_events,
    union_attributes,
    attributes_with_prefix,
    new_spans,
)
from .closure import descendants, bound_under, contains_path

__all__ = [
    "filter_by_path",
    "sort_by_start_time",
    "span_edges",
    "root_spans",
    "exception_events",
    "union_attributes",
    "attributes_with_prefix",
    "new_spans",
    "descendants",
    "bound_under",
    "contains_path",
]
