from .summarize import SpanSummary, summarize_spans

__all__ = ["SpanSummary", "summarize_spans"]
