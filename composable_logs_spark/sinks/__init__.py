from .directory import write_spans_to_directory
from .mermaid import make_mermaid_dag, make_mermaid_gantt
from .static_data import write_static_data

__all__ = [
    "write_spans_to_directory",
    "make_mermaid_dag",
    "make_mermaid_gantt",
    "write_static_data",
]
