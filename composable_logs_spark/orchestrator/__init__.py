from .core import (
    Try,
    Success,
    Failure,
    ExceptionGroup_,
    task,
    run_dag,
    Node,
    get_task_context,
    TaskContext,
)

__all__ = [
    "Try",
    "Success",
    "Failure",
    "ExceptionGroup_",
    "task",
    "run_dag",
    "Node",
    "get_task_context",
    "TaskContext",
]
