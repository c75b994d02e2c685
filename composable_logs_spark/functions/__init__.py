from .notebooks import (
    jupytext_to_ipynb,
    ipynb_to_html,
    evaluate_notebook,
    make_jupytext_task,
)

__all__ = [
    "jupytext_to_ipynb",
    "ipynb_to_html",
    "evaluate_notebook",
    "make_jupytext_task",
]
