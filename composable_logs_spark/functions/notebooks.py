"""Notebook tasks: jupytext-format conversion + papermill-style execution
(SURVEY §2.8 D2, §2.7 C14/C15).

Reference: notebooks_helpers.py:26-154 (jupytext→ipynb and ipynb→HTML via
the jupytext/nbconvert libraries) and tasks/tasks.py:16-79
(``make_jupytext_task``: run the notebook with injected parameters, log
the evaluated notebook as an artifact even when it fails, kill on
timeout).

Neither jupytext nor nbconvert nor papermill ships in this environment,
so the conversions are implemented directly for the jupytext *percent*
format subset the reference uses (``# %%`` / ``# %% [markdown]`` cell
markers) and execution is a sequential exec of code cells in one shared
namespace with stdout capture — the same observable contract
(parameters injected, partial outputs retained on failure). If the real
libraries are importable they are used instead.
"""

from __future__ import annotations

import contextlib
import io
import json
import traceback
from typing import Any, Optional

from ..orchestrator.core import task, get_task_context

# Per-cell full checkpoints are exact (lose at most the running cell on
# a kill) but O(cells²) bytes; past this size the saver switches to a
# geometric byte budget (see make_jupytext_task).
_CKPT_EVERY_CELL_MAX_BYTES = 256 * 1024
_CKPT_GROWTH = 1.5


def jupytext_to_ipynb(py_src: str) -> dict:
    """C15: percent-format python text -> nbformat-v4 notebook dict."""
    try:  # real library if present
        import jupytext  # type: ignore

        return json.loads(jupytext.writes(jupytext.reads(py_src, fmt="py:percent"), fmt="ipynb"))
    except ImportError:
        pass

    cells: list[dict] = []
    current: list[str] = []
    current_type = "code"

    def flush():
        if current or current_type == "code" and not cells:
            src = "\n".join(current).strip("\n")
            if current_type == "markdown":
                src = "\n".join(
                    line[2:] if line.startswith("# ") else line.lstrip("#")
                    for line in src.splitlines()
                )
            cells.append(
                {
                    "cell_type": current_type,
                    "metadata": {},
                    "source": src,
                    **({"outputs": [], "execution_count": None} if current_type == "code" else {}),
                }
            )

    started = False
    for line in py_src.splitlines():
        stripped = line.strip()
        if stripped.startswith("# %%"):
            if started:
                flush()
            current = []
            current_type = "markdown" if "[markdown]" in stripped else "code"
            started = True
        else:
            current.append(line)
    flush()
    return {
        "nbformat": 4,
        "nbformat_minor": 5,
        "metadata": {"kernelspec": {"name": "python3", "language": "python", "display_name": "Python 3"}},
        "cells": cells,
    }


def ipynb_to_html(nb: dict) -> str:
    """C14: notebook dict -> standalone HTML."""
    try:
        import nbconvert  # type: ignore
        import nbformat  # type: ignore

        exporter = nbconvert.HTMLExporter()
        body, _ = exporter.from_notebook_node(nbformat.from_dict(nb))
        return body
    except ImportError:
        pass

    parts = ["<html><head><meta charset='utf-8'></head><body>"]
    for cell in nb.get("cells", []):
        src = cell.get("source", "")
        if isinstance(src, list):
            src = "".join(src)
        if cell.get("cell_type") == "markdown":
            parts.append(f"<div class='markdown'><p>{_escape(src)}</p></div>")
        else:
            parts.append(f"<pre class='code'>{_escape(src)}</pre>")
            for out in cell.get("outputs", []):
                text = out.get("text", "")
                if isinstance(text, list):
                    text = "".join(text)
                if text:
                    parts.append(f"<pre class='output'>{_escape(text)}</pre>")
    parts.append("</body></html>")
    return "\n".join(parts)


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def evaluate_notebook(
    nb: dict,
    parameters: Optional[dict[str, Any]] = None,
    on_cell: Optional[Any] = None,
) -> tuple[dict, Optional[BaseException]]:
    """Papermill-style execution: inject a parameters cell, exec code
    cells in one namespace, capture stdout into cell outputs. Returns
    (evaluated notebook, first error or None) — the partially evaluated
    notebook is returned even on failure (reference logs it as an
    artifact regardless, tasks/tasks.py:44-66).

    ``on_cell(nb[, cell])``: called after EVERY executed cell (including
    the failing one) — papermill's incremental-save model; two-parameter
    callbacks also receive the just-executed cell dict so the caller can
    account checkpoint cost per cell without re-serializing the whole
    notebook. ``make_jupytext_task`` checkpoints the partial notebook as
    an artifact through it, which is what makes a hard-killed stuck
    notebook (reference test_stuck_notebook.py) still leave its partial
    ``notebook.ipynb`` behind: the kill can lose at most the
    currently-running cell, never the completed ones (for large
    notebooks, at most the current byte-budget window — see
    ``make_jupytext_task``)."""
    nb = json.loads(json.dumps(nb))  # deep copy
    cells = nb.get("cells", [])
    if parameters:
        param_src = "\n".join(f"{k} = {v!r}" for k, v in parameters.items())
        cells.insert(
            0,
            {
                "cell_type": "code",
                "metadata": {"tags": ["injected-parameters"]},
                "source": param_src,
                "outputs": [],
                "execution_count": None,
            },
        )
    ns: dict[str, Any] = {"__name__": "__main__"}
    error: Optional[BaseException] = None
    count = 0

    def notify(cell: dict) -> None:
        if on_cell is None:
            return
        import inspect

        if len(inspect.signature(on_cell).parameters) >= 2:
            on_cell(nb, cell)
        else:
            on_cell(nb)

    for cell in cells:
        if cell.get("cell_type") != "code":
            continue
        count += 1
        cell["execution_count"] = count
        src = cell.get("source", "")
        if isinstance(src, list):
            src = "".join(src)
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                exec(compile(src, f"<cell {count}>", "exec"), ns)  # noqa: S102
        except BaseException as e:  # noqa: BLE001 — recorded in outputs
            error = e
            cell["outputs"] = [
                {
                    "output_type": "error",
                    "ename": type(e).__name__,
                    "evalue": str(e),
                    "traceback": traceback.format_exception(e),
                }
            ]
            notify(cell)
            break
        text = buf.getvalue()
        cell["outputs"] = (
            [{"output_type": "stream", "name": "stdout", "text": text}] if text else []
        )
        notify(cell)
    return nb, error


def make_jupytext_task(
    py_src: str,
    task_id: str,
    task_parameters: Optional[dict[str, Any]] = None,
    num_cpus: int = 1,
    timeout_s: Optional[float] = None,
    executor: str = "process",
):
    """D2: a DAG node that evaluates a jupytext notebook, always logging
    the evaluated ``notebook.ipynb`` artifact (even on failure; the
    summariser derives ``notebook.html``).

    ``executor="process"`` (default) runs the notebook in a forked
    child — the analogue of papermill's separate kernel process, so a
    ``timeout_s`` on a STUCK cell hard-kills the kernel (reference
    test_stuck_notebook.py) while every completed cell's state
    survives: the notebook is checkpointed as the ``notebook.ipynb``
    artifact after each cell (papermill's incremental save), each
    checkpoint durably fsync'd before the next cell starts, and the
    summariser keeps the LAST version per artifact name (the directory
    sink's overwrite-by-name semantics).

    Checkpoint cost is SIZE-BOUNDED: a full save per cell is O(cells²)
    bytes for a large notebook, so once the notebook outgrows
    ``_CKPT_EVERY_CELL_MAX_BYTES`` the per-cell save switches to a
    geometric byte budget — checkpoint only when the notebook has grown
    ``_CKPT_GROWTH``x since the last save. Checkpoint sizes then grow
    geometrically, so total checkpoint bytes stay O(final size), and a
    SIGKILL loses at most the current budget window (~1/3 of the
    notebook at growth 1.5) instead of "at most one cell" — small
    notebooks (under the threshold) keep the exact per-cell guarantee.
    The terminal state is always logged in full, including on cell
    error, so only hard kills ever see a stale window. Pass
    ``executor="thread"`` for bodies that must share the driver process
    (e.g. notebooks using the shared SparkSession through a closure)."""

    @task(
        task_id=task_id,
        task_parameters={**(task_parameters or {}), "task.type": "jupytext"},
        num_cpus=num_cpus,
        timeout_s=timeout_s,
        executor=executor,
    )
    def run_notebook(*upstream):
        ctx = get_task_context()
        nb = jupytext_to_ipynb(py_src)
        params = {
            k.split(".", 1)[1].replace(".", "_"): v
            for k, v in ctx.parameters.items()
        }

        # size-bounded incremental save state (see docstring): approx
        # notebook size is accumulated per cell — never re-serializing
        # the whole notebook just to decide whether to save it
        approx = [0.0, 0.0]  # [approx total bytes, bytes at last save]

        def checkpoint(state: dict, cell: dict) -> None:
            # papermill incremental save: the artifact name is constant;
            # the summariser's last-value-wins keeps the newest state
            approx[0] += len(json.dumps(cell))
            if (
                approx[0] > _CKPT_EVERY_CELL_MAX_BYTES
                and approx[0] < approx[1] * _CKPT_GROWTH
            ):
                return  # inside the byte-budget window: skip the save
            approx[1] = approx[0]
            ctx.log_artefact("notebook.ipynb", json.dumps(state))

        evaluated, error = evaluate_notebook(
            nb, {"P": params}, on_cell=checkpoint
        )
        ctx.log_artefact("notebook.ipynb", json.dumps(evaluated))
        if error is not None:
            raise error
        return evaluated

    return run_notebook
