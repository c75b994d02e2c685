"""Workflow attribute harvesting from CI environment (SURVEY §2.7 C13,
§2.2 F5).

Reference: run_pipeline_helpers.py:13-99 — collect GITHUB_* environment
variables into ``workflow.github.*`` attributes (lower-cased, ``github_``
prefix stripped), refusing anything that smells like a credential
(token/secret/password guard, run_pipeline_helpers.py:89-92).
"""

from __future__ import annotations

import os
from typing import Mapping, Optional

_SECRET_MARKERS = ("token", "secret", "password", "key")

_HARVESTED = (
    "GITHUB_REPOSITORY",
    "GITHUB_WORKFLOW",
    "GITHUB_RUN_ID",
    "GITHUB_RUN_NUMBER",
    "GITHUB_SHA",
    "GITHUB_REF",
    "GITHUB_ACTOR",
    "GITHUB_JOB",
    "GITHUB_BASE_REF",
    "GITHUB_HEAD_REF",
    "GITHUB_EVENT_NAME",
)


def github_env_attributes(env: Optional[Mapping[str, str]] = None) -> dict[str, str]:
    """Build ``workflow.github.*`` attributes from the environment.

    Only a fixed allow-list is harvested, and any name containing a
    credential marker is rejected outright — even if allow-listed by
    mistake in a future edit.
    """
    env = os.environ if env is None else env
    out: dict[str, str] = {}
    for name in _HARVESTED:
        if any(m in name.lower() for m in _SECRET_MARKERS):
            continue
        value = env.get(name)
        if value is None or value == "":
            continue
        attr = "workflow.github." + name.lower().removeprefix("github_")
        out[attr] = str(value)
    return out
