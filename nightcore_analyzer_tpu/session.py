"""Session persistence — lightweight JSON key-value store.

GUI/workflow state (last file paths, parameter values) survives across
launches, mirroring the reference store (``session.py:15-41``) but writing
atomically (tmp + rename) and tolerating concurrent writers.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path
from typing import Any

_SESSION_FILE = Path.home() / ".nightcore_analyzer_tpu_session.json"

__all__ = ["get", "set", "set_many", "session_path"]


def session_path() -> Path:
    return _SESSION_FILE


def _load() -> dict:
    try:
        return json.loads(_SESSION_FILE.read_text(encoding="utf-8"))
    except (FileNotFoundError, json.JSONDecodeError, OSError):
        return {}


def _store(data: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=str(_SESSION_FILE.parent),
                               prefix=_SESSION_FILE.name, suffix=".tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            json.dump(data, fh, indent=2)
        os.replace(tmp, _SESSION_FILE)
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass


def get(key: str, default: Any = None) -> Any:
    """Stored value for *key*, or *default*."""
    return _load().get(key, default)


def set(key: str, value: Any) -> None:  # noqa: A001 — reference API name
    data = _load()
    data[key] = value
    _store(data)


def set_many(updates: dict) -> None:
    data = _load()
    data.update(updates)
    _store(data)
