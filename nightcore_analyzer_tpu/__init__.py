"""nightcore_analyzer_tpu — TPU-native windowed-consensus audio analyzer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``Tealdragon204/nightcore-to-flac-analyzer`` (reference mounted read-only at
``/root/reference``): extracts the precise tempo ratio and pitch ratio
between a nightcore track and its lossless source, with bootstrap confidence
intervals, alignment classification, and the Rubber Band / sox parameters
needed to reconstruct one file from the other — batched over corpora of file
pairs across TPU chips.

Public API mirrors the reference package root (``__init__.py:20-26``):

    from nightcore_analyzer_tpu import run
    result = run("nightcore.flac", "source.flac")
    print(result)

Top-level attributes are resolved lazily so that subsystems (ops, native
codec, GUI) can be imported independently without pulling in the whole stack.
"""

from __future__ import annotations

import importlib
import os
from pathlib import Path
from typing import Any

# Every entry point (CLI, workflow, GUI, batch driver) gets the persistent
# XLA compile cache, not just bench.py — without it each invocation pays a
# minutes-long cold compile of the analysis program.  Respect an explicit
# env override; prefer the repo-level .jax_cache (committed, pre-warmed)
# when it exists, else a user cache dir.
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    _repo_cache = Path(__file__).resolve().parent.parent / ".jax_cache"
    if not _repo_cache.is_dir():
        _repo_cache = Path.home() / ".cache" / "nightcore_analyzer_tpu" / "jax"
        try:
            _repo_cache.mkdir(parents=True, exist_ok=True)
        except OSError:
            _repo_cache = None
    if _repo_cache is not None:
        os.environ["JAX_COMPILATION_CACHE_DIR"] = str(_repo_cache)
        import sys as _sys
        if "jax" in _sys.modules:      # env read happens at jax import time
            try:
                _sys.modules["jax"].config.update(
                    "jax_compilation_cache_dir", str(_repo_cache))
            except Exception:          # noqa: BLE001 — cache is best-effort
                pass

__version__ = "0.3.0"
__all__ = ["run", "AnalysisResult", "export", "session", "__version__"]

_LAZY = {
    "run": ("nightcore_analyzer_tpu.analyze.pipeline", "run"),
    "AnalysisResult": ("nightcore_analyzer_tpu.analyze.result", "AnalysisResult"),
    "export": ("nightcore_analyzer_tpu.export", None),
    "session": ("nightcore_analyzer_tpu.session", None),
}


def __getattr__(name: str) -> Any:
    if name in _LAZY:
        mod_name, attr = _LAZY[name]
        mod = importlib.import_module(mod_name)
        value = getattr(mod, attr) if attr else mod
        globals()[name] = value
        return value
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
