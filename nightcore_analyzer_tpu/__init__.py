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
from typing import Any

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
