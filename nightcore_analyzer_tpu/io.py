"""Module-path compatibility: ``nightcore_analyzer_tpu.io`` mirrors the
reference's ``nightcore_analyzer.io`` surface (``io.py:19-126``).

The implementations live in :mod:`.signal.io` (host) and :mod:`.ops.energy`
(device); this shim re-exports the host API under the reference's module
name so existing imports translate one-for-one.
"""

from .signal.io import (  # noqa: F401
    SAMPLE_RATE, WINDOW_SEC, HOP_SEC, ENERGY_GATE_DB, SILENCE_STRIP_DB,
    AudioWindow, load_audio, strip_silence, slice_windows, energy_gate)

__all__ = ["SAMPLE_RATE", "WINDOW_SEC", "HOP_SEC", "ENERGY_GATE_DB",
           "SILENCE_STRIP_DB", "AudioWindow", "load_audio", "strip_silence",
           "slice_windows", "energy_gate"]
