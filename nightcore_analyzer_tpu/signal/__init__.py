from .io import (AudioWindow, load_audio, strip_silence, slice_windows,  # noqa: F401
                 energy_gate, SAMPLE_RATE, WINDOW_SEC, HOP_SEC,
                 ENERGY_GATE_DB, SILENCE_STRIP_DB)
