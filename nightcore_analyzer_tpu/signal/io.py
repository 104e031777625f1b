"""Host signal I/O: decode → mono float32 @ 22 050 Hz, plus a numpy
windowing API mirroring the reference L2 (``io.py``).

Decoding runs through the first-party native codec
(:mod:`nightcore_analyzer_tpu.native` — C++ FLAC/WAV decode + polyphase
resample, replacing the reference's libsndfile/audioread/soxr stack,
SURVEY §2.2 table) with a pure-Python WAV fallback when the shared library
cannot be built.

The numpy ``strip_silence`` / ``slice_windows`` / ``energy_gate`` here exist
for API compatibility and host-side tooling (reference ``io.py:58-126``);
the production analysis path performs the same steps *on device* with masks
(:mod:`..ops.energy`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

# ── defaults (reference io.py:19-23) ─────────────────────────────────────────
SAMPLE_RATE: int = 22050
WINDOW_SEC: float = 10.0
HOP_SEC: float = 5.0
ENERGY_GATE_DB: float = -40.0
SILENCE_STRIP_DB: float = 60.0


@dataclass
class AudioWindow:
    """One time slice of an audio file (reference ``io.py:27-35``)."""
    audio: np.ndarray
    sample_rate: int
    start_sec: float
    end_sec: float
    energy_db: float


def _rms_db(audio: np.ndarray) -> float:
    rms = float(np.sqrt(np.mean(audio.astype(np.float64) ** 2)))
    return 20.0 * np.log10(max(rms, 1e-10))


def load_audio(path: str, sr: int = SAMPLE_RATE) -> tuple[np.ndarray, int]:
    """Decode *path* (FLAC/WAV via the native codec) as mono float32 @ sr."""
    from ..native import decode_audio
    y = decode_audio(str(path), target_sr=sr)
    return y, sr


def strip_silence(audio: np.ndarray, sr: int,
                  top_db: float = SILENCE_STRIP_DB):
    """Trim leading/trailing silence (librosa ``effects.trim`` semantics:
    frame RMS power vs the peak frame, frame 2048 / hop 512).
    Returns ``(trimmed, leading_sec, trailing_sec)``."""
    frame, hop = 2048, 512
    n = len(audio)
    if n == 0:
        return audio, 0.0, 0.0
    ypad = np.pad(audio.astype(np.float64), (frame // 2, frame // 2))
    n_frames = 1 + n // hop
    sq = ypad * ypad
    cs = np.concatenate([[0.0], np.cumsum(sq)])
    starts = np.arange(n_frames) * hop
    power = (cs[starts + frame] - cs[starts]) / frame
    db = 10.0 * np.log10(np.maximum(power, 1e-10) / max(power.max(), 1e-10))
    nonsilent = np.flatnonzero(db > -top_db)
    if len(nonsilent) == 0:
        return audio[:0], 0.0, n / sr
    start = int(nonsilent[0] * hop)
    end = int(min((nonsilent[-1] + 1) * hop, n))
    return audio[start:end], start / sr, (n - end) / sr


def slice_windows(audio: np.ndarray, sr: int,
                  window_sec: float = WINDOW_SEC,
                  hop_sec: float = HOP_SEC) -> List[AudioWindow]:
    """Overlapping fixed-length windows; short tails dropped
    (reference ``io.py:82-112``)."""
    win_n = int(window_sec * sr)
    hop_n = int(hop_sec * sr)
    out: List[AudioWindow] = []
    start = 0
    while start + win_n <= len(audio):
        chunk = audio[start:start + win_n]
        out.append(AudioWindow(chunk, sr, start / sr, (start + win_n) / sr,
                               _rms_db(chunk)))
        start += hop_n
    return out


def energy_gate(windows: List[AudioWindow],
                threshold_db: float = ENERGY_GATE_DB) -> List[AudioWindow]:
    """Drop windows more than ``|threshold_db|`` below the loudest
    (reference ``io.py:115-126``)."""
    if not windows:
        return windows
    peak = max(w.energy_db for w in windows)
    return [w for w in windows if w.energy_db >= peak + threshold_db]
