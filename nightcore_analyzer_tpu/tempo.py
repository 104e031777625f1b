"""Reference-API tempo estimators (``tempo.py:27-173``), device-backed.

``estimate_tempo`` / ``batch_estimate_tempo`` / ``estimate_ibis_global``
keep the reference's numpy-in / numpy-out signatures; internally the work
runs as jitted TPU programs (onset envelope → ACF tempogram → prior-weighted
pick → Pallas/scan DP beat tracking).  The batched production path bypasses
these wrappers (``models.analyzer``); they exist so reference callers can
switch imports without code changes.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, List, Optional

import numpy as np

from .config import AnalyzerConfig, bucket_for_duration, config_for_bucket
from .signal.io import AudioWindow

__all__ = ["MIN_BEATS", "AGREEMENT_TOLERANCE", "HOP_LENGTH",
           "IBI_HOP_LENGTH", "IBI_MIN_IBIS",
           "estimate_tempo", "batch_estimate_tempo", "estimate_ibis_global"]

# reference tempo.py:22-24,116-117
MIN_BEATS: int = 4
AGREEMENT_TOLERANCE: float = 0.08
HOP_LENGTH: int = 512
IBI_HOP_LENGTH: int = 64
IBI_MIN_IBIS: int = 4


@lru_cache(maxsize=16)
def _window_fn(n_samples: int, sr: int, hop: int):
    import jax
    import jax.numpy as jnp
    from .ops import onset, tempogram, beat

    cfg = AnalyzerConfig(sample_rate=sr, tempo_hop=hop)

    @jax.jit
    def run(y, start_bpm):
        f_valid = onset.onset_frames_valid(jnp.asarray(n_samples), hop)
        n_frames = 1 + n_samples // hop
        pad = cfg.tempo_n_fft // 2
        ypad = jnp.pad(y, (pad, pad + cfg.tempo_n_fft))
        from .ops.spectrum import frame_interleaved, interleave_params
        _, _, _, perm = interleave_params(n_frames, cfg.tempo_n_fft, hop)
        frames = frame_interleaved(ypad, n_frames, cfg.tempo_n_fft, hop)
        from .ops.onset import _stft_mel_power, _mel_basis
        from .ops import filters
        mel = _stft_mel_power(frames, jnp.asarray(filters.hann(cfg.tempo_n_fft)),
                              jnp.asarray(_mel_basis(sr, cfg.tempo_n_fft, 128)))
        mel = jnp.take(mel, jnp.asarray(perm), axis=0)[:n_frames]
        env = onset.onset_envelope_from_mel(mel, f_valid, cfg.tempo_n_fft, hop)
        acf = tempogram.tempogram_mean_acf(
            env, f_valid, win_length=int(8.0 * sr // hop))
        bpm = tempogram.tempo_from_acf(acf, start_bpm, hop_length=hop, sr=sr)
        track = beat.beat_track(env, f_valid, bpm, sr=sr, hop_length=hop,
                                search_window=cfg.dp_search_window,
                                max_beats=256)
        return bpm, track.n_beats

    return run


def estimate_tempo(window: AudioWindow, start_bpm: float = 120.0
                   ) -> Optional[float]:
    """BPM estimate for one window, or None below the beat-count gate
    (reference ``tempo.py:27-77``; both of the reference's "independent"
    estimators resolve to the ACF-prior pick, so the consensus step is the
    estimate itself)."""
    import jax.numpy as jnp
    y = np.asarray(window.audio, np.float32)
    run = _window_fn(len(y), window.sample_rate, HOP_LENGTH)
    bpm, n_beats = run(jnp.asarray(y), jnp.asarray(float(start_bpm)))
    if int(n_beats) < MIN_BEATS:
        return None
    return float(bpm)


def batch_estimate_tempo(windows: List[AudioWindow],
                         log: Optional[Callable[[str], None]] = None,
                         start_bpm: float = 120.0) -> List[Optional[float]]:
    """Per-window BPM list (reference ``tempo.py:80-111``)."""
    results: List[Optional[float]] = []
    n = len(windows)
    for i, w in enumerate(windows):
        if log:
            log(f"    tempo window {i + 1}/{n}  "
                f"[{w.start_sec:.1f}–{w.end_sec:.1f} s]")
        results.append(estimate_tempo(w, start_bpm=start_bpm))
    if log:
        valid = sum(1 for r in results if r is not None)
        log(f"    {valid}/{n} windows yielded a confident tempo estimate")
    return results


@lru_cache(maxsize=16)
def _ibi_fn(cfg: AnalyzerConfig):
    import jax
    import jax.numpy as jnp
    from .models.analyzer import _global_ibis

    @jax.jit
    def run(y, n, start_bpm):
        ibis, mask, n_ibis, valid = _global_ibis(
            y[None], n[None], start_bpm[None], cfg)
        return ibis[0], mask[0], n_ibis[0], valid[0]

    return run


def estimate_ibis_global(y: np.ndarray, sr: int,
                         hop_length: int = IBI_HOP_LENGTH,
                         min_ibis: int = IBI_MIN_IBIS,
                         start_bpm: float = 120.0) -> Optional[np.ndarray]:
    """Full-signal high-resolution inter-beat intervals (seconds), or None
    when fewer than ``min_ibis`` survive (reference ``tempo.py:120-173``,
    incl. the sub-50 ms glitch filter)."""
    import jax.numpy as jnp
    y = np.asarray(y, np.float32)
    bucket = bucket_for_duration(len(y) / sr)
    cfg = config_for_bucket(
        AnalyzerConfig(sample_rate=sr, ibi_hop=hop_length), bucket)
    buf = np.zeros(cfg.max_samples, np.float32)
    n = min(len(y), cfg.max_samples)
    buf[:n] = y[:n]
    ibis, mask, n_ibis, valid = _ibi_fn(cfg)(
        jnp.asarray(buf), jnp.asarray(n, np.int32),
        jnp.asarray(float(start_bpm)))
    if int(n_ibis) < min_ibis or not bool(valid):
        return None
    return np.asarray(ibis)[np.asarray(mask)]
