"""Reference-API cross-correlation estimators (``xcorr.py``), device-backed.

* :func:`estimate_speed_xcorr` — file-path API for the ≈same-speed verifier
  (``xcorr.py:54-162``), used by the workflow's verification step.
* :func:`find_content_offset` — array API for intro-offset detection
  (``xcorr.py:165-259``), used by the pipeline's auto-align.
* :func:`quality_label` + the tunable constants (``xcorr.py:33-51``).
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path
from typing import Tuple, Union

import numpy as np

from .config import AnalyzerConfig, bucket_for_duration, config_for_bucket

__all__ = ["XCORR_SR", "XCORR_N_WINDOWS", "XCORR_WINDOW_SEC",
           "XCORR_SEARCH_RANGE", "XCORR_SKIP_EDGES", "XCORR_RMS_GATE",
           "XCORR_QUALITY_GOOD", "XCORR_QUALITY_FAIR",
           "ALIGN_SR", "ALIGN_HOP", "ALIGN_SPEED_LO", "ALIGN_SPEED_HI",
           "ALIGN_N_SPEEDS", "ALIGN_MAX_OFFSET", "ALIGN_MIN_OFFSET",
           "estimate_speed_xcorr", "find_content_offset", "quality_label"]

# reference xcorr.py:33-51
XCORR_SR: int = 22050
XCORR_N_WINDOWS: int = 20
XCORR_WINDOW_SEC: float = 3.0
XCORR_SEARCH_RANGE: float = 0.05
XCORR_SKIP_EDGES: float = 0.10
XCORR_RMS_GATE: float = 1e-3
XCORR_QUALITY_GOOD: float = 0.70
XCORR_QUALITY_FAIR: float = 0.40

ALIGN_SR: int = 11025
ALIGN_HOP: int = 512
ALIGN_SPEED_LO: float = 1.03
ALIGN_SPEED_HI: float = 1.50
ALIGN_N_SPEEDS: int = 30
ALIGN_MAX_OFFSET: float = 120.0
ALIGN_MIN_OFFSET: float = 1.0


@lru_cache(maxsize=8)
def _verify_fn(cfg: AnalyzerConfig):
    import jax
    from .ops.verify import estimate_speed_xcorr_arrays
    return jax.jit(lambda a, na, b, nb: estimate_speed_xcorr_arrays(
        a, b, na, nb, cfg))


@lru_cache(maxsize=8)
def _align_fn(cfg: AnalyzerConfig):
    import jax
    from .ops.align import find_content_offset as fco
    return jax.jit(lambda s, m, ns, nn: fco(s, m, ns, nn, cfg))


def _pad(y, cfg):
    import jax.numpy as jnp
    buf = np.zeros(cfg.max_samples, np.float32)
    n = min(len(y), cfg.max_samples)
    buf[:n] = y[:n]
    return jnp.asarray(buf), jnp.asarray(n, np.int32)


def estimate_speed_xcorr(path_a: Union[str, Path], path_b: Union[str, Path],
                         sr: int = XCORR_SR, **_ignored
                         ) -> Tuple[float, float]:
    """speed_A / speed_B by windowed waveform cross-correlation; (1.0, 0.0)
    when fewer than 3 correspondences validate (reference ``xcorr.py:54-162``)."""
    from .signal.io import load_audio
    ya, _ = load_audio(str(path_a), sr=sr)
    yb, _ = load_audio(str(path_b), sr=sr)
    bucket = bucket_for_duration(max(len(ya), len(yb)) / sr)
    cfg = config_for_bucket(AnalyzerConfig(sample_rate=sr), bucket)
    a, na = _pad(ya, cfg)
    b, nb = _pad(yb, cfg)
    ratio, quality = _verify_fn(cfg)(a, na, b, nb)
    return float(np.asarray(ratio)), float(np.asarray(quality))


def find_content_offset(src_audio: np.ndarray, nc_audio: np.ndarray,
                        sr: int, **_ignored) -> Tuple[float, float]:
    """(offset_sec, speed_est) of the source intro not present in the
    nightcore (reference ``xcorr.py:165-259``)."""
    bucket = bucket_for_duration(max(len(src_audio), len(nc_audio)) / sr)
    cfg = config_for_bucket(AnalyzerConfig(sample_rate=sr), bucket)
    s, ns = _pad(src_audio, cfg)
    m, nn = _pad(nc_audio, cfg)
    off, speed = _align_fn(cfg)(s, m, ns, nn)
    return float(np.asarray(off)), float(np.asarray(speed))


def quality_label(quality: float) -> str:
    """Human-readable xcorr quality label (reference ``xcorr.py:262-268``)."""
    if quality >= XCORR_QUALITY_GOOD:
        return "good match"
    if quality >= XCORR_QUALITY_FAIR:
        return "moderate match"
    return "poor match — possible content mismatch or heavy lossy artefacts"
