"""Reference-API pitch estimation (``pitch.py:100-291``), device-backed.

``estimate_pitch_chroma`` / ``estimate_pitch_combined`` keep the reference
signatures and the implied-Hz output convention (src list ≡ 440 Hz, nc list
``440·2^(st/12)`` per chunk) so the lists drop straight into
``consensus.build_result``.  The chroma itself is the TPU dual-stream CQT
matmul (:mod:`.ops.chroma`).

MELODIA refinement mirrors the reference's optionality: it requires the
``essentia`` C++ library, is attempted via the same never-raising import
probe, and is skipped cleanly when absent (``pitch.py:178-184``).  Unlike
the reference — which simply loses sub-semitone pitch without essentia —
this build falls back to its own harmonic-summation F0 tracker
(:func:`estimate_pitch_tpu_f0`, :mod:`.ops.f0`), gated by the same ±1.5 st
chroma-agreement rule.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, List, Optional, Tuple

import numpy as np

from .config import AnalyzerConfig, bucket_for_duration, config_for_bucket

__all__ = ["CHROMA_BINS_PER_OCTAVE", "CHROMA_HOP_LENGTH", "CHUNK_SEC",
           "MIN_CHUNKS", "MELODIA_AGREE_ST",
           "estimate_pitch_chroma", "estimate_pitch_melodia",
           "estimate_pitch_tpu_f0", "estimate_pitch_combined"]

# reference pitch.py:42-50
CHROMA_BINS_PER_OCTAVE: int = 36
CHROMA_HOP_LENGTH: int = 512
CHUNK_SEC: float = 20.0
MIN_CHUNKS: int = 3
MELODIA_AGREE_ST: float = 1.5
_REF_HZ: float = 440.0


@lru_cache(maxsize=8)
def _pitch_fn(cfg: AnalyzerConfig):
    import jax
    import jax.numpy as jnp
    from .models.analyzer import _pitch

    @jax.jit
    def run(nc, n_nc, src, n_src):
        ys = jnp.stack([nc, src])
        ns = jnp.stack([n_nc, n_src])
        return _pitch(ys, ns, cfg)

    return run


def estimate_pitch_chroma(src_audio: np.ndarray, nc_audio: np.ndarray,
                          sr: int,
                          log: Optional[Callable[[str], None]] = None):
    """CQT-chroma cyclic-xcorr pitch shift (reference ``pitch.py:100-173``).

    Returns ``(src_hz, nc_hz, point_st, (ci_lo_st, ci_hi_st), n_chunks)``.
    """
    import jax.numpy as jnp
    bucket = bucket_for_duration(max(len(src_audio), len(nc_audio)) / sr)
    cfg = config_for_bucket(AnalyzerConfig(sample_rate=sr), bucket)

    def pad(y):
        buf = np.zeros(cfg.max_samples, np.float32)
        n = min(len(y), cfg.max_samples)
        buf[:n] = y[:n]
        return jnp.asarray(buf), jnp.asarray(n, np.int32)

    nc_b, n_nc = pad(nc_audio)
    src_b, n_src = pad(src_audio)
    (shifts, cmask, n_eff, point, st_lo, st_hi,
     *_rest) = _pitch_fn(cfg)(nc_b, n_nc, src_b, n_src)

    shifts = np.asarray(shifts)[np.asarray(cmask)]
    n_chunks = int(n_eff)
    point_st = float(point)
    ci = (float(st_lo), float(st_hi))
    if n_chunks < MIN_CHUNKS and log:
        log(f"    Only {n_chunks} chunk(s) available (need ≥ {MIN_CHUNKS}) — "
            "pitch CI is degenerate; estimate may be less reliable.")

    src_hz: List[Optional[float]] = [_REF_HZ] * n_chunks
    nc_hz: List[Optional[float]] = [
        float(_REF_HZ * 2.0 ** (st / 12.0)) for st in shifts]
    if log:
        log(f"    Chroma xcorr: {point_st:+.3f} st"
            f"  95% CI [{ci[0]:+.3f}, {ci[1]:+.3f}] st"
            f"  ({n_chunks} chunk{'s' if n_chunks != 1 else ''})")
    return src_hz, nc_hz, point_st, ci, n_chunks


def _try_import_essentia():
    """essentia.standard if installed, else None — never raises
    (reference ``pitch.py:178-184``)."""
    try:
        import essentia.standard as es  # type: ignore[import-not-found]
        return es
    except Exception:
        return None


def estimate_pitch_melodia(src_audio: np.ndarray, nc_audio: np.ndarray,
                           sr: int,
                           log: Optional[Callable[[str], None]] = None):
    """Optional MELODIA F0 refinement (reference ``pitch.py:187-241``);
    None when essentia is unavailable or extraction fails."""
    es = _try_import_essentia()
    if es is None:
        if log:
            log("    essentia not available — skipping MELODIA refinement")
        return None

    def extract(audio):
        try:
            ext = es.PredominantPitchMelodia(frameSize=2048, hopSize=128,
                                             sampleRate=float(sr))
            hz, _ = ext(np.asarray(audio, np.float32))
            voiced = hz[hz > 0.0]
            if len(voiced) == 0:
                return None
            if len(voiced) > 2000:
                voiced = voiced[::len(voiced) // 2000]
            return voiced
        except Exception as exc:
            if log:
                log(f"    MELODIA extraction failed: {exc}")
            return None

    sv, nv = extract(src_audio), extract(nc_audio)
    if sv is None or nv is None:
        return None
    return [float(v) for v in sv], [float(v) for v in nv]


@lru_cache(maxsize=8)
def _f0_fn(cfg: AnalyzerConfig):
    import jax
    from .ops import f0 as f0ops
    from .ops import resample

    @jax.jit
    def run(y, n):
        y4 = resample.decimate_pow2(y, 4)
        _, _, hz, sal, valid = f0ops.f0_features(y, y4, n, cfg)
        return hz, sal, valid

    return run


def estimate_pitch_tpu_f0(src_audio: np.ndarray, nc_audio: np.ndarray,
                          sr: int,
                          log: Optional[Callable[[str], None]] = None):
    """First-party harmonic-summation F0 tracker (:mod:`.ops.f0`) — the
    in-framework replacement for the reference's optional essentia MELODIA
    leg (``pitch.py:187-241``; SURVEY §2.2 names this tracker as its
    TPU-native equivalent).  Same output convention as
    :func:`estimate_pitch_melodia`: ``(src_hz_list, nc_hz_list)`` of voiced
    per-frame F0s (subsampled to ≤ 2000), or ``None`` when either side has
    no voiced frames."""
    bucket = bucket_for_duration(max(len(src_audio), len(nc_audio)) / sr)
    cfg = config_for_bucket(AnalyzerConfig(sample_rate=sr), bucket)
    run = _f0_fn(cfg)

    def voiced(audio):
        import jax.numpy as jnp
        buf = np.zeros(cfg.max_samples, np.float32)
        n = min(len(audio), cfg.max_samples)
        buf[:n] = audio[:n]
        hz, sal, vm = run(jnp.asarray(buf), jnp.asarray(n, np.int32))
        hz = np.asarray(hz)
        sal = np.asarray(sal)
        vm = np.asarray(vm, bool)
        if not vm.any():
            return None
        # relative voicing gate plus an absolute floor (a silent signal's
        # saliences are all ~1e-15, which would pass a purely relative gate)
        v = vm & (sal >= cfg.f0_voicing_frac * sal[vm].max()) & (sal > 1e-9)
        out = hz[v]
        if len(out) == 0:
            return None
        if len(out) > 2000:           # MELODIA subsample cap (pitch.py:231)
            out = out[::len(out) // 2000]
        return [float(x) for x in out]

    sv, nv = voiced(src_audio), voiced(nc_audio)
    if sv is None or nv is None:
        if log:
            log("    TPU F0 tracker: no voiced frames — skipping refinement")
        return None
    return sv, nv


def estimate_pitch_combined(src_audio: np.ndarray, nc_audio: np.ndarray,
                            sr: int,
                            log: Optional[Callable[[str], None]] = None
                            ) -> Tuple[List[Optional[float]],
                                       List[Optional[float]], str]:
    """Chroma xcorr (always) + sub-semitone F0 refinement when it agrees
    within ±1.5 st of the chroma estimate (reference ``pitch.py:246-291``).

    The refinement prefers essentia MELODIA when that library is installed
    (exact reference behavior); otherwise it uses the first-party
    harmonic-summation tracker (:func:`estimate_pitch_tpu_f0`) — the
    capability the reference silently loses without essentia."""
    import math

    src_hz, nc_hz, chroma_st, _, _ = estimate_pitch_chroma(
        src_audio, nc_audio, sr, log=log)

    def _accept(pair, name):
        sm, nm = pair
        s_med, n_med = float(np.median(sm)), float(np.median(nm))
        if s_med <= 0 or n_med <= 0:
            return None
        ref_st = 12.0 * math.log2(n_med / s_med)
        if abs(ref_st - chroma_st) <= MELODIA_AGREE_ST:
            return sm, nm, f"chroma+{name}"
        if log:
            log(f"    {name} ({ref_st:+.3f} st) disagrees with chroma "
                f"({chroma_st:+.3f} st) beyond {MELODIA_AGREE_ST} st — "
                "using chroma only")
        return None

    mel = estimate_pitch_melodia(src_audio, nc_audio, sr, log=log)
    if mel is not None:
        got = _accept(mel, "melodia")
        if got is not None:
            return got
    else:
        f0 = estimate_pitch_tpu_f0(src_audio, nc_audio, sr, log=log)
        if f0 is not None:
            got = _accept(f0, "tpu_f0")
            if got is not None:
                return got
    return src_hz, nc_hz, "chroma_xcorr"
