"""First-party sub-semitone pitch refinement (the MELODIA replacement).

The reference optionally refines its 1/3-semitone chroma pitch with
essentia's MELODIA F0 tracker (``pitch.py:187-241``), accepted only within
±1.5 st of the chroma estimate.  essentia is a C++ library that is absent in
most environments (including this one), so the reference silently runs
without sub-semitone pitch.  This module is the TPU-native equivalent —
SURVEY §2.2's "first-party TPU F0 tracker (harmonic summation)" — built on a
**dual-stream constant-Q front-end at 10-cent resolution**:

* **low stream**: 4×-decimated signal, per-bin Q kernels up to the crossover
  frequency whose full-Q kernel fits the native-rate frame;
* **high stream**: native 22 050 Hz for everything above the crossover.

Both streams are *time-domain kernel matmuls* (``filters.cqt_time_kernels``)
— the DFT and the constant-Q projection fused into one MXU matmul per frame
tile, exactly the formulation the chroma path uses (:mod:`.chroma`).

Two estimators share that front-end:

1. :func:`f0_features` — per-frame **harmonic-summation salience**
   ``S(f0) = Σ_h w_h · |X(h·f0)|`` over the log grid, argmax + parabolic
   interpolation → per-frame F0 in Hz with a voicing score.  This is the
   tracker surfaced through ``pitch.estimate_pitch_tpu_f0`` (the drop-in for
   the reference's MELODIA Hz lists).
2. :func:`spectral_shift_st` — cross-correlation of the two files' *mean*
   log-frequency magnitude spectra over fractional-semitone lags with
   per-lag cosine normalization and parabolic vertex refinement.  Because a
   resample/pitch shift translates the whole spectrum along log-frequency,
   the xcorr peak sits at the true shift; averaging ~10³ frames makes the
   estimate robust to any single frame's content.  This is the headline
   ``pitch_refined_st`` value (typically a few cents of error vs the
   reference's 33-cent chroma grid).

Q-truncated kernels at the very bottom of the low stream widen — but never
bias — their bins' response: the cross-correlation of two *symmetric*
responses centered at shifted frequencies still peaks exactly at the shift.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AnalyzerConfig
from . import filters
from .spectrum import frame_interleaved, interleave_params

__all__ = ["f0_features", "spectral_shift_st"]


@lru_cache(maxsize=4)
def _kernels(cfg: AnalyzerConfig):
    """Dual-stream time-domain constant-Q kernels, (n_fft, bins) each."""
    bpo = cfg.f0_bins_per_octave
    n_low = cfg.f0_n_low_bins
    n_high = cfg.f0_n_spec_bins - n_low
    lo = filters.cqt_time_kernels(cfg.sample_rate / 4.0, cfg.f0_n_fft,
                                  cfg.f0_fmin, n_low, bpo)
    f_high0 = cfg.f0_fmin * 2.0 ** (n_low / bpo)
    hi = filters.cqt_time_kernels(float(cfg.sample_rate), cfg.f0_n_fft,
                                  f_high0, n_high, bpo)
    return lo, hi


@lru_cache(maxsize=4)
def _harmonic_shifts(cfg: AnalyzerConfig):
    """(floor_bins, frac, weight) per harmonic on the 10-cent log grid —
    harmonic ``h`` of any f0 is a *constant* fractional-bin shift of
    ``bpo·log2(h)``, so the salience is a short stack of shifted adds."""
    bpo = cfg.f0_bins_per_octave
    out = []
    for h in range(1, cfg.f0_harmonics + 1):
        s = bpo * math.log2(h)
        fl = int(math.floor(s))
        out.append((fl, s - fl, cfg.f0_harmonic_decay ** (h - 1)))
    return tuple(out)


def _mag(frames: jnp.ndarray, basis) -> jnp.ndarray:
    """|frames @ (K_re + i·K_im)| — fused windowed-DFT × constant-Q matmul.
    bf16 inputs / f32 accumulation on the MXU; the per-frame salience argmax
    and the ~10³-frame mean spectrum both average the rounding away."""
    from .fft_mxu import _use_mxu
    k_re, k_im = basis
    dt = jnp.bfloat16 if _use_mxu() else jnp.float32
    fr = frames.astype(dt)
    re = jnp.matmul(fr, jnp.asarray(k_re).astype(dt),
                    preferred_element_type=jnp.float32)
    im = jnp.matmul(fr, jnp.asarray(k_im).astype(dt),
                    preferred_element_type=jnp.float32)
    return jnp.sqrt(re * re + im * im + 1e-30)


def _salience(M: jnp.ndarray, cfg: AnalyzerConfig) -> jnp.ndarray:
    """Harmonic-summation salience over the F0 bins: (…, n_spec) → (…, n_f0).
    Fractional harmonic positions are linearly interpolated between grid
    bins (static slices — no gathers)."""
    n_f0 = cfg.f0_n_f0_bins
    shifts = _harmonic_shifts(cfg)
    max_shift = max(fl for fl, _, _ in shifts) + 1
    Mp = jnp.pad(M, [(0, 0)] * (M.ndim - 1) + [(0, max_shift + n_f0)])
    S = jnp.zeros(M.shape[:-1] + (n_f0,), jnp.float32)
    for fl, frac, w in shifts:
        lo = jax.lax.slice_in_dim(Mp, fl, fl + n_f0, axis=-1)
        if frac > 1e-9:
            hi = jax.lax.slice_in_dim(Mp, fl + 1, fl + 1 + n_f0, axis=-1)
            S = S + w * ((1.0 - frac) * lo + frac * hi)
        else:
            S = S + w * lo
    return S


def _parabolic(y1, y2, y3):
    """Vertex offset of the parabola through three equispaced points,
    clipped to ±½ bin."""
    denom = y1 - 2.0 * y2 + y3
    d = jnp.where(jnp.abs(denom) > 1e-12,
                  0.5 * (y1 - y3) / jnp.where(jnp.abs(denom) > 1e-12,
                                              denom, 1.0), 0.0)
    return jnp.clip(d, -0.5, 0.5)


def f0_features(y: jnp.ndarray, y4: jnp.ndarray, n_samples: jnp.ndarray,
                cfg: AnalyzerConfig):
    """Fine log-frequency features of one signal.

    ``y``: (max_samples,) mono signal; ``y4``: its 4×-decimated twin (the
    chroma path already computes it); ``n_samples``: valid length.

    Returns ``(spec_chunks, chunk_counts, f0_hz, f0_sal, frame_valid)``:

    * ``spec_chunks`` (max_chunks, n_spec_bins) — per-20 s-chunk *sums* of
      constant-Q magnitude spectra over valid frames (feeds
      :func:`spectral_shift_st` per chunk, or summed for the whole-file
      estimate);
    * ``chunk_counts`` (max_chunks,) — valid frames per chunk slot;
    * ``f0_hz / f0_sal / frame_valid`` (f0_frames,) — per-frame
      harmonic-summation F0 (parabolic sub-bin), its salience, and the
      validity mask (the tracker API; callers apply the voicing gate).
    """
    n_fft, hop = cfg.f0_n_fft, cfg.f0_hop
    hop_lo = hop // 4
    fc = cfg.f0_frame_chunk
    F = cfg.f0_frames
    n_tiles = -(-F // fc)
    lo_k, hi_k = _kernels(cfg)
    bpo = cfg.f0_bins_per_octave

    _, _, _, perm_hi = interleave_params(fc, n_fft, hop)
    _, _, _, perm_lo = interleave_params(fc, n_fft, hop_lo)
    perm_hi = jnp.asarray(perm_hi[:fc])
    perm_lo = jnp.asarray(perm_lo[:fc])

    def _need(n_frames, hp):
        P = n_fft // hp
        K = -(-n_frames // P)
        return (K - 1) * n_fft + (P - 1) * hp + n_fft

    span_hi = _need(fc, hop)
    span_lo = _need(fc, hop_lo)
    # low-stream frames are centered on the high-stream frame centers
    # (high frame j covers [j·hop, j·hop+n_fft); the 4×-longer low window is
    # shifted left so both centers coincide)
    pad_lo_left = (n_fft * 4 - n_fft) // 2 // 4
    tail_hi = max(0, (n_tiles - 1) * fc * hop + span_hi - y.shape[-1])
    tail_lo = max(0, (n_tiles - 1) * fc * hop_lo + span_lo
                  - (pad_lo_left + y4.shape[-1]))
    ypad = jnp.pad(y, (0, tail_hi))
    y4pad = jnp.pad(y4, (pad_lo_left, tail_lo))

    tiles_hi = jnp.stack([
        jax.lax.slice_in_dim(ypad, t * fc * hop, t * fc * hop + span_hi,
                             axis=-1) for t in range(n_tiles)])
    tiles_lo = jnp.stack([
        jax.lax.slice_in_dim(y4pad, t * fc * hop_lo,
                             t * fc * hop_lo + span_lo, axis=-1)
        for t in range(n_tiles)])
    bases = jnp.arange(n_tiles, dtype=jnp.int32) * fc

    # chunk-slot one-hot per tile frame — chunk boundaries are compile-time
    # constants, so this is a static (n_tiles, fc, C) 0/1 matrix and the
    # per-chunk spectrum accumulation is one small matmul per tile
    C = cfg.max_chunks
    onehot_np = np.zeros((n_tiles, fc, C), np.float32)
    for t in range(n_tiles):
        for j in range(fc):
            c = min(((t * fc + j) * hop) // cfg.chunk_samples, C - 1)
            onehot_np[t, j, c] = 1.0
    onehots = jnp.asarray(onehot_np)

    n_f0 = cfg.f0_n_f0_bins
    local = jnp.arange(fc, dtype=jnp.int32)

    def body(carry, tile):
        spec_sum, cnt = carry
        seg_hi, seg_lo, base, onehot = tile
        m_hi = _mag(frame_interleaved(seg_hi, fc, n_fft, hop)[:fc], hi_k)
        m_lo = _mag(frame_interleaved(seg_lo, fc, n_fft, hop_lo)[:fc], lo_k)
        M = jnp.concatenate([jnp.take(m_lo, perm_lo, axis=0),
                             jnp.take(m_hi, perm_hi, axis=0)], axis=-1)
        fidx = base + local
        # a frame is valid only if BOTH streams' windows lie inside the
        # signal: the high stream covers [fidx·hop, fidx·hop + n_fft), the
        # 4×-longer low window is centered on the same point and extends to
        # fidx·hop + n_fft/2 + 2·n_fft — without the second bound the last
        # ~3 frames fold stale rolled-tail audio into the low-frequency bins
        valid = ((fidx * hop + n_fft // 2 + 2 * n_fft <= n_samples)
                 & (fidx < F))
        Mv = jnp.where(valid[:, None], M, 0.0)
        spec_sum = spec_sum + onehot.T @ Mv            # (C, n_spec)
        cnt = cnt + onehot.T @ valid.astype(jnp.float32)

        S = _salience(M, cfg)                        # (fc, n_f0)
        p = jnp.argmax(S, axis=-1)
        pm = jnp.clip(p - 1, 0, n_f0 - 1)[:, None]
        pp = jnp.clip(p + 1, 0, n_f0 - 1)[:, None]
        y2 = jnp.take_along_axis(S, p[:, None], axis=-1)[:, 0]
        y1 = jnp.take_along_axis(S, pm, axis=-1)[:, 0]
        y3 = jnp.take_along_axis(S, pp, axis=-1)[:, 0]
        d = jnp.where((p > 0) & (p < n_f0 - 1), _parabolic(y1, y2, y3), 0.0)
        f0 = cfg.f0_fmin * 2.0 ** ((p.astype(jnp.float32) + d) / bpo)
        return (spec_sum, cnt), (f0, y2, valid)

    (spec_chunks, chunk_counts), (f0_t, sal_t, valid_t) = jax.lax.scan(
        body, (jnp.zeros((C, cfg.f0_n_spec_bins), jnp.float32),
               jnp.zeros(C, jnp.float32)),
        (tiles_hi, tiles_lo, bases, onehots))
    f0_hz = f0_t.reshape(-1)[:F]
    f0_sal = sal_t.reshape(-1)[:F]
    frame_valid = valid_t.reshape(-1)[:F]
    return spec_chunks, chunk_counts, f0_hz, f0_sal, frame_valid


def spectral_shift_st(spec_src: jnp.ndarray, spec_nc: jnp.ndarray,
                      cfg: AnalyzerConfig):
    """Sub-grid log-frequency shift of ``spec_nc`` relative to ``spec_src``.

    Cross-correlates the two mean spectra over integer lags within
    ``±pitch_refine_max_st``, normalizing each lag by the *overlap-region*
    energies (exact cosine similarity — no zero-padding bias toward lag 0),
    then refines the argmax with a parabolic vertex fit.

    Returns ``(shift_st, quality)``; positive = nc is higher.  ``quality``
    is the peak cosine similarity in [0, 1].
    """
    bpo = cfg.f0_bins_per_octave
    L = int(round(cfg.pitch_refine_max_st * bpo / 12.0))
    N = spec_src.shape[-1]
    if L >= N:  # cs_s[N-1-a] would wrap via negative indexing
        raise ValueError(
            f"pitch_refine_max_st span ({L} bins) must be < the spectrum "
            f"grid ({N} bins); lower pitch_refine_max_st or raise "
            "f0_spec_max_hz")
    pad_nc = jnp.pad(spec_nc, (L, L))
    idx = jnp.arange(2 * L + 1)[:, None] + jnp.arange(N)[None, :]
    nc_mat = jnp.take(pad_nc, idx)              # row r: nc[k + (r − L)]
    dots = nc_mat @ spec_src                    # (2L+1,)

    cs_s = jnp.cumsum(spec_src * spec_src)
    cs_n = jnp.cumsum(spec_nc * spec_nc)
    tot_s, tot_n = cs_s[-1], cs_n[-1]
    lags = jnp.arange(-L, L + 1)
    a = jnp.abs(lags)
    head_s = cs_s[N - 1 - a]                    # energy over first N−|l| bins
    head_n = cs_n[N - 1 - a]
    cut_s = jnp.where(a > 0, cs_s[jnp.maximum(a - 1, 0)], 0.0)
    cut_n = jnp.where(a > 0, cs_n[jnp.maximum(a - 1, 0)], 0.0)
    # lag ≥ 0: src over [0, N−l), nc over [l, N); lag < 0: roles swap
    e_src = jnp.where(lags >= 0, head_s, tot_s - cut_s)
    e_nc = jnp.where(lags >= 0, tot_n - cut_n, head_n)
    cos = dots / jnp.sqrt(jnp.maximum(e_src * e_nc, 1e-20))

    p = jnp.argmax(cos)
    n_lags = 2 * L + 1
    y1 = cos[jnp.clip(p - 1, 0, n_lags - 1)]
    y3 = cos[jnp.clip(p + 1, 0, n_lags - 1)]
    d = jnp.where((p > 0) & (p < n_lags - 1), _parabolic(y1, cos[p], y3), 0.0)
    st = (p.astype(jnp.float32) + d - L) * 12.0 / bpo
    return st, cos[p]
