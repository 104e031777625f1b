"""CQT chroma and cyclic cross-correlation pitch-shift detection.

TPU-native rebuild of the reference pitch path (``pitch.py:55-95``):
time-averaged 36-bin/octave CQT chroma per 20 s chunk, then a cyclic
cross-correlation over all 36 lags whose argmax rotation is the pitch shift
in 1/3-semitone bins.

Instead of librosa's recursive multi-rate CQT, the constant-Q transform is a
*dense complex matmul* against precomputed frequency-domain kernels
(``ops/filters.cqt_kernels``) — the MXU-friendly formulation — fed by two
STFT streams:

* **high stream**: native 22 050 Hz, n_fft 4096, hop 512 → octaves C4..B7;
* **low stream**: 4×-decimated signal, n_fft 4096, hop 128 → octaves C1..B3
  (full constant-Q bandwidth down to C2; the bottom octave is Q-truncated,
  which only widens — never moves — its chroma contribution).

The per-chunk output is the time-mean of per-frame inf-normalized chroma,
matching ``librosa.feature.chroma_cqt(norm=inf).mean(axis=1)``
(``pitch.py:55-64``).  The testable contract is the integer lag of the
cyclic-xcorr peak (SURVEY §7 hard-part #3).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AnalyzerConfig
from . import filters
from .spectrum import frame_indices

__all__ = ["chunk_chroma_means", "cyclic_xcorr_lag"]


@lru_cache(maxsize=4)
def _bases(cfg: AnalyzerConfig):
    bpo = cfg.chroma_bins_per_octave
    n_low = cfg.chroma_low_octaves * bpo
    n_high = (cfg.chroma_n_octaves - cfg.chroma_low_octaves) * bpo
    f_low0 = cfg.chroma_fmin
    f_high0 = cfg.chroma_fmin * 2.0 ** cfg.chroma_low_octaves
    lo_re, lo_im = filters.cqt_kernels(cfg.sample_rate / 4.0, cfg.chroma_n_fft,
                                       f_low0, n_low, bpo)
    hi_re, hi_im = filters.cqt_kernels(float(cfg.sample_rate), cfg.chroma_n_fft,
                                       f_high0, n_high, bpo)
    return (lo_re.T, lo_im.T), (hi_re.T, hi_im.T)     # (n_rfft, bins)


def _cqt_mag(spec: jnp.ndarray, basis) -> jnp.ndarray:
    """|spec @ conj-kernelᵀ| for complex rfft frames.  (…, n_rfft) → (…, bins)."""
    # bf16 MXU matmuls with f32 accumulation — the output only feeds a
    # per-frame max-normalize + 36-lag argmax, far coarser than bf16 noise
    k_re, k_im = basis
    bf = jnp.bfloat16
    xr = jnp.real(spec).astype(bf)
    xi = jnp.imag(spec).astype(bf)
    re = jnp.matmul(xr, k_re.astype(bf), preferred_element_type=jnp.float32) - \
        jnp.matmul(xi, k_im.astype(bf), preferred_element_type=jnp.float32)
    im = jnp.matmul(xr, k_im.astype(bf), preferred_element_type=jnp.float32) + \
        jnp.matmul(xi, k_re.astype(bf), preferred_element_type=jnp.float32)
    return jnp.sqrt(re * re + im * im + 1e-30)


def chunk_chroma_means(y: jnp.ndarray, y4: jnp.ndarray, n_samples: jnp.ndarray,
                       cfg: AnalyzerConfig) -> jnp.ndarray:
    """Time-averaged chroma per 20 s chunk slot.

    ``y``: (max_samples,) signal; ``y4``: 4×-decimated signal; ``n_samples``:
    valid length of ``y``.  Returns (max_chunks, n_chroma) chroma means —
    slot ``c`` covers samples ``[c*chunk_samples, (c+1)*chunk_samples)``
    clipped to the valid length (slots entirely past the end return zeros;
    slot 0 of a shorter-than-chunk file is the whole file, mirroring the
    reference's whole-file fallback, ``pitch.py:121-127``).
    """
    bpo = cfg.chroma_bins_per_octave
    n_fft = cfg.chroma_n_fft
    (lo_basis, hi_basis) = _bases(cfg)
    lo_basis = tuple(jnp.asarray(b) for b in lo_basis)
    hi_basis = tuple(jnp.asarray(b) for b in hi_basis)
    window = jnp.asarray(filters.hann(n_fft))

    f_per_chunk = cfg.chroma_frames_per_chunk
    hop_hi, hop_lo = cfg.chroma_hop, cfg.chroma_hop // 4
    pad = n_fft // 2
    ypad = jnp.pad(y, (pad, pad + n_fft + cfg.chunk_samples))
    y4pad = jnp.pad(y4, (pad, pad + n_fft + cfg.chunk_samples // 4))

    fchunk = cfg.chroma_frame_chunk
    n_fchunks = -(-f_per_chunk // fchunk)
    idx_hi = jnp.asarray(frame_indices(fchunk, n_fft, hop_hi))
    idx_lo = jnp.asarray(frame_indices(fchunk, n_fft, hop_lo))

    def one_chunk(c):
        start_hi = c * cfg.chunk_samples
        start_lo = start_hi // 4
        len_in = jnp.clip(n_samples - start_hi, 0, cfg.chunk_samples)
        f_valid = jnp.where(len_in > 0, 1 + len_in // hop_hi, 0)

        def body(acc, fc):
            f0 = fc * fchunk
            seg_hi = jax.lax.dynamic_slice(
                ypad, (start_hi + f0 * hop_hi,), ((fchunk - 1) * hop_hi + n_fft,))
            seg_lo = jax.lax.dynamic_slice(
                y4pad, (start_lo + f0 * hop_lo,), ((fchunk - 1) * hop_lo + n_fft,))
            sp_hi = jnp.fft.rfft(jnp.take(seg_hi, idx_hi, axis=0) * window, axis=-1)
            sp_lo = jnp.fft.rfft(jnp.take(seg_lo, idx_lo, axis=0) * window, axis=-1)
            cq = jnp.concatenate(
                [_cqt_mag(sp_lo, lo_basis), _cqt_mag(sp_hi, hi_basis)], axis=-1)
            chroma = cq.reshape(fchunk, cfg.chroma_n_octaves, bpo).sum(axis=1)
            peak = jnp.max(chroma, axis=-1, keepdims=True)
            chroma = jnp.where(peak > 1e-12, chroma / jnp.maximum(peak, 1e-12), 0.0)
            fmask = ((f0 + jnp.arange(fchunk)) < f_valid)[:, None]
            return acc + jnp.sum(jnp.where(fmask, chroma, 0.0), axis=0), None

        acc, _ = jax.lax.scan(body, jnp.zeros(bpo), jnp.arange(n_fchunks))
        return acc / jnp.maximum(f_valid, 1)

    return jax.vmap(one_chunk)(jnp.arange(cfg.max_chunks))


def cyclic_xcorr_lag(src_chroma: jnp.ndarray, nc_chroma: jnp.ndarray) -> jnp.ndarray:
    """Wrapped argmax lag of the cyclic cross-correlation over all rotations.

    Positive lag ⇒ nc shifted UP vs src, wrapped to ``[-n//2, n//2]``
    (reference ``pitch.py:67-85``: ``xcorr[k] = dot(src, roll(nc, -k))``).
    Works on (..., n) batches.
    """
    n = src_chroma.shape[-1]
    rolls = (jnp.arange(n)[:, None] + jnp.arange(n)[None, :]) % n   # [k, i] -> i+k
    nc_rolled = nc_chroma[..., rolls]                                # (..., k, i)
    xc = jnp.einsum("...i,...ki->...k", src_chroma, nc_rolled)
    raw = jnp.argmax(xc, axis=-1).astype(jnp.int32)
    return jnp.where(raw > n // 2, raw - n, raw)
