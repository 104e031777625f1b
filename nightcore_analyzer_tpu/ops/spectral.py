"""Spectral statistics device program (reference ``spectral.py:38-103``).

Per file at its *native* sample rate: spectral centroid, 85 % rolloff, RMS
mean/variance, 5-band STFT magnitudes (sub-bass/bass/mid/presence/
brilliance), decay rate over loud frames (reverb proxy), duration, and the
effective bandwidth (highest bin within 60 dB of the peak — the
lossy-transcode detector).

Shape handling: one jitted program per (max_samples, n_fft) bucket; the
sample rate rides in as a traced scalar (band edges and frequency axes are
computed from it on device, so 44.1 k and 48 k files share an executable).
Two chunked STFT passes: pass 1 reduces the global magnitude peak (needed
for the dB clamp), pass 2 accumulates all statistics fused.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import filters

__all__ = ["SpectralArrays", "spectral_stats", "build_spectral_fn"]

N_FFT = 2048
HOP = 512

BANDS = ((20.0, 80.0), (80.0, 250.0), (250.0, 2000.0),
         (2000.0, 6000.0), (6000.0, 20000.0))


class SpectralArrays(NamedTuple):
    centroid: jnp.ndarray
    rolloff: jnp.ndarray
    rms_mean: jnp.ndarray
    rms_variance: jnp.ndarray
    bands: jnp.ndarray              # (5,) mean |S| per band
    decay_rate: jnp.ndarray
    duration: jnp.ndarray
    effective_bandwidth_hz: jnp.ndarray


def _stft_chunks(y, n_frames, chunk, window):
    """Per-chunk |S| body for lax.scan (gather-free interleaved framing;
    magnitudes are un-permuted to time order per chunk)."""
    from .spectrum import frame_interleaved, interleave_params
    P, K, c_padded, perm = interleave_params(chunk, N_FFT, HOP)
    assert c_padded == chunk, "chunk must be a multiple of N_FFT//HOP"
    seg_len = (K - 1) * N_FFT + (P - 1) * HOP + N_FFT
    pad = N_FFT // 2
    ypad = jnp.pad(y, (pad, pad + seg_len))
    perm_j = jnp.asarray(perm)
    n_chunks = -(-n_frames // chunk)

    def body(carry, c):
        seg = jax.lax.dynamic_slice(ypad, (c * chunk * HOP,), (seg_len,))
        frames = frame_interleaved(seg, chunk, N_FFT, HOP)
        spec = jnp.fft.rfft(frames * window, axis=-1)
        mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2)
        return carry, jnp.take(mag, perm_j, axis=0)

    return n_chunks, body


def spectral_stats(y: jnp.ndarray, n: jnp.ndarray, sr: jnp.ndarray,
                   *, chunk: int = 512) -> SpectralArrays:
    """``y``: (max_samples,) zero-padded; ``n`` valid samples; ``sr`` scalar."""
    max_samples = y.shape[-1]
    n_frames_max = 1 + max_samples // HOP
    n_frames = 1 + n // HOP
    window = jnp.asarray(filters.hann(N_FFT))
    n_bins = 1 + N_FFT // 2
    bin_idx = jnp.arange(n_bins)

    n_chunks, body = _stft_chunks(y, n_frames_max, chunk, window)

    # ── pass 1: global |S| peak (for dB references) ──────────────────────────
    def peak_body(acc, c):
        _, mag = body(None, c)
        fidx = c * chunk + jnp.arange(chunk)
        mag = jnp.where((fidx < n_frames)[:, None], mag, 0.0)
        return jnp.maximum(acc, jnp.max(mag)), None

    peak, _ = jax.lax.scan(peak_body, jnp.asarray(0.0), jnp.arange(n_chunks))

    # ── pass 2: fused accumulation ───────────────────────────────────────────
    freqs = bin_idx.astype(jnp.float32) * (sr / N_FFT)

    def acc_body(carry, c):
        (cent_sum, roll_sum, binsum, db_sum, nf) = carry
        _, mag = body(None, c)
        fidx = c * chunk + jnp.arange(chunk)
        fmask = (fidx < n_frames)[:, None]
        mag = jnp.where(fmask, mag, 0.0)

        tot = jnp.sum(mag, axis=-1)
        cent = jnp.where(tot > 1e-10, jnp.sum(mag * freqs, axis=-1) /
                         jnp.maximum(tot, 1e-10), 0.0)

        cs = jnp.cumsum(mag, axis=-1)
        reach = cs >= 0.85 * tot[:, None]
        first = jnp.argmax(reach, axis=-1)          # first bin reaching 85 %
        roll = jnp.where(tot > 1e-10, jnp.take(freqs, first), 0.0)

        # per-bin mean log-magnitude for effective bandwidth: clamp handled
        # against the global peak after the scan via stored clipped dB
        db = 20.0 * jnp.log10(jnp.maximum(mag, 1e-5))
        db_ref = 20.0 * jnp.log10(jnp.maximum(peak, 1e-5))
        db = jnp.maximum(db - db_ref, -80.0)        # amplitude_to_db top_db=80
        db = jnp.where(fmask, db, 0.0)

        fvalid = fmask[:, 0].astype(jnp.float32)
        return (cent_sum + jnp.sum(cent * fvalid),
                roll_sum + jnp.sum(roll * fvalid),
                binsum + jnp.sum(mag, axis=0),
                db_sum + jnp.sum(db, axis=0),
                nf + jnp.sum(fvalid)), None

    init = (jnp.asarray(0.0), jnp.asarray(0.0),
            jnp.zeros(n_bins), jnp.zeros(n_bins), jnp.asarray(0.0))
    (cent_sum, roll_sum, binsum, db_sum, nf), _ = jax.lax.scan(
        acc_body, init, jnp.arange(n_chunks))
    nf = jnp.maximum(nf, 1.0)
    centroid = cent_sum / nf
    rolloff = roll_sum / nf
    bin_mean = binsum / nf

    # ── frequency bands ──────────────────────────────────────────────────────
    def band(lo, hi):
        m = (freqs >= lo) & (freqs < hi)
        cnt = jnp.sum(m)
        return jnp.where(cnt > 0, jnp.sum(jnp.where(m, bin_mean, 0.0)) /
                         jnp.maximum(cnt, 1), 0.0)

    bands = jnp.stack([band(lo, hi) for lo, hi in BANDS])

    # ── RMS stats + decay over loud frames (reference spectral.py:58-78) ────
    cs2 = jnp.concatenate([jnp.zeros(1), jnp.cumsum(y * y)])
    t = jnp.arange(n_frames_max)
    lo_i = jnp.clip(t * HOP - N_FFT // 2, 0, n)
    hi_i = jnp.clip(t * HOP + N_FFT // 2, 0, n)
    rms = jnp.sqrt(jnp.maximum(
        (jnp.take(cs2, hi_i) - jnp.take(cs2, lo_i)) / N_FFT, 0.0))
    fvalid = t < n_frames
    rms = jnp.where(fvalid, rms, 0.0)
    rms_mean = jnp.sum(rms) / nf
    rms_var = jnp.sum(jnp.where(fvalid, (rms - rms_mean) ** 2, 0.0)) / nf

    # 75th-percentile threshold over valid frames (np.percentile, linear)
    srt = jnp.sort(jnp.where(fvalid, rms, jnp.inf))
    nvalid = jnp.sum(fvalid)
    pos = 0.75 * (nvalid.astype(jnp.float32) - 1.0)
    p_lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_frames_max - 1)
    p_hi = jnp.clip(p_lo + 1, 0, n_frames_max - 1)
    frac = pos - p_lo
    p75 = srt[p_lo] + frac * (srt[p_hi] - srt[p_lo])

    # decay: mean first-difference of the *subsequence* of loud frames
    loud = fvalid & (rms > p75)
    order = jnp.argsort(~loud, stable=True)          # loud frames to front
    loud_vals = jnp.take(rms, order)
    n_loud = jnp.sum(loud)
    d = loud_vals[1:] - loud_vals[:-1]
    dmask = (jnp.arange(n_frames_max - 1) + 1) < n_loud
    decay = jnp.where(n_loud > 1,
                      jnp.sum(jnp.where(dmask, d, 0.0)) /
                      jnp.maximum(n_loud - 1, 1), 0.0)

    # ── effective bandwidth (spectral.py:82-94) ──────────────────────────────
    mean_db = db_sum / nf
    significant = mean_db > (jnp.max(mean_db) - 60.0)
    highest = jnp.max(jnp.where(significant, bin_idx, 0))
    eff_bw = jnp.take(freqs, highest)

    return SpectralArrays(
        centroid=centroid, rolloff=rolloff,
        rms_mean=rms_mean, rms_variance=rms_var,
        bands=bands, decay_rate=decay,
        duration=n.astype(jnp.float32) / sr,
        effective_bandwidth_hz=eff_bw)


@lru_cache(maxsize=16)
def build_spectral_fn(max_samples: int, chunk: int = 512):
    return jax.jit(partial(spectral_stats, chunk=chunk))
