"""Auto-align: intro-offset detection via RMS-envelope cross-correlation.

Device rebuild of ``xcorr.find_content_offset`` (reference ``xcorr.py:165-259``):
both signals decimated to 11 025 Hz, RMS envelopes at hop 512, and a grid of
30 candidate nightcore speeds; for each speed the nc envelope is stretched to
the source time scale (linear interpolation) and cross-correlated (FFT) with
the source envelope over the first ≤120 s of lags; the best cosine-normalized
peak over the grid gives (offset_sec, speed_hint).

The reference's serial 30-speed Python loop (SURVEY §2.3) becomes a ``vmap``
over the speed grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import AnalyzerConfig
from .energy import energy_cumsum, frame_rms_power
from .resample import decimate2, decimated_len

__all__ = ["find_content_offset"]


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _rms_envelope(y_ds: jnp.ndarray, n_ds: jnp.ndarray, hop: int, n_frames: int):
    cs = energy_cumsum(y_ds)
    power = frame_rms_power(cs, n_ds, frame_length=2048, hop=hop, n_frames=n_frames)
    env = jnp.sqrt(jnp.maximum(power, 0.0))
    n_env = 1 + n_ds // hop
    return env, n_env


def find_content_offset(src: jnp.ndarray, nc: jnp.ndarray,
                        n_src: jnp.ndarray, n_nc: jnp.ndarray,
                        cfg: AnalyzerConfig):
    """Returns ``(offset_sec, speed_est)`` — seconds of source intro to skip
    and the rough speed from the alignment search (``(0.0, mid_speed)`` when
    nothing aligns, mirroring the reference's fallthrough)."""
    hop = cfg.align_hop
    n_frames = cfg.align_env_frames
    src_ds = decimate2(src)
    nc_ds = decimate2(nc)
    src_env, src_n = _rms_envelope(src_ds, decimated_len(n_src, 2), hop, n_frames)
    nc_env, nc_n = _rms_envelope(nc_ds, decimated_len(n_nc, 2), hop, n_frames)

    hop_sec = hop / cfg.align_sr
    max_off = jnp.asarray(int(cfg.align_max_offset / hop_sec), jnp.int32)
    fidx = jnp.arange(n_frames)

    nfft = _next_pow2(2 * n_frames)
    src_f = jnp.fft.rfft(jnp.where(fidx < src_n, src_env, 0.0), n=nfft)
    src_cs2 = jnp.concatenate(
        [jnp.zeros(1), jnp.cumsum(jnp.where(fidx < src_n, src_env, 0.0) ** 2)])

    speeds = jnp.linspace(cfg.align_speed_lo, cfg.align_speed_hi, cfg.align_n_speeds)

    def one_speed(speed):
        n_str = (nc_n / speed).astype(jnp.int32)
        ok = (n_str >= 4) & (n_str < src_n)
        # linear-interp stretch of the nc envelope onto n_str points
        x = fidx * (nc_n - 1) / jnp.maximum(n_str - 1, 1)
        x0 = jnp.clip(x.astype(jnp.int32), 0, n_frames - 2)
        frac = jnp.clip(x - x0, 0.0, 1.0)
        stretched = (1 - frac) * jnp.take(nc_env, x0) + frac * jnp.take(nc_env, x0 + 1)
        stretched = jnp.where(fidx < n_str, stretched, 0.0)

        search_len = jnp.minimum(max_off, src_n - n_str)
        ok = ok & (search_len > 0)

        corr = jnp.fft.irfft(src_f * jnp.conj(jnp.fft.rfft(stretched, n=nfft)),
                             n=nfft)[:n_frames]
        lag_ok = fidx <= search_len
        corr_m = jnp.where(lag_ok, corr, -jnp.inf)
        peak_idx = jnp.argmax(corr_m)
        peak_val = corr_m[peak_idx]

        win_energy = (jnp.take(src_cs2, jnp.minimum(peak_idx + n_str, n_frames)) -
                      jnp.take(src_cs2, peak_idx))
        query_energy = jnp.sum(stretched ** 2)
        denom = jnp.sqrt(jnp.maximum(win_energy * query_energy, 0.0))
        score = jnp.where(denom > 1e-12, peak_val / jnp.maximum(denom, 1e-12), 0.0)
        return jnp.where(ok, score, -jnp.inf), peak_idx, speed

    scores, peaks, spds = jax.vmap(one_speed)(speeds)
    best = jnp.argmax(scores)
    found = jnp.isfinite(scores[best])
    offset_sec = jnp.where(found, peaks[best].astype(jnp.float32) * hop_sec, 0.0)
    mid = (cfg.align_speed_lo + cfg.align_speed_hi) / 2.0
    speed_est = jnp.where(found, spds[best], mid)
    return offset_sec, speed_est
