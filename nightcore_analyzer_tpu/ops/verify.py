"""Windowed waveform cross-correlation speed verifier.

Device rebuild of ``xcorr.estimate_speed_xcorr`` (reference ``xcorr.py:54-162``):
for ≈same-speed pairs, sample 20 evenly spaced 3 s windows from file A, search
file B within ±5 % of the expected position maximizing cosine similarity, fit
a line through the (a_pos, b_pos) correspondences → slope = speed_A / speed_B;
quality = median per-window cosine ∈ [0, 1].

Precision upgrades over the reference (same output contract, documented
deviations):

* **Exhaustive sample-resolution search.**  The reference evaluates only
  every ``win/4`` ≈ 0.75 s-th candidate position, anchored at
  ``expected - search`` (``xcorr.py:131-144``) — raw-waveform cosine decays
  to noise within a few milliseconds of misalignment, so whether ANY
  candidate lands near true alignment is a phase accident of
  ``search % stride``; quality scores were luck and fitted slopes carried
  ~±2 % position-quantization noise.  Here each window is cross-correlated
  against the ENTIRE ±5 % search span at every lag via one FFT, with
  per-lag overlap-energy normalization (exact cosine, no zero-padding
  bias).  Correspondences come back sample-exact, bounding the slope by
  the resampler's interpolation error instead — usable directly by the
  workflow's residual-factor correction loop.  One rfft pair per window on
  the MXU-fed TPU FFT replaces the reference's 13-point subsample; it is
  strictly more search, not less.
* **Theil-Sen slope.**  The reference's least-squares polyfit
  (``xcorr.py:159``) is pulled off by a single beat-period-aligned outlier
  window (periodic music is self-similar one beat over); the median of
  pairwise slopes ignores up to ~29 % outliers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import AnalyzerConfig

__all__ = ["estimate_speed_xcorr_arrays", "search_radius"]


def search_radius(cfg: AnalyzerConfig) -> int:
    """Static worst-case search radius in samples (±5 % of the bucket)."""
    return int(cfg.xcorr_search_range * cfg.max_samples)


def estimate_speed_xcorr_arrays(ya: jnp.ndarray, yb: jnp.ndarray,
                                n_a: jnp.ndarray, n_b: jnp.ndarray,
                                cfg: AnalyzerConfig):
    """Returns ``(ratio, quality)``; ``(1.0, 0.0)`` when < 3 correspondences."""
    win = cfg.xcorr_win_samples
    n_win = cfg.xcorr_n_windows

    min_len = jnp.minimum(n_a, n_b)
    s = (min_len * cfg.xcorr_skip_edges).astype(jnp.int32)
    e = (min_len * (1.0 - cfg.xcorr_skip_edges)).astype(jnp.int32)
    len_a = e - s
    len_b = e - s                      # both edge-trimmed to the same span
    search = (cfg.xcorr_search_range * len_b).astype(jnp.int32)

    long_enough = (len_a >= win) & (len_b >= win)

    a_pos = (jnp.linspace(0.0, 1.0, n_win) *
             jnp.maximum(len_a - win, 0)).astype(jnp.int32)

    # static search geometry: the segment [expected - R, expected + win + R)
    # of B covers every candidate lag in the dynamic ±search span
    R = search_radius(cfg)
    seg_len = win + 2 * R
    L = 1 << (seg_len - 1).bit_length()
    N = yb.shape[-1]
    lag_idx = jnp.arange(2 * R + 1)

    def one_window(_, pa):
        wa = jax.lax.dynamic_slice(ya, (s + pa,), (win,))
        rms_a = jnp.sqrt(jnp.mean(wa ** 2))
        norm_a = jnp.linalg.norm(wa)

        expected = (pa.astype(jnp.float32) * len_b / jnp.maximum(len_a, 1)
                    ).astype(jnp.int32)
        lo = jnp.maximum(0, expected - search)
        hi = jnp.minimum(len_b - win, expected + search)

        st = jnp.clip(s + expected - R, 0, jnp.maximum(N - seg_len, 0))
        seg = jax.lax.dynamic_slice(yb, (st,), (seg_len,))
        fa = jnp.fft.rfft(wa, n=L)
        fs = jnp.fft.rfft(seg, n=L)
        corr = jnp.fft.irfft(jnp.conj(fa) * fs, n=L)[:2 * R + 1]
        cs = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg * seg)])
        e_b = cs[lag_idx + win] - cs[lag_idx]
        pb = st + lag_idx - s                   # candidate positions in B
        lag_ok = (pb >= lo) & (pb <= hi)
        cos = jnp.where((e_b > 1e-20) & lag_ok,
                        corr / (jnp.maximum(norm_a, 1e-10) *
                                jnp.sqrt(jnp.maximum(e_b, 1e-20))),
                        -jnp.inf)
        k = jnp.argmax(cos)
        best_corr = cos[k]
        best_pb = pb[k]

        valid = (long_enough & (rms_a >= cfg.xcorr_rms_gate) &
                 (norm_a >= 1e-10) & (lo < hi) &
                 jnp.isfinite(best_corr) & (best_corr > 0))
        return None, (pa.astype(jnp.float32), best_pb.astype(jnp.float32),
                      jnp.where(valid, best_corr, 0.0), valid)

    _, (pas, pbs, quals, valids) = jax.lax.scan(one_window, None, a_pos)

    n_ok = jnp.sum(valids)
    # Theil-Sen: median of pairwise slopes over well-separated valid pairs
    da = pas[None, :] - pas[:, None]
    db = pbs[None, :] - pbs[:, None]
    pair_ok = (valids[None, :] & valids[:, None] &
               (jnp.abs(da) > 0.5 * float(win)))
    slopes = db / jnp.where(jnp.abs(da) > 1e-3, da, 1.0)
    from .stats import masked_median
    iu = jnp.triu_indices(n_win, k=1)
    slope_ts = masked_median(slopes[iu], pair_ok[iu])
    slope = jnp.where(jnp.sum(pair_ok[iu]) > 0, slope_ts, 1.0)

    quality = masked_median(quals, valids)

    ok = n_ok >= 3
    ratio = jnp.where(ok, slope, 1.0)
    quality = jnp.where(ok, quality, 0.0)
    return ratio, quality
