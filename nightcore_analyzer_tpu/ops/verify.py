"""Windowed waveform cross-correlation speed verifier.

Device rebuild of ``xcorr.estimate_speed_xcorr`` (reference ``xcorr.py:54-162``):
for ≈same-speed pairs, sample 20 evenly spaced 3 s windows from file A, search
file B within ±5 % of the expected position at stride win/4 maximizing cosine
similarity, fit a line through the (a_pos, b_pos) correspondences → slope =
speed_A / speed_B; quality = median per-window cosine ∈ [0, 1].

The reference's Python double loop (20 windows × candidates, SURVEY §2.3)
becomes a scan over windows with the candidate dot-products batched as one
matrix-vector product per window.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import AnalyzerConfig

__all__ = ["estimate_speed_xcorr_arrays", "max_candidates"]


def max_candidates(cfg: AnalyzerConfig) -> int:
    stride = max(1, cfg.xcorr_win_samples // 4)
    return int(2 * cfg.xcorr_search_range * cfg.max_samples / stride) + 2


def estimate_speed_xcorr_arrays(ya: jnp.ndarray, yb: jnp.ndarray,
                                n_a: jnp.ndarray, n_b: jnp.ndarray,
                                cfg: AnalyzerConfig):
    """Returns ``(ratio, quality)``; ``(1.0, 0.0)`` when < 3 correspondences."""
    win = cfg.xcorr_win_samples
    stride = max(1, win // 4)
    n_cand = max_candidates(cfg)
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

    local = jnp.arange(win)

    def one_window(_, pa):
        wa = jax.lax.dynamic_slice(ya, (s + pa,), (win,))
        rms_a = jnp.sqrt(jnp.mean(wa ** 2))
        norm_a = jnp.linalg.norm(wa)

        expected = (pa.astype(jnp.float32) * len_b / jnp.maximum(len_a, 1)
                    ).astype(jnp.int32)
        lo = jnp.maximum(0, expected - search)
        hi = jnp.minimum(len_b - win, expected + search)

        starts = lo + jnp.arange(n_cand) * stride
        cand_ok = starts < hi
        starts_c = jnp.clip(starts, 0, jnp.maximum(len_b - win, 0))
        idx = s + starts_c[:, None] + local[None, :]
        wb = jnp.take(yb, idx, axis=0, mode="clip")        # (n_cand, win)
        norms_b = jnp.linalg.norm(wb, axis=-1)
        dots = wb @ wa
        cos = jnp.where((norms_b > 1e-10) & cand_ok,
                        dots / (jnp.maximum(norm_a, 1e-10) *
                                jnp.maximum(norms_b, 1e-10)),
                        -jnp.inf)
        k = jnp.argmax(cos)
        best_corr = cos[k]
        best_pb = starts_c[k]

        valid = (long_enough & (rms_a >= cfg.xcorr_rms_gate) &
                 (norm_a >= 1e-10) & (lo < hi) &
                 jnp.isfinite(best_corr) & (best_corr > 0))
        return None, (pa.astype(jnp.float32), best_pb.astype(jnp.float32),
                      jnp.where(valid, best_corr, 0.0), valid)

    _, (pas, pbs, quals, valids) = jax.lax.scan(one_window, None, a_pos)

    n_ok = jnp.sum(valids)
    w = valids.astype(jnp.float32)
    wsum = jnp.maximum(n_ok, 1)
    a_mean = jnp.sum(pas * w) / wsum
    b_mean = jnp.sum(pbs * w) / wsum
    cov = jnp.sum(w * (pas - a_mean) * (pbs - b_mean))
    var = jnp.sum(w * (pas - a_mean) ** 2)
    slope = jnp.where(var > 0, cov / jnp.maximum(var, 1e-20), 1.0)

    from .stats import masked_median
    quality = masked_median(quals, valids)

    ok = n_ok >= 3
    ratio = jnp.where(ok, slope, 1.0)
    quality = jnp.where(ok, quality, 0.0)
    return ratio, quality
