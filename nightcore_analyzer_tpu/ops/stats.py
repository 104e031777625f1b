"""Masked order statistics and the vectorized bootstrap.

The reference's list-of-``Optional[float]`` idiom (``consensus.py:236-240``)
becomes (values, mask) pairs with fixed shapes; its serial 2000-iteration
bootstrap loops (``consensus.py:258-262,303-307``; ``pitch.py:144-148``)
become one gather + one batched sort on device.

Bootstrap semantics: each resample draws ``n_valid`` items uniformly with
replacement from the valid entries and takes their median; the ratio of the
two medians is recorded and the CI is read off percentiles of the 2000
ratios.  Determinism-per-run is preserved with fixed jax.random keys
(seed 42 for tempo/IBI — ``consensus.py:252,295`` — and seed 0 for pitch —
``pitch.py:143``); bit-parity with numpy's Generator is a non-goal, CI widths
and the 0.01% ratio parity bar are the contract (SURVEY §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "masked_median",
    "masked_mean",
    "masked_std",
    "masked_max",
    "percentile",
    "bootstrap_medians",
    "bootstrap_ratio_ci",
]


def _sorted_masked(vals: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sort(jnp.where(mask, vals, jnp.inf), axis=-1)


def masked_median(vals: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """np.median over the masked-in entries of the last axis (nan if none)."""
    s = _sorted_masked(vals, mask)
    n = jnp.sum(mask, axis=-1)
    lo_idx = jnp.maximum(n - 1, 0) // 2
    hi_idx = jnp.maximum(n - 1, 0) - lo_idx  # == n//2 when n>0
    lo = jnp.take_along_axis(s, lo_idx[..., None], axis=-1)[..., 0]
    hi = jnp.take_along_axis(s, hi_idx[..., None], axis=-1)[..., 0]
    med = 0.5 * (lo + hi)
    return jnp.where(n > 0, med, jnp.nan)


def masked_mean(vals, mask):
    n = jnp.sum(mask, axis=-1)
    s = jnp.sum(jnp.where(mask, vals, 0.0), axis=-1)
    return jnp.where(n > 0, s / jnp.maximum(n, 1), jnp.nan)


def masked_std(vals, mask, ddof: int = 1):
    n = jnp.sum(mask, axis=-1)
    mu = masked_mean(vals, mask)
    var = jnp.sum(jnp.where(mask, (vals - mu[..., None]) ** 2, 0.0), axis=-1)
    denom = jnp.maximum(n - ddof, 1)
    return jnp.where(n > ddof, jnp.sqrt(var / denom), jnp.nan)


def masked_max(vals, mask, fill=-jnp.inf):
    return jnp.max(jnp.where(mask, vals, fill), axis=-1)


def masked_median_bisect(vals: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Sort-free masked median for long arrays (last axis): bisect on the
    order-preserving integer encoding of float32 and count elements ≤ mid.
    O(32·n) compares instead of an O(n log n) sort network — the win on TPU
    where sorts are expensive (used on the ~40k-frame cumscore arrays)."""
    # order-preserving uint32 encoding of float32: flip sign bit for
    # positives, all bits for negatives (total order = unsigned order)
    bits = jax.lax.bitcast_convert_type(vals.astype(jnp.float32), jnp.uint32)
    neg = bits >= jnp.uint32(0x80000000)
    enc = jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))
    big = jnp.uint32(0xFFFFFFFF)
    enc = jnp.where(mask, enc, big)
    n = jnp.sum(mask, axis=-1)

    def kth(k):
        lo = jnp.full(n.shape, 0, jnp.uint32)
        hi = jnp.full(n.shape, big - jnp.uint32(1), jnp.uint32)

        def body(_, lohi):
            lo, hi = lohi
            mid = lo + (hi - lo) // jnp.uint32(2)
            cnt = jnp.sum(enc <= mid[..., None], axis=-1)
            ge = cnt >= (k + 1)
            return (jnp.where(ge, lo, mid + jnp.uint32(1)),
                    jnp.where(ge, mid, hi))

        lo, hi = jax.lax.fori_loop(0, 33, body, (lo, hi))
        e = lo
        dec = jnp.where(e >= jnp.uint32(0x80000000),
                        e & jnp.uint32(0x7FFFFFFF), ~e)
        return jax.lax.bitcast_convert_type(dec, jnp.float32)

    k_lo = jnp.maximum(n - 1, 0) // 2
    k_hi = jnp.maximum(n - 1, 0) - k_lo
    med = 0.5 * (kth(k_lo) + kth(k_hi))
    return jnp.where(n > 0, med, jnp.nan)


def percentile(sorted_vals: jnp.ndarray, q: float) -> jnp.ndarray:
    """np.percentile (linear interpolation) over a pre-sorted last axis."""
    n = sorted_vals.shape[-1]
    pos = q / 100.0 * (n - 1)
    lo = jnp.floor(jnp.asarray(pos)).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    frac = pos - lo
    vlo = jnp.take(sorted_vals, lo, axis=-1)
    vhi = jnp.take(sorted_vals, hi, axis=-1)
    return vlo + frac * (vhi - vlo)


def bootstrap_medians(key: jax.Array, vals: jnp.ndarray, mask: jnp.ndarray,
                      n_boot: int) -> jnp.ndarray:
    """(n_boot,) medians of with-replacement resamples of the valid entries.

    Each resample has size ``n_valid`` (matching numpy ``rng.choice(v, size=len(v))``
    in ``consensus.py:259-260``), realized with fixed shapes by drawing
    ``n_max`` indices and masking out columns ``>= n_valid``.

    TPU formulation: sorting every resample is O(n_boot·n·log n) of
    sort-network traffic; instead the *source* values are sorted once, the
    draws become integer indices into that sorted array, and the median of a
    resample is the value at the median *index* (monotone map).

    Two ways to obtain the middle order statistics of the drawn indices:

    * small ``n_max``: vectorized binary search over counts of the
      (n_boot, n_max) index matrix — pure compare/reduce VPU work;
    * large ``n_max`` (the 2048-beat IBI buffers): the matrix itself is
      the bottleneck (11 bisect passes over 16 MB), so the order
      statistics are sampled DIRECTLY from their exact joint law instead
      of materializing any draws.  A resampled index is ``floor(U·n)``
      with ``U ~ U(0,1)``; ``floor`` is monotone, so the k-th order
      statistic of the indices is ``floor(U_(k)·n)`` where
      ``U_(k) ~ Beta(k+1, n-k)`` — and the adjacent statistic needed for
      even-n medians is ``U_(k+1) = U_(k) + (1-U_(k))·min``-of-
      ``(n-k-1)`` uniforms.  This is a change of sampling procedure, not
      of distribution: the bootstrap-median law is reproduced exactly
      (per-draw), only the random stream differs — same determinism
      class as the documented jax.random-vs-numpy deviation.
    """
    n_max = vals.shape[-1]
    if n_max >= 256:
        return _bootstrap_medians_beta(key, vals, mask, n_boot)
    n_valid = jnp.sum(mask, axis=-1)
    # sorted valid entries first (invalid → +inf go last)
    sorted_vals = jnp.sort(jnp.where(mask, vals, jnp.inf), axis=-1)
    u = jax.random.uniform(key, (n_boot, n_max))
    idx = jnp.minimum((u * n_valid).astype(jnp.int32),
                      jnp.maximum(n_valid - 1, 0))
    # columns beyond the resample size never count
    live = jnp.arange(n_max)[None, :] < n_valid
    idx = jnp.where(live, idx, n_max + 1)

    def kth_index2(ka, kb):
        """Per row: smallest j with #(idx <= j) >= k+1, for BOTH order
        statistics in one bisect loop — the (n_boot, n_max) index matrix is
        the traffic bottleneck, and one fused loop reads it once per
        iteration for the two counts instead of twice."""
        lo_a = lo_b = jnp.zeros(n_boot, jnp.int32)
        hi_a = hi_b = jnp.full(n_boot, n_max - 1, jnp.int32)
        bits = max(1, int(np.ceil(np.log2(max(n_max, 2)))))

        def body(_, st):
            lo_a, hi_a, lo_b, hi_b = st
            mid_a = (lo_a + hi_a) // 2
            mid_b = (lo_b + hi_b) // 2
            cnt_a = jnp.sum(idx <= mid_a[:, None], axis=-1)
            cnt_b = jnp.sum(idx <= mid_b[:, None], axis=-1)
            ge_a = cnt_a >= (ka + 1)
            ge_b = cnt_b >= (kb + 1)
            return (jnp.where(ge_a, lo_a, mid_a + 1),
                    jnp.where(ge_a, mid_a, hi_a),
                    jnp.where(ge_b, lo_b, mid_b + 1),
                    jnp.where(ge_b, mid_b, hi_b))

        lo_a, _, lo_b, _ = jax.lax.fori_loop(
            0, bits, body, (lo_a, hi_a, lo_b, hi_b))
        return lo_a, lo_b

    k_lo = jnp.maximum(n_valid - 1, 0) // 2
    k_hi = jnp.maximum(n_valid - 1, 0) - k_lo
    j1, j2 = kth_index2(k_lo, k_hi)
    med = 0.5 * (jnp.take(sorted_vals, jnp.clip(j1, 0, n_max - 1)) +
                 jnp.take(sorted_vals, jnp.clip(j2, 0, n_max - 1)))
    return jnp.where(n_valid > 0, med, jnp.nan)


def _bootstrap_medians_beta(key: jax.Array, vals: jnp.ndarray,
                            mask: jnp.ndarray, n_boot: int) -> jnp.ndarray:
    """Exact-law bootstrap medians via order-statistic sampling (see
    :func:`bootstrap_medians`).  O(n log n) sort + O(n_boot) draws — no
    (n_boot, n_max) index matrix."""
    n_max = vals.shape[-1]
    n_valid = jnp.sum(mask, axis=-1)
    sorted_vals = jnp.sort(jnp.where(mask, vals, jnp.inf), axis=-1)
    n = jnp.maximum(n_valid, 1).astype(jnp.float32)
    k_lo = (jnp.maximum(n_valid - 1, 0) // 2).astype(jnp.float32)
    k1, k2 = jax.random.split(key)
    # U_(k_lo) of n iid uniforms
    v1 = jax.random.beta(k1, k_lo + 1.0, n - k_lo, shape=(n_boot,))
    # U_(k_lo+1) = v1 + (1-v1)·(min of the remaining n-k_lo-1 uniforms)
    m = jnp.maximum(n - k_lo - 1.0, 1.0)
    gap = 1.0 - jax.random.uniform(
        k2, (n_boot,), minval=jnp.finfo(jnp.float32).tiny) ** (1.0 / m)
    v2 = v1 + (1.0 - v1) * gap
    even = (n_valid % 2 == 0) & (n_valid > 1)   # k_hi = k_lo+1 only then
    top = jnp.maximum(n_valid - 1, 0)           # f32 v≈1 could floor to n
    j1 = jnp.clip((v1 * n).astype(jnp.int32), 0, top)
    j2 = jnp.where(even, jnp.clip((v2 * n).astype(jnp.int32), 0, top), j1)
    med = 0.5 * (jnp.take(sorted_vals, j1) + jnp.take(sorted_vals, j2))
    return jnp.where(n_valid > 0, med, jnp.nan)


def bootstrap_ratio_ci(key: jax.Array,
                       num_vals, num_mask, den_vals, den_mask,
                       n_boot: int, ci: float = 0.95):
    """Point estimate + bootstrap CI of ``median(num)/median(den)``.

    Mirrors ``consensus._bootstrap_ratio`` (``consensus.py:243-267``): the two
    sides are resampled independently.  Returns ``(point, lo, hi)``.
    """
    k1, k2 = jax.random.split(key)
    point = masked_median(num_vals, num_mask) / masked_median(den_vals, den_mask)
    boots = bootstrap_medians(k1, num_vals, num_mask, n_boot) / \
        bootstrap_medians(k2, den_vals, den_mask, n_boot)
    s = jnp.sort(boots)
    alpha = (1.0 - ci) / 2.0
    lo = percentile(s, alpha * 100.0)
    hi = percentile(s, (1.0 - alpha) * 100.0)
    return point, lo, hi
