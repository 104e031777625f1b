"""Device-side decimators (power-of-two polyphase resampling).

Used for the auto-aligner's 22 050 → 11 025 Hz envelope path (reference
``xcorr.py:206-207``) and the low-octave chroma stream (4× decimation in
place of librosa's recursive CQT downsampling).  Arbitrary-ratio resampling
of *input files* happens in the native host decoder
(``nightcore_analyzer_tpu/native``); on device we only ever halve.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import filters

__all__ = ["decimate2", "decimate4", "decimate_pow2", "decimated_len"]


@lru_cache(maxsize=4)
def _hb(n_taps: int = 97) -> np.ndarray:
    return filters.halfband_lowpass(n_taps)


@lru_cache(maxsize=4)
def _hb_matrices(n_taps: int = 97) -> tuple[np.ndarray, np.ndarray]:
    """Two (128, 64) matrices turning decimation into plain matmuls.

    With xpad[k] = x[k − (n_taps−1)] (left pad) and the signal viewed as
    contiguous rows V[b][c] = xpad[128·b + c]:

        out[64b + j] = Σ_τ h[τ]·xpad[128b + 2j + τ]
                     = V[b] @ Ha[:, j] + V[b+1] @ Hb[:, j]

    where Ha/Hb[t, j] = h[t (+128) − 2j] over the 97-tap support.  No
    even/odd de-interleave of the signal is ever formed (the strided phase
    split was a 22 ms lane shuffle at corpus shape)."""
    h = _hb(n_taps)
    H = np.zeros((256, 64), np.float32)
    for j in range(64):
        for tau in range(n_taps):
            H[2 * j + tau, j] = h[tau]
    return H[:128].copy(), H[128:].copy()


def decimate2(y: jnp.ndarray) -> jnp.ndarray:
    """Anti-aliased 2× decimation along the last axis; output length ceil(N/2).

    The half-band FIR + downsample maps to two (blocks,128)@(128,64) MXU
    matmuls over contiguous 128-sample rows of the padded signal — no
    strided phase split, no gathers, no lax.conv (compile-hostile for
    ~100-tap kernels on some backends).  Replaces round-1's 48 shifted
    adds (52 ms → ~4 ms per corpus batch)."""
    h = _hb()
    n_taps = len(h)
    half = (n_taps - 1) // 2
    N = y.shape[-1]
    n_out = (N + 1) // 2
    lead = y.shape[:-1]

    nb = -(-n_out // 64)
    # out[i] = Σ_τ h[τ]·x[2i + τ − half] (symmetric taps) → left pad by half
    need = nb * 128 + 128
    pad_l = half
    pad_r = max(0, need - pad_l - N)
    xpad = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad_l, pad_r)])
    V = xpad[..., :need].reshape(lead + (nb + 1, 128))
    Ha, Hb = _hb_matrices(n_taps)
    OUT = (jnp.matmul(V[..., :-1, :], jnp.asarray(Ha),
                      preferred_element_type=jnp.float32)
           + jnp.matmul(V[..., 1:, :], jnp.asarray(Hb),
                        preferred_element_type=jnp.float32))
    return OUT.reshape(lead + (nb * 64,))[..., :n_out]


@lru_cache(maxsize=2)
def _q4_matrices(n_taps: int = 97):
    """Five (128, 64) matrices for fused 4× decimation.

    The ÷2 cascade composes into one stride-4 FIR at the input rate:
    g[u] = Σ_{2m+τ=u} h[m]·h[τ] (length 3·(n_taps−1)+1, group delay
    3·half).  With xpad[k] = x[k − 3·half] and rows V[r][c] = xpad[128r+c],
    an output block of 64 samples spans 5 rows:

        out[64b + j] = Σ_p V[2b + p] @ Gp[:, j],
        Gp[c, j] = g[128p + c − 4j] on its support.

    One pass over the signal — the cascade's intermediate (write + read of
    the half-rate signal) disappears.  Deviation vs the cascade: the true
    two-stage convolution keeps the stage-1 filter tail at the signal edges
    instead of zero-truncating the intermediate (≤ 3·half input samples
    ≈ 6.5 ms at each edge; the fused form is the more faithful filter)."""
    h = _hb(n_taps)
    g = np.zeros(3 * (n_taps - 1) + 1)
    for m in range(n_taps):
        g[2 * m:2 * m + n_taps] += h[m] * h
    G = np.zeros((5 * 128, 64), np.float32)
    for j in range(64):
        G[4 * j:4 * j + len(g), j] = g
    return tuple(G[128 * p:128 * (p + 1)].copy() for p in range(5))


def decimate4(y: jnp.ndarray) -> jnp.ndarray:
    """Anti-aliased 4× decimation along the last axis (fused ÷2∘÷2)."""
    h = _hb()
    n_taps = len(h)
    half3 = 3 * ((n_taps - 1) // 2)
    N = y.shape[-1]
    n_out = decimated_len(N, 4)
    lead = y.shape[:-1]

    nb = -(-n_out // 64)
    need = (nb + 2) * 256
    pad_r = max(0, need - half3 - N)
    xpad = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(half3, pad_r)])
    W = xpad[..., :need].reshape(lead + (nb + 2, 2, 128))
    Gs = [jnp.asarray(g) for g in _q4_matrices(n_taps)]
    OUT = (jnp.matmul(W[..., 0:nb, 0, :], Gs[0],
                      preferred_element_type=jnp.float32)
           + jnp.matmul(W[..., 0:nb, 1, :], Gs[1],
                        preferred_element_type=jnp.float32)
           + jnp.matmul(W[..., 1:nb + 1, 0, :], Gs[2],
                        preferred_element_type=jnp.float32)
           + jnp.matmul(W[..., 1:nb + 1, 1, :], Gs[3],
                        preferred_element_type=jnp.float32)
           + jnp.matmul(W[..., 2:nb + 2, 0, :], Gs[4],
                        preferred_element_type=jnp.float32))
    return OUT.reshape(lead + (nb * 64,))[..., :n_out]


def decimate_pow2(y: jnp.ndarray, factor: int) -> jnp.ndarray:
    assert factor & (factor - 1) == 0 and factor >= 1
    while factor > 1:
        if factor % 4 == 0:
            y = decimate4(y)
            factor //= 4
        else:
            y = decimate2(y)
            factor //= 2
    return y


def decimated_len(n, factor: int):
    """Valid-sample count after :func:`decimate_pow2` (ceil division per stage)."""
    while factor > 1:
        n = (n + 1) // 2
        factor //= 2
    return n
