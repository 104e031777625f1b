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

__all__ = ["decimate2", "decimate_pow2", "decimated_len"]


@lru_cache(maxsize=4)
def _hb(n_taps: int = 97) -> np.ndarray:
    return filters.halfband_lowpass(n_taps)


def decimate2(y: jnp.ndarray) -> jnp.ndarray:
    """Anti-aliased 2× decimation along the last axis; output length ceil(N/2).

    TPU-friendly polyphase form: the signal is reshaped into its even/odd
    phases (contiguous loads, no strided slicing), and the half-band FIR —
    whose even taps are all zero except the center by construction —
    reduces to ``0.5·even[i] + Σ_m h[2m+1]·odd[i+m-H]``: ~48 statically
    shifted contiguous adds on half-length arrays that XLA fuses into one
    vectorized pass.  No ``lax.conv`` (compile-hostile for ~100-tap kernels
    on some backends).
    """
    h = _hb()
    n_taps = len(h)
    half = (n_taps - 1) // 2                     # 48 for the 97-tap design
    N = y.shape[-1]
    n_out = (N + 1) // 2

    lead = y.shape[:-1]
    ypad = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, (-N) % 2)])
    r = ypad.reshape(lead + (-1, 2))
    xe, xo = r[..., 0], r[..., 1]                # x[2i], x[2i+1]

    out = float(h[half]) * xe[..., :n_out]
    # odd taps: t = 2m+1 → x[2(i+m-half/2)+1] = xo[i + m - half//2]
    hw = half // 2                               # 24
    xop = jnp.pad(xo, [(0, 0)] * (y.ndim - 1) + [(hw, hw + 2)])
    for m in range(half):                        # taps t = 1, 3, … 95
        ht = float(h[2 * m + 1])
        if abs(ht) < 1e-12:
            continue
        out = out + ht * jax.lax.slice_in_dim(xop, m, m + n_out, axis=-1)
    return out


def decimate_pow2(y: jnp.ndarray, factor: int) -> jnp.ndarray:
    assert factor & (factor - 1) == 0 and factor >= 1
    while factor > 1:
        y = decimate2(y)
        factor //= 2
    return y


def decimated_len(n, factor: int):
    """Valid-sample count after :func:`decimate_pow2` (ceil division per stage)."""
    while factor > 1:
        n = (n + 1) // 2
        factor //= 2
    return n
