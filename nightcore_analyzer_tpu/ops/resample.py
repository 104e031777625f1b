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

    The half-band FIR is applied as a sum of statically shifted strided
    slices — half the filter taps are zero by construction, XLA fuses the
    whole thing into one vectorized pass, and (unlike ``lax.conv`` with a
    ~100-tap kernel) it compiles quickly on every backend.
    """
    h = _hb()
    half = (len(h) - 1) // 2
    N = y.shape[-1]
    n_out = (N + 1) // 2
    ypad = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(half, half + 2)])
    out = None
    for t, ht in enumerate(h):
        if abs(float(ht)) < 1e-12:
            continue
        term = float(ht) * jax.lax.slice_in_dim(
            ypad, t, t + 2 * n_out, stride=2, axis=-1)
        out = term if out is None else out + term
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
