"""Device-side decimators (power-of-two polyphase resampling).

Used for the auto-aligner's 22 050 → 11 025 Hz envelope path (reference
``xcorr.py:206-207``) and the low-octave chroma stream (4× decimation in
place of librosa's recursive CQT downsampling).  Arbitrary-ratio resampling
of *input files* happens in the native host decoder
(``nightcore_analyzer_tpu/native``); on device we only ever halve.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from . import filters

__all__ = ["decimate2", "decimate_pow2", "decimated_len"]


@lru_cache(maxsize=4)
def _hb(n_taps: int = 97) -> np.ndarray:
    return filters.halfband_lowpass(n_taps)


def decimate2(y: jnp.ndarray) -> jnp.ndarray:
    """Anti-aliased 2× decimation along the last axis; output length ceil(N/2)."""
    h = jnp.asarray(_hb())
    lp = jnp.convolve(y, h, mode="same") if y.ndim == 1 else None
    if lp is None:
        import jax
        lp = jax.vmap(lambda x: jnp.convolve(x, h, mode="same"))(y.reshape(-1, y.shape[-1]))
        lp = lp.reshape(y.shape)
    return lp[..., ::2]


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
