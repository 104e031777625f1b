"""Dynamics: true-peak lookahead limiter and uniform gain.

First-party replacements for the reference's ``ffmpeg alimiter`` true-peak
limiting (``loudness.py:86-135``: only samples above the ceiling are
attenuated, attack 5 ms / release 50 ms) and ``sox gain`` / ``ffmpeg
volume`` uniform gain (``loudness.py:139-191``).

The limiter is expressed without any sequential recurrence — TPU-parallel:

* per-sample target gain ``g = min(1, ceiling/|x|)``;
* 5 ms lookahead = running minimum over the attack window
  (``lax.reduce_window``);
* 50 ms exponential release = in log domain a *prefix minimum* of
  ``log g[k] - k·c`` (gain may rise at most ``c`` per sample), i.e. an
  associative scan instead of the classic one-pole IIR loop.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = ["true_peak_limit", "apply_gain"]


@lru_cache(maxsize=8)
def _limiter_fn(n_max: int, att: int, rel: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(y, limit):
        g = jnp.minimum(1.0, limit / jnp.maximum(jnp.abs(y), 1e-9))
        # lookahead: min over the next `att` samples
        gmin = -jax.lax.reduce_window(
            -g, -jnp.inf, jax.lax.max, (att,), (1,), "SAME")
        # release: gain recovers at most c nats/sample toward 1
        c = 1.0 / rel
        idx = jnp.arange(n_max, dtype=jnp.float32)
        lg = jnp.log(jnp.maximum(gmin, 1e-9))
        lg_rel = jax.lax.associative_scan(jnp.minimum, lg - idx * c) + idx * c
        gain = jnp.exp(jnp.minimum(lg_rel, 0.0))
        return y * gain

    return run


def true_peak_limit(y: np.ndarray, sr: int, limit_db: float = -0.1,
                    attack_ms: float = 5.0, release_ms: float = 50.0
                    ) -> np.ndarray:
    """Limit peaks to ``limit_db`` dBFS; samples below the ceiling pass
    untouched (ffmpeg ``alimiter`` semantics, reference loudness.py:86-135)."""
    import jax.numpy as jnp
    y = np.asarray(y, np.float32)
    n = len(y)
    n_max = 1 << int(np.ceil(np.log2(max(n, 1024))))
    att = max(1, int(attack_ms / 1000.0 * sr))
    rel = max(1, int(release_ms / 1000.0 * sr))
    buf = np.zeros(n_max, np.float32)
    buf[:n] = y
    limit = 10.0 ** (limit_db / 20.0)
    out = _limiter_fn(n_max, att, rel)(jnp.asarray(buf), jnp.asarray(limit))
    return np.asarray(out)[:n]


def apply_gain(y: np.ndarray, gain_db: float) -> np.ndarray:
    """Uniform gain change (sox ``gain`` semantics)."""
    return (np.asarray(y, np.float32) * 10.0 ** (gain_db / 20.0)).astype(np.float32)
