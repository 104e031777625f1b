"""Silence trim, frame RMS, window energies, and the energy gate.

Device-side rebuild of the reference's L2 (``io.py``):

* :func:`trim_bounds` — ``librosa.effects.trim`` semantics (``io.py:58-79``):
  frame RMS power in dB relative to the peak frame, first/last frame above
  ``-top_db`` → sample bounds.  The caller *rolls* the signal left by the
  start bound instead of slicing (fixed shapes).
* :func:`window_energies_db` — per-window-slot RMS dB (``io.py:38-40,104``).
* :func:`energy_gate_mask` — keep windows within ``threshold_db`` of the
  loudest window (``io.py:115-126``); Python list filtering becomes a mask.

All are powered by one prefix-sum of ``y**2`` — O(N) total for any number of
window/frame queries.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import AnalyzerConfig
from .stats import masked_max

__all__ = ["energy_cumsum", "frame_rms_power", "trim_bounds",
           "window_energies_db", "energy_gate_mask", "roll_to_start"]


def energy_cumsum(y: jnp.ndarray) -> jnp.ndarray:
    """cumsum of y² with a leading 0 — shape (N+1,)."""
    return jnp.concatenate([jnp.zeros(y.shape[:-1] + (1,)),
                            jnp.cumsum(y * y, axis=-1)], axis=-1)


def frame_rms_power(cs: jnp.ndarray, n: jnp.ndarray, *, frame_length: int = 2048,
                    hop: int = 512, n_frames: int | None = None) -> jnp.ndarray:
    """Centered frame mean-square power (librosa ``feature.rms``²).

    ``cs``: energy cumsum; ``n``: valid sample count.  Returns (n_frames,)
    with frames beyond ``1 + n//hop`` set to 0.
    """
    N = cs.shape[-1] - 1
    if n_frames is None:
        n_frames = 1 + N // hop
    t = jnp.arange(n_frames)
    lo = jnp.clip(t * hop - frame_length // 2, 0, n)
    hi = jnp.clip(t * hop + frame_length // 2, 0, n)
    power = (jnp.take(cs, hi) - jnp.take(cs, lo)) / frame_length
    return jnp.where(t <= n // hop, power, 0.0)


def trim_bounds(cs: jnp.ndarray, n: jnp.ndarray, top_db: float,
                *, frame_length: int = 2048, hop: int = 512):
    """(start_sample, end_sample) of the non-silent span (librosa trim)."""
    N = cs.shape[-1] - 1
    n_frames = 1 + N // hop
    power = frame_rms_power(cs, n, frame_length=frame_length, hop=hop,
                            n_frames=n_frames)
    t = jnp.arange(n_frames)
    fvalid = t <= n // hop
    ref = masked_max(power, fvalid, fill=0.0)
    db = 10.0 * jnp.log10(jnp.maximum(power, 1e-10) / jnp.maximum(ref, 1e-10))
    nonsilent = (db > -top_db) & fvalid
    first = jnp.min(jnp.where(nonsilent, t, n_frames))
    last = jnp.max(jnp.where(nonsilent, t, -1))
    any_ns = last >= 0
    start = jnp.where(any_ns, first * hop, 0)
    end = jnp.where(any_ns, jnp.minimum((last + 1) * hop, n), n)
    return start.astype(jnp.int32), end.astype(jnp.int32)


def roll_to_start(y: jnp.ndarray, start: jnp.ndarray) -> jnp.ndarray:
    """Shift the valid region to offset 0 (fixed-shape replacement for
    ``y[start:]``); the tail keeps stale samples — callers mask by length."""
    return jnp.roll(y, -start, axis=-1)


def window_energies_db(cs: jnp.ndarray, n: jnp.ndarray, cfg: AnalyzerConfig):
    """Per-slot RMS dB + slot validity (full windows only, ``io.py:93-99``)."""
    s = jnp.arange(cfg.n_window_slots)
    start = s * cfg.hop_samples
    stop = start + cfg.win_samples
    valid = stop <= n
    energy = (jnp.take(cs, jnp.minimum(stop, cs.shape[-1] - 1)) -
              jnp.take(cs, jnp.minimum(start, cs.shape[-1] - 1)))
    rms = jnp.sqrt(jnp.maximum(energy, 0.0) / cfg.win_samples)
    db = 20.0 * jnp.log10(jnp.maximum(rms, 1e-10))
    return jnp.where(valid, db, -jnp.inf), valid


def energy_gate_mask(energies_db: jnp.ndarray, valid: jnp.ndarray,
                     threshold_db: float) -> jnp.ndarray:
    peak = masked_max(energies_db, valid)
    return valid & (energies_db >= peak + threshold_db)
