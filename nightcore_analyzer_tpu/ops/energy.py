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

__all__ = ["TRIM_HOP", "energy_cumsum", "energy_cumsum_grid",
           "frame_rms_power", "trim_bounds", "trim_bounds_y",
           "window_energies_db", "window_energies_db_y", "energy_gate_mask",
           "roll_to_start"]

#: Frame hop of the silence-trim scan (librosa ``effects.trim`` default).
#: Trim start bounds are always multiples of this, which is what licenses
#: the ``block=TRIM_HOP`` fast path in :func:`roll_to_start` — callers must
#: pass this constant (not a literal) so the two can never desync.
TRIM_HOP = 512


def energy_cumsum(y: jnp.ndarray) -> jnp.ndarray:
    """cumsum of y² with a leading 0 — shape (N+1,)."""
    return jnp.concatenate([jnp.zeros(y.shape[:-1] + (1,)),
                            jnp.cumsum(y * y, axis=-1)], axis=-1)


def energy_cumsum_grid(y: jnp.ndarray, block: int) -> jnp.ndarray:
    """Energy prefix sums at ``block``-sample granularity — (N//block + 1,).

    ``out[k] == energy_cumsum(y)[k·block]`` exactly, but computed as one
    block-reduce plus a tiny cumsum instead of a full-length scan: both the
    trim frame grid and the window-slot grid only ever query the prefix sum
    at fixed multiples (the buffers are zero beyond ``n``, so saturation at
    ``n`` happens naturally), and the full-resolution scan was ~a third of
    the silence-strip stage's 32 ms."""
    N = y.shape[-1]
    pad = (-N) % block
    if pad:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad)])
    blocks = (y * y).reshape(y.shape[:-1] + (-1, block)).sum(axis=-1)
    return jnp.concatenate([jnp.zeros(y.shape[:-1] + (1,)),
                            jnp.cumsum(blocks, axis=-1)], axis=-1)


def frame_rms_power(cs: jnp.ndarray, n: jnp.ndarray, *, frame_length: int = 2048,
                    hop: int = TRIM_HOP, n_frames: int | None = None) -> jnp.ndarray:
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
                *, frame_length: int = 2048, hop: int = TRIM_HOP):
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


def roll_to_start(y: jnp.ndarray, start: jnp.ndarray,
                  *, block: int | None = None) -> jnp.ndarray:
    """Shift the valid region to offset 0 (fixed-shape replacement for
    ``y[start:]``); the tail keeps stale samples — callers mask by length.

    When the caller guarantees ``start`` is a multiple of ``block`` (the
    silence-strip bounds are hop-multiples by construction) pass ``block``:
    the roll becomes a 128-lane-aligned *block* gather over N/block rows
    instead of an element gather over N samples — an order of magnitude
    less index work on TPU."""
    if block is not None and y.shape[-1] % block == 0:
        nb = y.shape[-1] // block
        yb = y.reshape(y.shape[:-1] + (nb, block))
        idx = (jnp.arange(nb) + start // block) % nb
        return jnp.take(yb, idx, axis=-2).reshape(y.shape)
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


def trim_bounds_y(y: jnp.ndarray, n: jnp.ndarray, top_db: float,
                  *, frame_length: int = 2048, hop: int = TRIM_HOP):
    """:func:`trim_bounds` taking the signal directly; grid prefix sums.

    Exact (not approximate): frame edges ``t·hop ± frame_length/2`` are
    multiples of ``hop`` whenever ``hop | frame_length/2`` (librosa's
    2048/512 default), and the zero tail beyond ``n`` makes the index
    clipping equivalent to prefix-sum saturation.
    """
    if (frame_length // 2) % hop:
        cs = energy_cumsum(y)
        return trim_bounds(cs, n, top_db, frame_length=frame_length, hop=hop)
    N = y.shape[-1]
    csg = energy_cumsum_grid(y, hop)
    Ng = csg.shape[-1] - 1
    n_frames = 1 + N // hop
    t = jnp.arange(n_frames)
    k = frame_length // (2 * hop)
    lo = jnp.clip(t - k, 0, Ng)
    hi = jnp.clip(t + k, 0, Ng)
    power = (jnp.take(csg, hi) - jnp.take(csg, lo)) / frame_length
    fvalid = t <= n // hop
    power = jnp.where(fvalid, power, 0.0)
    ref = masked_max(power, fvalid, fill=0.0)
    db = 10.0 * jnp.log10(jnp.maximum(power, 1e-10) / jnp.maximum(ref, 1e-10))
    nonsilent = (db > -top_db) & fvalid
    first = jnp.min(jnp.where(nonsilent, t, n_frames))
    last = jnp.max(jnp.where(nonsilent, t, -1))
    any_ns = last >= 0
    start = jnp.where(any_ns, first * hop, 0)
    end = jnp.where(any_ns, jnp.minimum((last + 1) * hop, n), n)
    return start.astype(jnp.int32), end.astype(jnp.int32)


def window_energies_db_y(y: jnp.ndarray, n: jnp.ndarray, cfg: AnalyzerConfig):
    """:func:`window_energies_db` taking the signal directly; grid sums at
    gcd(hop, win) granularity — exact for the same saturation reason."""
    import math
    g = math.gcd(cfg.hop_samples, cfg.win_samples)
    if g < 64:
        return window_energies_db(energy_cumsum(y), n, cfg)
    csg = energy_cumsum_grid(y, g)
    Ng = csg.shape[-1] - 1
    s = jnp.arange(cfg.n_window_slots)
    start = s * (cfg.hop_samples // g)
    stop = start + cfg.win_samples // g
    valid = stop * g <= n
    energy = (jnp.take(csg, jnp.minimum(stop, Ng)) -
              jnp.take(csg, jnp.minimum(start, Ng)))
    rms = jnp.sqrt(jnp.maximum(energy, 0.0) / cfg.win_samples)
    db = 20.0 * jnp.log10(jnp.maximum(rms, 1e-10))
    return jnp.where(valid, db, -jnp.inf), valid
