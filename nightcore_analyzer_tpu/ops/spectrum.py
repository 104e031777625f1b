"""Core spectral ops: framing utilities and dB conversion.

Everything here is shape-static and jit/vmap friendly.  The central tool is
:func:`frame_interleaved`: TPU HBM cannot hold a fully materialized hop-64
STFT of a multi-minute track (the reference's hottest path, ``tempo.py:158``),
so the consumers stream frames through ``lax.scan`` in fixed-size chunks,
built with gather-free interleaved reshapes (~8× cheaper than index-matrix
gathers on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "frame_indices",
    "frame_signal",
    "interleave_params",
    "frame_interleaved",
    "power_to_db",
    "amplitude_to_db",
]


def frame_indices(n_frames: int, frame_length: int, hop: int) -> np.ndarray:
    """(n_frames, frame_length) gather index matrix (static)."""
    return (np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :])


def frame_signal(y: jnp.ndarray, n_frames: int, frame_length: int, hop: int,
                 offset=0) -> jnp.ndarray:
    """Gather overlapping frames from the last axis of ``y``.

    ``offset`` may be a traced scalar (frames start at ``offset + i*hop``).
    Out-of-range indices are clamped by jnp.take's default mode; callers pad
    ``y`` so that all in-mask frames are fully in range.
    """
    idx = jnp.asarray(frame_indices(n_frames, frame_length, hop))
    idx = idx + offset
    return jnp.take(y, idx, axis=-1)


def interleave_params(n_frames: int, n_fft: int, hop: int):
    """Phases/padding for reshape-based framing (requires hop | n_fft).

    Overlapping frames at hop ``h`` with ``P = n_fft/h`` phases decompose
    into P *non-overlapping* framings: frames ``t ≡ o (mod P)`` are a plain
    reshape of ``seg[o*h:]``.  Gather-free framing is ~8× cheaper on TPU
    than a static-index take.  Returns ``(P, K, n_padded, perm)`` with
    ``ordered[t] = interleaved[perm[t]]``.
    """
    assert n_fft % hop == 0
    P = n_fft // hop
    K = -(-n_frames // P)
    n_padded = P * K
    t = np.arange(n_padded)
    perm = (t % P) * K + t // P
    return P, K, n_padded, perm


def frame_interleaved(seg: jnp.ndarray, n_frames: int, n_fft: int, hop: int):
    """Frame ``seg`` (last axis) into (n_padded, n_fft) *interleaved-order*
    frames via P contiguous reshapes; use ``interleave_params`` for the
    permutation restoring time order (apply it to whatever small per-frame
    quantity you compute — not to the frames themselves)."""
    P, K, n_padded, _ = interleave_params(n_frames, n_fft, hop)
    need = (K - 1) * n_fft + (P - 1) * hop + n_fft
    if seg.shape[-1] < need:
        seg = jnp.pad(seg, [(0, 0)] * (seg.ndim - 1) + [(0, need - seg.shape[-1])])
    blocks = [
        jax.lax.slice_in_dim(seg, o * hop, o * hop + K * n_fft, axis=-1)
        .reshape(seg.shape[:-1] + (K, n_fft))
        for o in range(P)
    ]
    return jnp.concatenate(blocks, axis=-2)          # (..., P*K, n_fft)


def power_to_db(S: jnp.ndarray, ref: float = 1.0, amin: float = 1e-10,
                top_db: float | None = 80.0) -> jnp.ndarray:
    """librosa ``power_to_db`` semantics: 10*log10(max(S,amin)/ref), clamped
    to ``max - top_db`` when ``top_db`` is given (clamp over the whole array)."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(S, amin))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(jnp.asarray(ref), amin))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


def amplitude_to_db(S: jnp.ndarray, ref: float = 1.0, amin: float = 1e-5,
                    top_db: float | None = 80.0) -> jnp.ndarray:
    return power_to_db(S ** 2, ref=float(ref) ** 2, amin=amin ** 2, top_db=top_db)



