"""Device mesh + sharding layout for corpus-scale analysis.

The reference is single-process / single-machine with zero parallelism
(SURVEY §2.3); the TPU build's distribution axis is the *corpus*: thousands
of (nightcore, source) pairs sharded over chips.  The layout is one mesh
axis ``data`` over all chips; per-pair analysis is embarrassingly parallel,
so the only collectives are corpus-level reductions (``psum`` over ``data``)
— they ride ICI within a slice, and XLA routes multi-slice meshes over DCN
automatically.

Everything here works identically on one real TPU, a pod slice, or the
virtual 8-device CPU mesh used by the tests.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["default_mesh", "batch_sharding", "replicated", "CorpusStats",
           "corpus_stats"]


def default_mesh(devices: Optional[Sequence[jax.Device]] = None,
                 axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int = 1,
                   axis_name: str = "data") -> NamedSharding:
    """First-axis (pair-axis) sharding; remaining dims replicated."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


class CorpusStats(NamedTuple):
    """Corpus-level aggregate report (per-shard psum over the data axis)."""
    n_pairs: jnp.ndarray
    n_ok: jnp.ndarray               # pairs with enough tempo windows
    mean_tempo_ratio: jnp.ndarray
    mean_ibi_ratio: jnp.ndarray
    n_ibi_valid: jnp.ndarray
    n_pure_nightcore: jnp.ndarray   # |pitch - tempo| <= tolerance


def corpus_stats(tempo_ratio: jnp.ndarray, pitch_ratio: jnp.ndarray,
                 ibi_ratio: jnp.ndarray, ibi_valid: jnp.ndarray,
                 tempo_ok: jnp.ndarray, pair_mask: jnp.ndarray,
                 *, tolerance: float = 0.02,
                 axis_name: str = "data") -> CorpusStats:
    """shard_map body: reduce per-pair scalars across the mesh with psum.

    All inputs are the local shard's (B_local,) arrays; outputs are
    replicated scalars.  This is the one place the TPU build needs a
    communication backend at all (SURVEY §2.3: all-gather/psum of per-pair
    scalar results over ICI).
    """
    ok = tempo_ok & pair_mask
    def _psum(x):
        return jax.lax.psum(x, axis_name)
    n_pairs = _psum(jnp.sum(pair_mask.astype(jnp.int32)))
    n_ok = _psum(jnp.sum(ok.astype(jnp.int32)))
    sum_t = _psum(jnp.sum(jnp.where(ok, tempo_ratio, 0.0)))
    ibi_ok = ok & ibi_valid
    n_ibi = _psum(jnp.sum(ibi_ok.astype(jnp.int32)))
    sum_i = _psum(jnp.sum(jnp.where(ibi_ok, ibi_ratio, 0.0)))
    pure = ok & (jnp.abs(pitch_ratio - tempo_ratio) <= tolerance)
    n_pure = _psum(jnp.sum(pure.astype(jnp.int32)))
    return CorpusStats(
        n_pairs=n_pairs, n_ok=n_ok,
        mean_tempo_ratio=sum_t / jnp.maximum(n_ok, 1),
        mean_ibi_ratio=sum_i / jnp.maximum(n_ibi, 1),
        n_ibi_valid=n_ibi, n_pure_nightcore=n_pure)
