"""Pallas TPU kernel: the beat-tracker forward DP.

The Ellis DP recurrence (``cumscore[i] = localscore[i] + max_d(txwt[d] +
cumscore[i-d])``) is the one genuinely sequential op in the analyzer and the
throughput-limiting stage of the hop-64 IBI pass (SURVEY §3.5).  As a
``lax.scan`` it costs ~8 µs per frame in dispatch/loop overhead; this kernel
keeps the whole sliding DP state in VMEM and burns ~0.3 µs per frame of pure
VPU work instead.

Layout:
* lanes (batch × side [× window-slot]) ride the 128-wide lane dimension;
* time is tiled: grid = (lane_blocks, time_tiles), the scratch carry
  ``cumbuf`` (W + T, 128) holds the trailing ``W`` cumulative scores between
  time tiles (scratch persists across grid steps; lane-major grid order
  resets it at each new lane block);
* the tempo-dependent transition weights ``txwt`` (distance ``d`` ∈
  [round(p/2), 2p], weight ``-tightness·ln²(d/p)``) are computed per lane
  block from the per-lane period vector — one (W, 128) tensor reused by
  every step.

Matches the semantics of ``beat._dp`` (the lax.scan reference used on
non-TPU backends), including the first-beat/weak-onset backlink rule.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dp_forward"]

LANES = 128
NEG = -1e30          # effective -inf that survives arithmetic


def _kernel(ls_ref, period_ref, thresh_ref, cum_ref, bl_ref,
            cumbuf, txwt, first, *, W: int, T: int, tightness: float):
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _init():
        cumbuf[:, :] = jnp.full((W + T, LANES), NEG, jnp.float32)
        first[:, :] = jnp.ones((1, LANES), jnp.float32)
        # transition weights: row j ↔ distance d = W - j
        d = (W - jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 0)
             ).astype(jnp.float32)
        p = period_ref[0, :][None, :]
        ok = (d >= jnp.round(p * 0.5)) & (d <= 2.0 * p)
        w = -tightness * jnp.log(d / p) ** 2
        txwt[:, :] = jnp.where(ok, w, NEG)

    def step(i, _):
        win = cumbuf[pl.ds(i, W), :]                   # cum[g-W .. g-1]
        cand = win + txwt[:, :]
        best = jnp.max(cand, axis=0)                   # (LANES,)
        k = jnp.argmax(cand, axis=0).astype(jnp.int32)
        has = best > NEG * 0.5
        score_i = ls_ref[i, :]
        cum_i = score_i + jnp.where(has, best, 0.0)
        weak = score_i < thresh_ref[0, :]
        fb = first[0, :] > 0.5
        g = t_idx * T + i
        bl_i = jnp.where(has & ~(fb & weak), g - W + k, -1)
        first[0, :] = jnp.where(fb & (~has | weak), 1.0, 0.0)
        cumbuf[W + i, :] = cum_i
        cum_ref[i, :] = cum_i
        bl_ref[i, :] = bl_i
        return 0

    jax.lax.fori_loop(0, T, step, 0)

    # slide the trailing W rows to the front for the next time tile
    tail = cumbuf[pl.ds(T, W), :]
    cumbuf[pl.ds(0, W), :] = tail


@partial(jax.jit, static_argnames=("tightness", "W", "T"))
def dp_forward(localscore: jnp.ndarray, period: jnp.ndarray,
               weak_thresh: jnp.ndarray, *, tightness: float, W: int,
               T: int = 1024):
    """Forward DP over (L, F) batched onset local-scores.

    Returns ``(cumscore (L, F), backlink (L, F) int32)``.  ``period`` and
    ``weak_thresh`` are per-lane scalars; frames beyond a lane's valid
    range should hold zero localscore (callers mask downstream).
    """
    L, F = localscore.shape
    Lp = -(-L // LANES) * LANES
    Fp = -(-F // T) * T
    ls = jnp.zeros((Lp, Fp), localscore.dtype).at[:L, :F].set(localscore)
    per = jnp.ones(Lp, period.dtype).at[:L].set(period)
    thr = jnp.zeros(Lp, weak_thresh.dtype).at[:L].set(weak_thresh)

    ls_t = ls.T                                        # (Fp, Lp)
    n_lane_blocks = Lp // LANES
    n_time_tiles = Fp // T

    grid = (n_lane_blocks, n_time_tiles)
    kernel = partial(_kernel, W=W, T=T, tightness=tightness)

    cum, bl = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, LANES), lambda lb, tt: (tt, lb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda lb, tt: (0, lb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda lb, tt: (0, lb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, LANES), lambda lb, tt: (tt, lb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LANES), lambda lb, tt: (tt, lb),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Fp, Lp), jnp.float32),
            jax.ShapeDtypeStruct((Fp, Lp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((W + T, LANES), jnp.float32),   # cumbuf
            pltpu.VMEM((W, LANES), jnp.float32),       # txwt
            pltpu.VMEM((1, LANES), jnp.float32),       # first-beat flag
        ],
    )(ls_t, per[None, :], thr[None, :])

    return cum.T[:L, :F], bl.T[:L, :F]
