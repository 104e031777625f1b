"""Fused strided mean-ACF tempogram as one Pallas TPU kernel (f32).

The hop-64 IBI tempogram aggregates, over ~2 600 columns per side, the
lag-0-normalized autocorrelation of a 2 756-frame Hann-windowed slice of
the onset envelope (librosa ``ac_size`` window; lags kept to 1 024).  At
jnp level this pipeline — framing, rfft(4096), |·|², cosine fold — moves
multi-GB of lane-padded intermediates through HBM (the factored rfft's
(…, 128, 32) stages physically pad 32→128 lanes) and measured 78–81 ms
per 16-pair batch.  The kernel keeps every stage in VMEM (~25 ms).

Math (f32 throughout — the ACF argmax decides near-tied harmonic peaks,
bf16's ~0.4 % noise flips tempo octaves; f32 matmul in Mosaic is exact):

  forward, n = 128·a + b (a sublane-rows, b lanes), N = 4096:
      G[r, b]    = Σ_a F2[r,a]·w[a,b]·x[a,b]          32-point DFT
      X[32c + r] = Σ_b (G·W)[r,b]·F1[b,c]             128-point DFT
  inverse cosine fold, lag l = 128·p + q:
      M1[r, q] = Σ_c |X|²[r,c]·cos(2πcq/128)          (M2 with sin)
      U1[r, q] = cosφ·M1 − sinφ·M2,  φ = 2πrq/4096    (U2 mirrored)
      ac[l]    = (1/N)·Σ_r cos(2πrp/32)·U1[r,q] − sin(2πrp/32)·U2[r,q]

Framing: column t starts at envp[16t]; with eight 16-sample-shifted
(rows, 128) views of the padded envelope, column t = 8q′ + j is rows
[q′ .. q′+22] of view j — DMA one row-slab per program, stack 23 row
slices, zero tail handled by contracting stage 1 over 23 rows only.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import filters

__all__ = ["mean_acf_batch", "supported"]

_NFFT = 4096
_R = 32            # stage-1 radix (k mod 32)
_C = 128           # stage-2 radix / lanes
_ROWS = 23         # ceil(win_pad / 128) data rows per frame
_STRIDE = 16
_MAXLAG = 1024
_P = _MAXLAG // _C  # 8 lag blocks
_Q = 128           # q-rows (columns of the tempogram) per program


def supported(win_length: int, stride: int, max_lag: int) -> bool:
    return (stride == _STRIDE and max_lag == _MAXLAG
            and win_length <= _ROWS * _C and win_length > (_ROWS - 2) * _C)


@lru_cache(maxsize=2)
def _consts(win_length: int):
    a = np.arange(_R)
    r = np.arange(_R)
    F2 = np.exp(-2j * np.pi * np.outer(r, a) / _R)        # (r, a)
    F2cat = np.concatenate([F2.real[:, :_ROWS], F2.imag[:, :_ROWS]], axis=0)
    b = np.arange(_C)
    W = np.exp(-2j * np.pi * np.outer(r, b) / _NFFT)      # (r, b)
    c = np.arange(_C)
    F1 = np.exp(-2j * np.pi * np.outer(b, c) / _C)        # (b, c)
    q = np.arange(_C)
    COSQ = np.cos(2 * np.pi * np.outer(c, q) / _C)        # (c, q)
    SINQ = np.sin(2 * np.pi * np.outer(c, q) / _C)
    PHI = 2 * np.pi * np.outer(r, q) / _NFFT              # (r, q)
    p = np.arange(_P)
    ALPHA = 2 * np.pi * np.outer(p, r) / _R               # (p, r)
    w = np.zeros(_ROWS * _C, np.float32)
    w[:win_length] = filters.hann(win_length)
    f32 = np.float32
    return (F2cat.astype(f32),
            W.real.astype(f32).reshape(_R, 1, _C),
            W.imag.astype(f32).reshape(_R, 1, _C),
            F1.real.astype(f32), F1.imag.astype(f32),
            COSQ.astype(f32), SINQ.astype(f32),
            np.cos(PHI).astype(f32).reshape(_R, 1, _C),
            np.sin(PHI).astype(f32).reshape(_R, 1, _C),
            np.cos(ALPHA).astype(f32), np.sin(ALPHA).astype(f32),
            w.reshape(_ROWS, 1, _C))


_PREC = jax.lax.Precision.HIGHEST


def _kernel(views_ref, nused_ref, f2_ref, wr_ref, wi_ref, f1r_ref, f1i_ref,
            cosq_ref, sinq_ref, cphi_ref, sphi_ref, cosa_ref, sina_ref,
            win_ref, out_ref, seg_ref, sem):
    s = pl.program_id(0)
    j = pl.program_id(1)
    qb = pl.program_id(2)
    n_s = pl.num_programs(0)
    n_qb = pl.num_programs(2)
    f32 = jnp.float32

    # double-buffered DMA: program g waits on the slab g−1 prefetched and
    # starts g+1's copy before computing (same protocol as the mel kernel)
    hr = seg_ref.shape[1]
    g = (s * 8 + j) * n_qb + qb
    slot = jax.lax.rem(g, 2)

    def copy(sl, ss, jj, qq):
        return pltpu.make_async_copy(
            views_ref.at[ss, jj, pl.ds(qq * _Q, hr), :],
            seg_ref.at[sl], sem.at[sl])

    @pl.when(g == 0)
    def _():
        copy(slot, s, j, qb).start()

    g1 = g + 1
    @pl.when(g1 < n_s * 8 * n_qb)
    def _():
        copy(jax.lax.rem(g1, 2), g1 // (8 * n_qb),
             jax.lax.rem(g1 // n_qb, 8), jax.lax.rem(g1, n_qb)).start()

    copy(slot, s, j, qb).wait()

    seg = seg_ref[slot]                                   # (Q+24, 128)
    xw = jnp.stack([seg[a:a + _Q] for a in range(_ROWS)]) * win_ref[:]
    g = jnp.dot(f2_ref[:], xw.reshape(_ROWS, _Q * _C),
                preferred_element_type=f32, precision=_PREC).reshape(2 * _R, _Q, _C)
    gr, gi = g[:_R], g[_R:]
    hr_ = gr * wr_ref[:] - gi * wi_ref[:]                 # twiddle
    hi_ = gr * wi_ref[:] + gi * wr_ref[:]

    u1 = []
    u2 = []
    for r in range(_R):                                   # static unroll
        xr = (jnp.dot(hr_[r], f1r_ref[:], preferred_element_type=f32, precision=_PREC)
              - jnp.dot(hi_[r], f1i_ref[:], preferred_element_type=f32, precision=_PREC))
        xi = (jnp.dot(hr_[r], f1i_ref[:], preferred_element_type=f32, precision=_PREC)
              + jnp.dot(hi_[r], f1r_ref[:], preferred_element_type=f32, precision=_PREC))
        mag2 = xr * xr + xi * xi                          # (Q, 128c)
        m1 = jnp.dot(mag2, cosq_ref[:], preferred_element_type=f32, precision=_PREC)
        m2 = jnp.dot(mag2, sinq_ref[:], preferred_element_type=f32, precision=_PREC)
        u1.append(cphi_ref[r] * m1 - sphi_ref[r] * m2)    # (Q, 128q)
        u2.append(sphi_ref[r] * m1 + cphi_ref[r] * m2)
    U1 = jnp.stack(u1).reshape(_R, _Q * _C)
    U2 = jnp.stack(u2).reshape(_R, _Q * _C)
    ac = (jnp.dot(cosa_ref[:], U1, preferred_element_type=f32, precision=_PREC)
          - jnp.dot(sina_ref[:], U2, preferred_element_type=f32, precision=_PREC))
    ac = ac.reshape(_P, _Q, _C) * (1.0 / _NFFT)           # (p, Qcols, q)

    ac0 = ac[0, :, 0:1]                                   # lag 0 per column
    norm = jnp.where(ac0 > 1e-20, 1.0 / jnp.maximum(ac0, 1e-20), 0.0)
    # column index t = 8·(qb·Q + ql) + j ; valid iff t < n_used
    ql = jax.lax.broadcasted_iota(jnp.int32, (_Q, 1), 0)
    t = 8 * (qb * _Q + ql) + j
    m = (t < nused_ref[s, 0]).astype(f32)
    out_ref[0, 0, 0] = jnp.sum(ac * (norm * m)[None], axis=1)  # (p=8, 128)


@partial(jax.jit, static_argnames=("win_length", "n_frames"))
def mean_acf_batch(env: jnp.ndarray, n_used: jnp.ndarray, *,
                   win_length: int, n_frames: int) -> jnp.ndarray:
    """Batched strided mean-ACF: (S, frames) envelopes → (S, 1024) columns.

    ``n_used``: (S,) number of valid tempogram columns per side (the
    caller's ceil(n_valid/stride)); the result is already divided by it.
    """
    S = env.shape[0]
    half = win_length // 2
    n_cols = -(-n_frames // _STRIDE)
    qmax = -(-(-(-n_cols // 8)) // _Q) * _Q               # q rows, padded
    n_qb = qmax // _Q
    hr = _Q + 24                                          # +22 halo, 8-align
    width = (n_qb * _Q + hr) * _C
    envp = jnp.pad(env, ((0, 0), (half, max(0, width + 16 * 8 - half
                                            - env.shape[1]))))
    views = jnp.stack([envp[:, 16 * j: 16 * j + width].reshape(S, -1, _C)
                       for j in range(8)], axis=1)        # (S, 8, rows, 128)

    consts = [jnp.asarray(x) for x in _consts(win_length)]
    nused2 = n_used.reshape(S, 1).astype(jnp.int32)

    partial_sums = pl.pallas_call(
        _kernel,
        grid=(S, 8, n_qb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((2 * _R, _ROWS), lambda s, j, q: (0, 0)),
                  pl.BlockSpec((_R, 1, _C), lambda s, j, q: (0, 0, 0)),
                  pl.BlockSpec((_R, 1, _C), lambda s, j, q: (0, 0, 0)),
                  pl.BlockSpec((_C, _C), lambda s, j, q: (0, 0)),
                  pl.BlockSpec((_C, _C), lambda s, j, q: (0, 0)),
                  pl.BlockSpec((_C, _C), lambda s, j, q: (0, 0)),
                  pl.BlockSpec((_C, _C), lambda s, j, q: (0, 0)),
                  pl.BlockSpec((_R, 1, _C), lambda s, j, q: (0, 0, 0)),
                  pl.BlockSpec((_R, 1, _C), lambda s, j, q: (0, 0, 0)),
                  pl.BlockSpec((_P, _R), lambda s, j, q: (0, 0)),
                  pl.BlockSpec((_P, _R), lambda s, j, q: (0, 0)),
                  pl.BlockSpec((_ROWS, 1, _C), lambda s, j, q: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, 1, _P, _C),
                               lambda s, j, q: (s, j, q, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((S, 8, n_qb, _P, _C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, hr, _C), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )(views, nused2, *consts)

    acc = jnp.sum(partial_sums, axis=(1, 2))              # (S, P, C)
    denom = jnp.maximum(n_used.astype(jnp.float32), 1.0)[:, None, None]
    return (acc / denom).reshape(S, _MAXLAG)
