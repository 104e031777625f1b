"""Fused per-chunk chroma: framing + dual-stream CQT matmuls + per-bin
noise-floor subtraction + chroma fold + per-frame normalize + masked
frame-sum in one Pallas TPU kernel.

Replaces the ``lax.scan`` tile loop of ``ops/chroma.chunk_chroma_means``:
profiling the corpus program (round 3) showed that loop at 167 ms of a
755 ms batch — 22 %, the single largest item — almost entirely HBM traffic
on the materialized (rows, 4096) frame tensors and their relayouts, not
MXU work.  Here each chunk's frames exist only in VMEM:

* the high stream (hop 512 = 4 rows of the (rows, 128) signal view) builds
  frames from four phase-decimated row views — every frame-sample block is
  a plain row slice (the hop-64 mel kernel's shifted-views trick);
* the low stream (4×-decimated signal, hop 128 = exactly 1 row) builds
  frames from directly shifted row slices;
* CQT magnitudes are bf16 MXU matmuls per stream against the window-folded
  time-domain kernels (``filters.cqt_time_kernels``), zero-padded to full
  lane blocks (padding columns produce √1e-30 ≈ 0 magnitudes), accumulated
  into per-chunk VMEM scratch;
* round 4: the grid is per CHUNK (all of a 20 s chunk's frame tiles in one
  kernel instance) so the per-bin noise floor — the masked median
  magnitude over the chunk's valid frames, found by 16 bisection passes —
  can be subtracted before the fold (``config.chroma_floor_sub``; the
  floor must be chunk-scoped: 6 s tile medians eat signal — see
  config.py).  The same bisection runs in the scan fallback
  (``chroma._masked_bin_floor``) so both paths agree bit-for-bit-ish;
* the chroma fold over octaves is ANOTHER matmul per stream (0/1 fold
  matrices — no lane-granular reshapes or concats), then the per-frame
  max-normalize and the frame-validity-masked sum, so the kernel emits one
  (bpo,) sum per chunk instead of a (rows, 4096) round trip to HBM.

Frames come out in natural time order (no interleave permutation), and the
chunk output equals what ``chunk_chroma_means``'s scan path produces, so
the caller's chunk reduction is unchanged.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["supported", "chroma_chunk_sums"]

_N_FFT = 4096
_HOP_HI = 512
_LANES = 128
_FLOOR_ITERS = 16


def supported(n_fft: int, hop: int, fchunk: int) -> bool:
    return (n_fft == _N_FFT and hop == _HOP_HI
            and fchunk % 8 == 0 and fchunk >= 8)


@lru_cache(maxsize=8)
def _fold_matrix(n_rows: int, n_bins: int, bpo: int, bpo_pad: int):
    """(n_rows, bpo_pad) 0/1 fold: bin k (< n_bins) adds to class k % bpo;
    padding rows/columns are zero."""
    f = np.zeros((n_rows, bpo_pad), np.float32)
    for k in range(n_bins):
        f[k, k % bpo] = 1.0
    return f


def _make_kernel(fchunk: int, n_fchunks: int, bpo: int, floor_sub: bool,
                 floor_scale: float, floor_scale_noisy: float,
                 n_hi: int, n_lo: int):
    n_blocks = _N_FFT // _LANES
    F = n_fchunks * fchunk
    two_fold = floor_sub and floor_scale_noisy != floor_scale

    def kernel(fv_ref, hi_ref, lo_ref, khi_re_ref, khi_im_ref,
               klo_re_ref, klo_im_ref, fold_hi_ref, fold_lo_ref, out_ref,
               mag_hi_ref, mag_lo_ref):
        bf = jnp.bfloat16

        def mags_tile(slice_a, kre_ref, kim_ref):
            # accumulate over the 32 frame-sample lane blocks — each block
            # is a plain row slice, no (fchunk, 4096) concat materializes
            re = im = 0.0
            for a in range(n_blocks):
                fr_a = slice_a(a).astype(bf)            # (fchunk, 128)
                ka = jax.lax.slice_in_dim(kre_ref[:], a * _LANES,
                                          (a + 1) * _LANES, axis=0)
                kb = jax.lax.slice_in_dim(kim_ref[:], a * _LANES,
                                          (a + 1) * _LANES, axis=0)
                re = re + jnp.dot(fr_a, ka,
                                  preferred_element_type=jnp.float32)
                im = im + jnp.dot(fr_a, kb,
                                  preferred_element_type=jnp.float32)
            return jnp.sqrt(re * re + im * im + 1e-30)

        # ── all the chunk's tiles → magnitude scratch (F, bins) ────────────
        for fc in range(n_fchunks):
            mag_lo_ref[fc * fchunk:(fc + 1) * fchunk, :] = mags_tile(
                lambda a: lo_ref[0, fc, a: a + fchunk, :],
                klo_re_ref, klo_im_ref)
            mag_hi_ref[fc * fchunk:(fc + 1) * fchunk, :] = mags_tile(
                lambda a: hi_ref[0, fc * 4 + a % 4,
                                 a // 4: a // 4 + fchunk, :],
                khi_re_ref, khi_im_ref)

        nv = fv_ref[0, 0, 0]                            # valid frames, f32
        nv_i = nv.astype(jnp.int32)
        valid_col = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0) < nv_i

        def floor_and_top(mag, n_real):
            # masked lower-median per bin via bisection (chunk-scoped
            # noise-floor estimate; see config.chroma_floor_sub), plus the
            # real-bin floor/peak sums feeding the noise proxy
            valid = jnp.broadcast_to(valid_col, mag.shape)
            top = jnp.max(jnp.where(valid, mag, 0.0), axis=0, keepdims=True)
            lo_b = jnp.zeros_like(top)
            hi_b = top
            half = jnp.floor((nv + 1.0) * 0.5)
            for _ in range(_FLOOR_ITERS):
                mid = 0.5 * (lo_b + hi_b)
                cnt = jnp.sum(jnp.where(valid & (mag <= mid), 1.0, 0.0),
                              axis=0, keepdims=True)
                ge = cnt >= half
                hi_b = jnp.where(ge, mid, hi_b)
                lo_b = jnp.where(ge, lo_b, mid)
            flr = 0.5 * (lo_b + hi_b)
            real = jax.lax.broadcasted_iota(jnp.int32, flr.shape, 1) < n_real
            fsum = jnp.sum(jnp.where(real, flr, 0.0))
            tsum = jnp.sum(jnp.where(real, top, 0.0))
            return flr, fsum, tsum

        mag_lo = mag_lo_ref[:]
        mag_hi = mag_hi_ref[:]

        def fold_norm_sum(lo_m, hi_m):
            ch = (jnp.dot(lo_m.astype(bf), fold_lo_ref[:],
                          preferred_element_type=jnp.float32) +
                  jnp.dot(hi_m.astype(bf), fold_hi_ref[:],
                          preferred_element_type=jnp.float32))
            lane = jax.lax.broadcasted_iota(jnp.int32, ch.shape, 1)
            peak = jnp.max(jnp.where(lane < bpo, ch, -jnp.inf),
                           axis=-1, keepdims=True)
            ch = jnp.where((peak > 1e-12) & (lane < bpo),
                           ch / jnp.maximum(peak, 1e-12), 0.0)
            row = jax.lax.broadcasted_iota(jnp.int32, ch.shape, 0)
            return jnp.sum(jnp.where(row < nv_i, ch, 0.0), axis=0)

        if floor_sub:
            flr_lo, fs_lo, ts_lo = floor_and_top(mag_lo, n_lo)
            flr_hi, fs_hi, ts_hi = floor_and_top(mag_hi, n_hi)
            # noise proxy: energy-weighted median-floor-to-peak ratio over
            # the chunk's real CQT bins (broadband noise lifts every bin's
            # 20 s median toward its peak; sparse musical content doesn't)
            proxy = (fs_lo + fs_hi) / jnp.maximum(ts_lo + ts_hi, 1e-20)
            # floor spectral flatness (gm/am over real bins): broadband
            # noise floors every bin (~0.93), sustained TONAL content
            # floors only its harmonics (~0.05 drone, ~0.20 clean music) —
            # the second gate that keeps drones off the strong floor
            n_bins = float(n_lo + n_hi)
            am = (fs_lo + fs_hi) / n_bins
            eps_f = 1e-9 * am + 1e-30

            def logsum(flr, n_real):
                real = jax.lax.broadcasted_iota(jnp.int32, flr.shape, 1) \
                    < n_real
                return jnp.sum(jnp.where(real, jnp.log(flr + eps_f), 0.0))

            flat = (jnp.exp((logsum(flr_lo, n_lo) + logsum(flr_hi, n_hi))
                            / n_bins) / jnp.maximum(am, 1e-30))
            sub = lambda m, f, s: jnp.maximum(m - s * f, 0.0)  # noqa: E731
            sums = fold_norm_sum(sub(mag_lo, flr_lo, floor_scale),
                                 sub(mag_hi, flr_hi, floor_scale))
            sums_b = (fold_norm_sum(sub(mag_lo, flr_lo, floor_scale_noisy),
                                    sub(mag_hi, flr_hi, floor_scale_noisy))
                      if two_fold else sums)
        else:
            sums = sums_b = fold_norm_sum(mag_lo, mag_hi)
            proxy = jnp.zeros(())
            flat = jnp.zeros(())

        # output rows: 0 = base-scale sums, 1 = noisy-scale sums,
        # 2 = noise proxy, 3 = floor flatness
        row8 = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape[1:], 0)
        out_ref[0] = jnp.where(
            row8 == 0, sums[None, :],
            jnp.where(row8 == 1, sums_b[None, :],
                      jnp.where(row8 == 2, proxy, flat)))

    return kernel


@partial(jax.jit, static_argnames=("fchunk", "n_fchunks", "n_lo", "n_hi",
                                   "bpo", "floor_sub", "floor_scale",
                                   "floor_scale_noisy", "interpret"))
def chroma_chunk_sums(chunks_hi4: jnp.ndarray, chunks_lo: jnp.ndarray,
                      chunk_fvalid: jnp.ndarray,
                      khi: tuple, klo: tuple, *,
                      fchunk: int, n_fchunks: int, n_lo: int, n_hi: int,
                      bpo: int, floor_sub: bool = True,
                      floor_scale: float = 1.0,
                      floor_scale_noisy: float = 1.0,
                      interpret: bool = False):
    """Per-chunk masked chroma sums (+ alternate floor scale + noise proxy).

    ``chunks_hi4``: (C, n_fchunks·4, rows_hi, 128) 4-phase row views of each
    tile's native-rate samples (tile fc, phase q at index fc·4+q; phase q
    holds rows 4m+q of the tile's (rows, 128) view); ``chunks_lo``:
    (C, n_fchunks, rows_lo, 128) rows of the 4×-decimated stream;
    ``chunk_fvalid``: (C,) valid frame counts per chunk; ``khi``/``klo``:
    (k_re, k_im) window-folded time-domain CQT kernels, shapes
    (4096, n_hi) / (4096, n_lo).

    Returns ``(sums, sums_noisy, proxy, flatness)``: (C, bpo) chroma sums
    over valid frames at ``floor_scale`` (per-bin floor subtracted when
    ``floor_sub``, max-normalized per frame, equal to the scan-path output
    of ``chunk_chroma_means``); the same at ``floor_scale_noisy`` (aliases
    ``sums`` when the scales are equal — the second fold is compiled out);
    the (C,) per-chunk noise proxy (real-bin Σfloor/Σpeak); and the (C,)
    floor spectral flatness (gm/am over real bins — separates broadband
    noise from sustained tonal content).  The last two are 0 without
    ``floor_sub``; together they drive the auto scale selection.
    """
    C = chunks_hi4.shape[0]
    rows_hi = chunks_hi4.shape[2]
    rows_lo = chunks_lo.shape[2]
    F = n_fchunks * fchunk
    bf = jnp.bfloat16

    def padk(k, n):
        n_pad = -(-n // _LANES) * _LANES
        return jnp.pad(jnp.asarray(k, bf), ((0, 0), (0, n_pad - n)))

    khi_re, khi_im = (padk(k, n_hi) for k in khi)
    klo_re, klo_im = (padk(k, n_lo) for k in klo)
    bpo_pad = -(-bpo // _LANES) * _LANES
    nhi_pad = khi_re.shape[1]
    nlo_pad = klo_re.shape[1]
    fold_hi = jnp.asarray(_fold_matrix(nhi_pad, n_hi, bpo, bpo_pad), bf)
    fold_lo = jnp.asarray(_fold_matrix(nlo_pad, n_lo, bpo, bpo_pad), bf)

    out = pl.pallas_call(
        _make_kernel(fchunk, n_fchunks, bpo, floor_sub, floor_scale,
                     floor_scale_noisy, n_hi, n_lo),
        grid=(C,),
        in_specs=[pl.BlockSpec((1, 8, _LANES), lambda c: (c, 0, 0)),
                  pl.BlockSpec((1, n_fchunks * 4, rows_hi, _LANES),
                               lambda c: (c, 0, 0, 0)),
                  pl.BlockSpec((1, n_fchunks, rows_lo, _LANES),
                               lambda c: (c, 0, 0, 0)),
                  pl.BlockSpec((_N_FFT, nhi_pad), lambda c: (0, 0)),
                  pl.BlockSpec((_N_FFT, nhi_pad), lambda c: (0, 0)),
                  pl.BlockSpec((_N_FFT, nlo_pad), lambda c: (0, 0)),
                  pl.BlockSpec((_N_FFT, nlo_pad), lambda c: (0, 0)),
                  pl.BlockSpec((nhi_pad, bpo_pad), lambda c: (0, 0)),
                  pl.BlockSpec((nlo_pad, bpo_pad), lambda c: (0, 0)),
                  ],
        out_specs=pl.BlockSpec((1, 8, bpo_pad), lambda c: (c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, 8, bpo_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((F, nhi_pad), jnp.float32),
                        pltpu.VMEM((F, nlo_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.broadcast_to(
          chunk_fvalid.astype(jnp.float32)[:, None, None], (C, 8, _LANES)),
      chunks_hi4, chunks_lo,
      khi_re, khi_im, klo_re, klo_im, fold_hi, fold_lo)
    return out[:, 0, :bpo], out[:, 1, :bpo], out[:, 2, 0], out[:, 3, 0]
