"""Fused hop-64 mel spectrogram: framing + Cooley–Tukey rfft + |·|² + mel
fold in one Pallas TPU kernel.

Replaces the windowed-DFT matmul pipeline of the global onset mel stage
(``ops/onset.py::mel_power_global`` — the reference's hottest numeric path,
``librosa.onset.onset_strength`` at hop 64, tempo.py:158, SURVEY §3.5).
Measured on a v5e chip at production shape (32 sides × 41 344 frames):
98 ms → 43 ms.  Three wins stack:

* **Arithmetic**: the direct DFT costs 2·N·(N/2+1) ≈ 8.4 MFLOP/frame at
  N = 2048; factoring N = 16·128 with the twiddle folded into the
  second-stage weights cuts it to ~2.7 MFLOP/frame.
* **Memory**: every intermediate (frames, stage-1 output, spectra, mag²)
  lives in VMEM; the jnp-level factored FFT (ops/fft_mxu.py) loses its
  flop advantage to HBM relayouts between matmuls.
* **Framing**: the kernel DMAs the raw signal segment and builds frames
  as row slices in VMEM — no interleave/permutation machinery, no (n,2048)
  frame tensor ever hits HBM.  At hop 64 every frame start is 64·f, so a
  (rows,128) view of the signal plus a 64-sample-shifted twin view make
  even frames (f=2e → row e+a) and odd frames plain row slices.

Math (N = 2048, frame index n = 128·a + b, a∈[0,16), b∈[0,128)):

    G[r, b]   = Σ_a F2[r,a] · w[a,b] · x[a,b]       stage 1 (16-DFT)
    X[16c+r]  = Σ_b G[r,b] · (W[r,b]·F1[b,c])       stage 2 (128-DFT,
                                                     twiddle pre-folded)
    mel[m]    = Σ_{r,c} |X[16c+r]|² · MelP[r][c,m]  mel fold (k>N/2 rows 0)

Stage 2 runs as one (rows,256)@(256,256) bf16 MXU matmul per radix group
(real+imag K-stacked); the mel fold is a single (rows,2048)@(2048,128)
matmul over all groups.  bf16 with f32 accumulation matches the precision class of the
windowed-DFT path this replaces (mel feeds a dB→flux detector where
bf16's ~0.4 % noise is ≈0.03 dB, far below musical onset contrast).

Hardware gotcha (cost a worker crash to learn): DMA destinations with a
row count that is not a multiple of 8 sublanes fault the chip — the seg
scratch is rounded up to 8 rows.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import filters

__all__ = ["mel_power_global_batch", "mel_power_hop512_batch",
           "fft_mel_frames", "supported"]

_N_FFT = 2048
_R = 16          # stage-1 radix (sublanes)
_C = 128         # stage-2 radix (lanes)
_HOP = 64
_CHUNK = 512     # frames per grid step (fused path)
_BLOCK = 256     # frame rows per grid step (frames-API path)


def supported(n_fft: int, hop: int | None = None, n_mels: int = 128) -> bool:
    ok = n_fft == _N_FFT and n_mels <= 128
    if hop is not None:
        ok = ok and hop == _HOP
    return ok


@lru_cache(maxsize=4)
def _consts(sr: int, n_mels: int):
    """numpy constants (NOT jnp — this cache is shared across jit traces).

    F2cat (32,16): [Re;Im] of the 16-point DFT.
    K2 (16,256,128): stage-2 weights with twiddle folded, restricted to the
      non-conjugate half: only bins k = 16c+r with c < 64 (k ≤ 1023) carry
      mel weight — bin 1024's last-triangle weight is exactly 0 and
      k > 1024 mirrors k' = 2048-k — so each group needs just 64 spectral
      columns, and [Re(c<64) | Im(c<64)] packs exactly one 128-lane block:
      P = [G_r | G_i] · K2[r] = [Re(X_{c<64}) | Im(X_{c<64})].  Halves the
      stage-2 and mel-fold MACs vs the full-spectrum form (round-2 left
      this on the table believing 128-lane granularity blocked it).
    MelP2 (1024,128): mel fold — row r·64+c holds mel weights of bin
      k = 16c+r, matching the lane-concatenated |X|² layout.
    w (16,1,128): Hann window over n = 128a+b.
    """
    a = np.arange(_R)
    r = np.arange(_R)
    F2 = np.exp(-2j * np.pi * np.outer(r, a) / _R)
    b = np.arange(_C)
    c = np.arange(_C)
    F1 = np.exp(-2j * np.pi * np.outer(b, c) / _C)
    W = np.exp(-2j * np.pi * np.outer(r, b) / _N_FFT)
    M = W[:, :, None] * F1[None, :, :]                    # (r, b, c)
    Mh_re, Mh_im = M.real[:, :, :_C // 2], M.imag[:, :, :_C // 2]
    K2a = np.concatenate([Mh_re, Mh_im], axis=2)          # (r, 128, 128)
    K2b = np.concatenate([-Mh_im, Mh_re], axis=2)
    K2 = np.concatenate([K2a, K2b], axis=1)               # (r, 256, 128)
    F2cat = np.concatenate([F2.real, F2.imag], axis=0)    # (32, 16)

    mel = filters.mel_filterbank(sr, _N_FFT, n_mels)      # (m, bins)
    melp2 = np.zeros((_R * _C // 2, 128), np.float32)
    for rr in range(_R):
        for cc in range(_C // 2):
            melp2[rr * (_C // 2) + cc, :n_mels] = mel[:, 16 * cc + rr]

    w = filters.hann(_N_FFT).astype(np.float32).reshape(_R, 1, _C)
    return (F2cat.astype(np.float32), K2.astype(np.float32), melp2, w)


def _const_args(sr: int, n_mels: int):
    f2, k2, melp2, w = _consts(sr, n_mels)
    bf = jnp.bfloat16
    return (jnp.asarray(f2, bf), jnp.asarray(k2, bf),
            jnp.asarray(melp2, bf), jnp.asarray(w))


def _const_specs():
    """BlockSpecs for the constant operands (shared by all three kernels)."""
    return [pl.BlockSpec((2 * _R, _R), lambda *ids: (0, 0)),
            pl.BlockSpec((_R, 2 * _C, _C), lambda *ids: (0, 0, 0)),
            pl.BlockSpec((_R * _C // 2, 128), lambda *ids: (0, 0)),
            pl.BlockSpec((_R, 1, _C), lambda *ids: (0, 0, 0))]


def _fft_mel_core(xt, f2_ref, k2_ref, melp2_ref, w_ref):
    """(16, rows, 128) f32 frames → (rows, 128) f32 mel power (in VMEM).

    Stage 2 runs one (rows,256)@(256,128) matmul per radix group
    ([G_r|G_i]·K2[r] → [Re|Im] of the 64 non-conjugate bins); the mel fold
    is a single K=1024 matmul over the lane-concatenated |X|² of all 16
    groups — deep contractions keep the MXU pipeline full, and the
    conjugate-half restriction halves both stages' MACs.
    """
    rows = xt.shape[1]
    bf = jnp.bfloat16
    h = _C // 2
    xw = (xt * w_ref[:]).astype(bf)
    g = jnp.dot(f2_ref[:], xw.reshape(_R, rows * _C),
                preferred_element_type=jnp.float32).astype(bf)
    g = g.reshape(2 * _R, rows, _C)
    mags = []
    for r in range(_R):                       # static unroll: 16 radix groups
        gcat = jnp.concatenate([g[r], g[_R + r]], axis=1)      # (rows, 256)
        p = jnp.dot(gcat, k2_ref[r], preferred_element_type=jnp.float32)
        pr, pi = p[:, :h], p[:, h:]
        mags.append((pr * pr + pi * pi).astype(bf))            # (rows, 64)
    mag_all = jnp.concatenate(mags, axis=1)                    # (rows, 1024)
    return jnp.dot(mag_all, melp2_ref[:],
                   preferred_element_type=jnp.float32)


# ── fused path: signal in, mel out (framing inside the kernel) ─────────────

def _seg_rows(chunk: int) -> int:
    # +R rows of halo for the a-offset, +1 for the odd-frame shifted view;
    # rounded to 8 sublanes (odd DMA row counts fault the chip).
    return -(-(chunk // 2 + _R + 1) // 8) * 8


def _fused_kernel(y_ref, yb_ref, f2_ref, k2_ref, melp2_ref, w_ref,
                  out_ref, seg_ref, segb_ref, sem, semb):
    """Double-buffered: program g waits on the copy program g−1 started for
    it and prefetches program g+1's slabs before computing.  The per-program
    DMA latency (~5 µs × ~2 600 programs ≈ 12 ms/batch at production shape)
    hides behind the FFT matmuls instead of serializing with them."""
    s = pl.program_id(0)
    c = pl.program_id(1)
    n_s = pl.num_programs(0)
    n_c = pl.num_programs(1)
    half = _CHUNK // 2
    hr = seg_ref.shape[1]
    g = s * n_c + c
    slot = jax.lax.rem(g, 2)

    def copies(sl, ss, cc):
        return (pltpu.make_async_copy(y_ref.at[ss, pl.ds(cc * half, hr), :],
                                      seg_ref.at[sl], sem.at[sl]),
                pltpu.make_async_copy(yb_ref.at[ss, pl.ds(cc * half, hr), :],
                                      segb_ref.at[sl], semb.at[sl]))

    @pl.when(g == 0)
    def _():
        for dma in copies(slot, s, c):
            dma.start()

    g1 = g + 1
    @pl.when(g1 < n_s * n_c)
    def _():
        for dma in copies(jax.lax.rem(g1, 2), g1 // n_c,
                          jax.lax.rem(g1, n_c)):
            dma.start()

    for dma in copies(slot, s, c):      # same descriptors → wait on them
        dma.wait()
    seg2 = seg_ref[slot]     # rows of 128 samples; frame 2e+0 @ row e+a
    segb = segb_ref[slot]    # 64-sample-shifted twin;  frame 2e+1 @ row e+a
    evens = jnp.stack([seg2[a:a + half] for a in range(_R)])   # (16,half,128)
    odds = jnp.stack([segb[a:a + half] for a in range(_R)])
    xt = jnp.concatenate([evens, odds], axis=1)                # (16,CHUNK,128)
    out_ref[0] = _fft_mel_core(xt, f2_ref, k2_ref, melp2_ref, w_ref)


@partial(jax.jit, static_argnames=("sr", "n_mels", "n_frames", "interpret"))
def mel_power_global_batch(ys: jnp.ndarray, *, sr: int, n_mels: int,
                           n_frames: int,
                           interpret: bool = False) -> jnp.ndarray:
    """Batched full-signal mel power at hop 64 (centered STFT frames).

    ``ys``: (S, max_samples) float32 → (S, n_frames, n_mels) float32.
    Rows beyond each signal's valid frame count are garbage (callers mask
    with ``onset_frames_valid``), exactly like ``onset.mel_power_global``.
    """
    S = ys.shape[0]
    n_chunks = -(-n_frames // _CHUNK)
    hr = _seg_rows(_CHUNK)
    need = n_chunks * (_CHUNK // 2) + hr
    pad = _N_FFT // 2
    width = need * 128
    ypad = jnp.pad(ys, ((0, 0), (pad, max(0, width + 64 - pad - ys.shape[1]))))
    y2 = ypad[:, :width].reshape(S, need, 128)
    y2b = ypad[:, 64:width + 64].reshape(S, need, 128)

    out = pl.pallas_call(
        _fused_kernel,
        grid=(S, n_chunks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  *_const_specs()],
        out_specs=pl.BlockSpec((1, _CHUNK, 128), lambda s, c: (s, c, 0)),
        out_shape=jax.ShapeDtypeStruct((S, n_chunks * _CHUNK, 128),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, hr, 128), jnp.float32),
                        pltpu.VMEM((2, hr, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(y2, y2b, *_const_args(sr, n_mels))
    # per-chunk grouped [evens | odds] → natural frame order
    half = _CHUNK // 2
    out = out.reshape(S, n_chunks, 2, half, 128).transpose(0, 1, 3, 2, 4)
    return out.reshape(S, n_chunks * _CHUNK, 128)[:, :n_frames, :n_mels]


# ── fused hop-512 path (windowed-tempo global grid) ────────────────────────
#
# At hop 512 every frame start is 4 whole rows of the (rows, 128) signal
# view.  Four row-decimated HBM views (view_q[m] = row 4m + q) turn every
# frame-sample block into a plain contiguous row slice: frame n's block
# a = 4d + q is view_q[n + d] — the same shifted-views trick the hop-64
# kernel uses, generalized from 2 to 4 phases.  Frames come out in natural
# time order (no even/odd regrouping).

_CHUNK5 = 512    # frames per grid step (hop-512 path)


def _seg_rows_h512(chunk: int) -> int:
    # +4 rows of halo for the d-offset (a//4 ∈ [0,4)); rounded to 8 sublanes
    return -(-(chunk + 4) // 8) * 8


def _fused_kernel_h512(y_ref, f2_ref, k2_ref, melp2_ref, w_ref,
                       out_ref, seg_ref, sem):
    s = pl.program_id(0)
    c = pl.program_id(1)
    hr = seg_ref.shape[1]
    for q in range(4):
        pltpu.make_async_copy(y_ref.at[s, q, pl.ds(c * _CHUNK5, hr), :],
                              seg_ref.at[q], sem.at[q]).start()
    for q in range(4):
        pltpu.make_async_copy(y_ref.at[s, q, pl.ds(c * _CHUNK5, hr), :],
                              seg_ref.at[q], sem.at[q]).wait()
    xt = jnp.stack([seg_ref[a % 4, a // 4:a // 4 + _CHUNK5, :]
                    for a in range(_R)])                      # (16,CHUNK,128)
    out_ref[0] = _fft_mel_core(xt, f2_ref, k2_ref, melp2_ref, w_ref)


@partial(jax.jit, static_argnames=("sr", "n_mels", "n_frames", "interpret"))
def mel_power_hop512_batch(ys: jnp.ndarray, *, sr: int, n_mels: int,
                           n_frames: int,
                           interpret: bool = False) -> jnp.ndarray:
    """Batched full-signal mel power at hop 512 (centered STFT frames).

    ``ys``: (S, max_samples) float32 → (S, n_frames, n_mels) float32.
    Serves the windowed-tempo stage's global-grid fast path
    (``models.analyzer._window_acfs``).
    """
    S = ys.shape[0]
    n_chunks = -(-n_frames // _CHUNK5)
    hr = _seg_rows_h512(_CHUNK5)
    need4 = n_chunks * _CHUNK5 + hr
    pad = _N_FFT // 2
    width = need4 * 4 * 128
    ypad = jnp.pad(ys, ((0, 0), (pad, max(0, width - pad - ys.shape[1]))))
    # four phase-decimated row views: yq[s, q, m] = rows 4m+q of the
    # (need4*4, 128) signal view
    yq = ypad[:, :width].reshape(S, need4, 4, 128).transpose(0, 2, 1, 3)

    out = pl.pallas_call(
        _fused_kernel_h512,
        grid=(S, n_chunks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  *_const_specs()],
        out_specs=pl.BlockSpec((1, _CHUNK5, 128), lambda s, c: (s, c, 0)),
        out_shape=jax.ShapeDtypeStruct((S, n_chunks * _CHUNK5, 128),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, hr, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((4,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(yq, *_const_args(sr, n_mels))
    return out[:, :n_frames, :n_mels]


# ── frames API (pre-framed input; used by tests and the windowed path) ─────

def _frames_kernel(x_ref, f2_ref, k2_ref, melp2_ref, w_ref, out_ref):
    xt = jnp.transpose(x_ref[:], (1, 0, 2)).astype(jnp.float32)
    out_ref[:] = _fft_mel_core(xt, f2_ref, k2_ref, melp2_ref, w_ref)


@partial(jax.jit, static_argnames=("sr", "n_mels", "interpret"))
def fft_mel_frames(frames: jnp.ndarray, *, sr: int, n_mels: int,
                   interpret: bool = False) -> jnp.ndarray:
    """Mel power of raw (unwindowed) STFT frames.

    ``frames``: (..., n, 2048) float32 → (..., n, n_mels) float32.
    The Hann window is applied inside the kernel.
    """
    assert frames.shape[-1] == _N_FFT, frames.shape
    lead = frames.shape[:-1]
    n_rows = int(np.prod(lead)) if lead else 1
    pad_rows = (-n_rows) % _BLOCK
    x = frames.reshape(n_rows, _N_FFT)
    if pad_rows:
        x = jnp.pad(x, ((0, pad_rows), (0, 0)))
    total = n_rows + pad_rows
    x3 = x.reshape(total, _R, _C)

    out = pl.pallas_call(
        _frames_kernel,
        grid=(total // _BLOCK,),
        in_specs=[pl.BlockSpec((_BLOCK, _R, _C), lambda i: (i, 0, 0)),
                  *_const_specs()],
        out_specs=pl.BlockSpec((_BLOCK, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((total, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x3, *_const_args(sr, n_mels))
    return out[:n_rows, :n_mels].reshape(lead + (n_mels,))
