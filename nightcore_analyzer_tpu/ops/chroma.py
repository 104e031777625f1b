"""CQT chroma and cyclic cross-correlation pitch-shift detection.

TPU-native rebuild of the reference pitch path (``pitch.py:55-95``):
time-averaged 36-bin/octave CQT chroma per 20 s chunk, then a cyclic
cross-correlation over all 36 lags whose argmax rotation is the pitch shift
in 1/3-semitone bins.

Instead of librosa's recursive multi-rate CQT, the constant-Q transform is a
*dense complex matmul* against precomputed frequency-domain kernels
(``ops/filters.cqt_kernels``) — the MXU-friendly formulation — fed by two
STFT streams:

* **high stream**: native 22 050 Hz, n_fft 4096, hop 512 → octaves C4..B7;
* **low stream**: 4×-decimated signal, n_fft 4096, hop 128 → octaves C1..B3
  (full constant-Q bandwidth down to C2; the bottom octave is Q-truncated,
  which only widens — never moves — its chroma contribution).

The per-chunk output is the time-mean of per-frame inf-normalized chroma,
matching ``librosa.feature.chroma_cqt(norm=inf).mean(axis=1)``
(``pitch.py:55-64``).  The testable contract is the integer lag of the
cyclic-xcorr peak (SURVEY §7 hard-part #3).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AnalyzerConfig
from . import filters
from .spectrum import frame_interleaved, interleave_params

__all__ = ["chunk_chroma_means", "cyclic_xcorr_lag"]


def _masked_bin_floor(mag: jnp.ndarray, valid_col: jnp.ndarray,
                      n_valid: jnp.ndarray, n_iter: int = 16) -> jnp.ndarray:
    """Per-bin masked lower-median magnitude via bisection — the chunk's
    stationary-noise floor (``config.chroma_floor_sub``).  ``mag``:
    (F, bins) ≥ 0; ``valid_col``: (F, 1) bool; ``n_valid``: scalar count.
    EXACTLY the arithmetic of the Pallas kernel's in-VMEM floor
    (``pallas/chromacq.py``) so both paths agree to float rounding."""
    valid = jnp.broadcast_to(valid_col, mag.shape)
    top = jnp.max(jnp.where(valid, mag, 0.0), axis=0, keepdims=True)
    lo_b = jnp.zeros_like(top)
    hi_b = top
    half = jnp.floor((n_valid.astype(jnp.float32) + 1.0) * 0.5)
    for _ in range(n_iter):
        mid = 0.5 * (lo_b + hi_b)
        cnt = jnp.sum(jnp.where(valid & (mag <= mid), 1.0, 0.0),
                      axis=0, keepdims=True)
        ge = cnt >= half
        hi_b = jnp.where(ge, mid, hi_b)
        lo_b = jnp.where(ge, lo_b, mid)
    return 0.5 * (lo_b + hi_b)


@lru_cache(maxsize=4)
def _bases(cfg: AnalyzerConfig):
    bpo = cfg.chroma_bins_per_octave
    n_low = cfg.chroma_low_octaves * bpo
    n_high = (cfg.chroma_n_octaves - cfg.chroma_low_octaves) * bpo
    f_low0 = cfg.chroma_fmin
    f_high0 = cfg.chroma_fmin * 2.0 ** cfg.chroma_low_octaves
    lo_re, lo_im = filters.cqt_kernels(cfg.sample_rate / 4.0, cfg.chroma_n_fft,
                                       f_low0, n_low, bpo)
    hi_re, hi_im = filters.cqt_kernels(float(cfg.sample_rate), cfg.chroma_n_fft,
                                       f_high0, n_high, bpo)
    return (lo_re.T, lo_im.T), (hi_re.T, hi_im.T)     # (n_rfft, bins)


@lru_cache(maxsize=4)
def _time_bases(cfg: AnalyzerConfig):
    """Time-domain CQT kernels (frame hann folded in): the DFT and the
    spectral-kernel matmul fused into a single MXU matmul per stream."""
    bpo = cfg.chroma_bins_per_octave
    n_low = cfg.chroma_low_octaves * bpo
    n_high = (cfg.chroma_n_octaves - cfg.chroma_low_octaves) * bpo
    w = filters.hann(cfg.chroma_n_fft)
    lo = filters.cqt_time_kernels(cfg.sample_rate / 4.0, cfg.chroma_n_fft,
                                  cfg.chroma_fmin, n_low, bpo, frame_window=w)
    hi = filters.cqt_time_kernels(
        float(cfg.sample_rate), cfg.chroma_n_fft,
        cfg.chroma_fmin * 2.0 ** cfg.chroma_low_octaves, n_high, bpo,
        frame_window=w)
    return lo, hi                                     # each (n_fft, bins)


def _cqt_mag_time(frames: jnp.ndarray, basis) -> jnp.ndarray:
    """|frames @ (K_re + i·K_im)| — fused windowed-DFT×CQT, bf16 MXU."""
    k_re, k_im = basis
    bf = jnp.bfloat16
    fr = frames.astype(bf)
    re = jnp.matmul(fr, jnp.asarray(k_re).astype(bf),
                    preferred_element_type=jnp.float32)
    im = jnp.matmul(fr, jnp.asarray(k_im).astype(bf),
                    preferred_element_type=jnp.float32)
    return jnp.sqrt(re * re + im * im + 1e-30)


def _cqt_mag(spec: jnp.ndarray, basis) -> jnp.ndarray:
    """|spec @ conj-kernelᵀ| for complex rfft frames.  (…, n_rfft) → (…, bins)."""
    # bf16 MXU matmuls with f32 accumulation — the output only feeds a
    # per-frame max-normalize + 36-lag argmax, far coarser than bf16 noise
    k_re, k_im = basis
    bf = jnp.bfloat16
    xr = jnp.real(spec).astype(bf)
    xi = jnp.imag(spec).astype(bf)
    re = jnp.matmul(xr, k_re.astype(bf), preferred_element_type=jnp.float32) - \
        jnp.matmul(xi, k_im.astype(bf), preferred_element_type=jnp.float32)
    im = jnp.matmul(xr, k_im.astype(bf), preferred_element_type=jnp.float32) + \
        jnp.matmul(xi, k_re.astype(bf), preferred_element_type=jnp.float32)
    return jnp.sqrt(re * re + im * im + 1e-30)


def chunk_chroma_means(y: jnp.ndarray, y4: jnp.ndarray, n_samples: jnp.ndarray,
                       cfg: AnalyzerConfig, *, with_proxy: bool = False):
    """Time-averaged chroma per 20 s chunk slot.

    ``y``: (max_samples,) signal; ``y4``: 4×-decimated signal; ``n_samples``:
    valid length of ``y``.  Returns (max_chunks, n_chroma) chroma means —
    slot ``c`` covers samples ``[c*chunk_samples, (c+1)*chunk_samples)``
    clipped to the valid length (slots entirely past the end return zeros;
    slot 0 of a shorter-than-chunk file is the whole file, mirroring the
    reference's whole-file fallback, ``pitch.py:121-127``).

    The per-bin noise floor (``cfg.chroma_floor_sub``) is subtracted at a
    strength auto-selected per file from the in-kernel noise proxy (see
    ``config.chroma_floor_auto``); ``with_proxy=True`` additionally returns
    the file-level proxy scalar (measurement/observability — the sweep's
    threshold calibration uses it).
    """
    bpo = cfg.chroma_bins_per_octave
    n_fft = cfg.chroma_n_fft
    (lo_basis, hi_basis) = _bases(cfg)
    lo_basis = tuple(jnp.asarray(b) for b in lo_basis)
    hi_basis = tuple(jnp.asarray(b) for b in hi_basis)
    window = jnp.asarray(filters.hann(n_fft))

    f_per_chunk = cfg.chroma_frames_per_chunk
    hop_hi, hop_lo = cfg.chroma_hop, cfg.chroma_hop // 4
    pad = n_fft // 2
    fchunk = cfg.chroma_frame_chunk
    n_fchunks = -(-f_per_chunk // fchunk)

    def _padded(sig, hop, n_sig):
        # largest static tile start + slice span must stay in bounds
        chunk_step = cfg.chunk_samples if hop == hop_hi else cfg.chunk_samples // 4
        max_end = ((cfg.max_chunks - 1) * chunk_step
                   + (n_fchunks - 1) * fchunk * hop
                   + fchunk * hop + 2 * n_fft)
        tail = max(0, max_end - n_sig) + pad
        return jnp.pad(sig, (pad, tail))

    ypad = _padded(y, hop_hi, y.shape[-1])
    y4pad = _padded(y4, hop_lo, y4.shape[-1])
    _, _, _, perm_hi = interleave_params(fchunk, n_fft, hop_hi)
    _, _, _, perm_lo = interleave_params(fchunk, n_fft, hop_lo)
    perm_hi = jnp.asarray(perm_hi)
    perm_lo = jnp.asarray(perm_lo)

    # Tile starts are compile-time constants (slot c begins at
    # c*chunk_samples), so each tile's samples are extracted with *static*
    # slices (no dynamic gathers) and stacked; the compute then streams
    # through a lax.scan over the tile axis, which also sequences the FFT
    # temporaries (a fully unrolled version lets XLA schedule every tile's
    # buffers concurrently and OOMs at corpus batch sizes).
    span_hi = fchunk * hop_hi + 2 * n_fft
    span_lo = fchunk * hop_lo + 2 * n_fft
    tiles_hi, tiles_lo, tile_fvalid = [], [], []
    for c in range(cfg.max_chunks):
        start_hi = c * cfg.chunk_samples
        start_lo = start_hi // 4
        len_in = jnp.clip(n_samples - start_hi, 0, cfg.chunk_samples)
        f_valid_c = jnp.where(len_in > 0, 1 + len_in // hop_hi, 0)
        for fc in range(n_fchunks):
            s_hi = start_hi + fc * fchunk * hop_hi
            s_lo = start_lo + fc * fchunk * hop_lo
            tiles_hi.append(jax.lax.slice_in_dim(ypad, s_hi, s_hi + span_hi,
                                                 axis=-1))
            tiles_lo.append(jax.lax.slice_in_dim(y4pad, s_lo, s_lo + span_lo,
                                                 axis=-1))
            tile_fvalid.append(f_valid_c - fc * fchunk)
    tiles_hi = jnp.stack(tiles_hi)
    tiles_lo = jnp.stack(tiles_lo)
    tile_fvalid = jnp.stack(tile_fvalid)

    from .fft_mxu import _use_mxu
    use_time_kernels = _use_mxu()
    if use_time_kernels:
        lo_tb, hi_tb = _time_bases(cfg)

    f_valid_all = tile_fvalid.reshape(cfg.max_chunks, n_fchunks)[:, 0]

    # ── fused Pallas path (TPU): framing + CQT + floor + fold + normalize +
    # masked frame-sum per CHUNK in VMEM (ops/pallas/chromacq.py) — the scan
    # below spent 22% of the whole corpus program on frame-tensor HBM
    # traffic, and the chunk-scoped grid (round 4) lets the per-bin
    # noise-floor median see all of a chunk's frames before the fold ──
    from .pallas import chromacq
    auto = (cfg.chroma_floor_sub and cfg.chroma_floor_auto
            and cfg.chroma_floor_scale_noisy != cfg.chroma_floor_scale)

    def _auto_select(sums_base, sums_noisy, proxy_c, flat_c):
        """Whole-file floor-scale selection: the valid-chunk means of the
        per-chunk noise proxy AND floor flatness against their thresholds
        (noise is file-global; per-chunk switching would add vote
        variance).  BOTH must fire: a drone/pad-heavy file has a high
        floor-to-peak proxy (its sustained harmonics ARE its floor) but a
        spiky floor spectrum, and the strong scale would eat exactly that
        signal — only a pervasive (spectrally flat) elevated floor is
        noise."""
        means_b = sums_base / jnp.maximum(f_valid_all, 1)[:, None]
        vmask = (f_valid_all > 0).astype(jnp.float32)
        nv = jnp.maximum(jnp.sum(vmask), 1.0)
        proxy_file = jnp.sum(proxy_c * vmask) / nv
        if not auto:
            return (means_b, proxy_file) if with_proxy else means_b
        flat_file = jnp.sum(flat_c * vmask) / nv
        means_n = sums_noisy / jnp.maximum(f_valid_all, 1)[:, None]
        means = jnp.where((proxy_file > cfg.chroma_floor_noise_thresh)
                          & (flat_file > cfg.chroma_floor_flat_thresh),
                          means_n, means_b)
        return (means, proxy_file) if with_proxy else means

    if use_time_kernels and chromacq.supported(n_fft, hop_hi, fchunk):
        rows_hi = fchunk + 8           # per-phase rows; frame j row a →
        rows_lo = fchunk + 32          # phase a%4, idx j + a//4 (hi)
        span4_hi = 4 * rows_hi * 128
        span_lo3 = rows_lo * 128
        t_hi, t_lo = [], []
        for c in range(cfg.max_chunks):
            start_hi = c * cfg.chunk_samples
            start_lo = start_hi // 4
            for fc2 in range(n_fchunks):
                s_hi = start_hi + fc2 * fchunk * hop_hi
                s_lo = start_lo + fc2 * fchunk * hop_lo
                t_hi.append(jax.lax.slice_in_dim(
                    ypad, s_hi, s_hi + span4_hi, axis=-1
                ).reshape(rows_hi, 4, 128).transpose(1, 0, 2))
                t_lo.append(jax.lax.slice_in_dim(
                    y4pad, s_lo, s_lo + span_lo3, axis=-1
                ).reshape(rows_lo, 128))
        sums_base, sums_noisy, proxy_c, flat_c = chromacq.chroma_chunk_sums(
            jnp.stack(t_hi).reshape(cfg.max_chunks, n_fchunks * 4,
                                    rows_hi, 128),
            jnp.stack(t_lo).reshape(cfg.max_chunks, n_fchunks,
                                    rows_lo, 128),
            f_valid_all, hi_tb, lo_tb, fchunk=fchunk, n_fchunks=n_fchunks,
            n_lo=cfg.chroma_low_octaves * bpo,
            n_hi=(cfg.chroma_n_octaves - cfg.chroma_low_octaves) * bpo,
            bpo=bpo, floor_sub=cfg.chroma_floor_sub,
            floor_scale=cfg.chroma_floor_scale,
            floor_scale_noisy=(cfg.chroma_floor_scale_noisy if auto
                               else cfg.chroma_floor_scale))
        return _auto_select(sums_base, sums_noisy, proxy_c, flat_c)

    # ── scan fallback (CPU tests / non-MXU): chunk-major so the per-bin
    # floor sees the whole chunk, same arithmetic as the kernel ──
    tiles_hi = tiles_hi.reshape(cfg.max_chunks, n_fchunks, -1)
    tiles_lo = tiles_lo.reshape(cfg.max_chunks, n_fchunks, -1)

    def body(_, chunk):
        segs_hi, segs_lo, f_valid = chunk
        cqs = []
        for fc in range(n_fchunks):
            fr_hi = frame_interleaved(segs_hi[fc], fchunk, n_fft,
                                      hop_hi)[:fchunk]
            fr_lo = frame_interleaved(segs_lo[fc], fchunk, n_fft,
                                      hop_lo)[:fchunk]
            if use_time_kernels:
                cq_lo = jnp.take(_cqt_mag_time(fr_lo, lo_tb),
                                 perm_lo[:fchunk], axis=0)
                cq_hi = jnp.take(_cqt_mag_time(fr_hi, hi_tb),
                                 perm_hi[:fchunk], axis=0)
            else:
                sp_hi = jnp.fft.rfft(fr_hi * window, axis=-1)
                sp_lo = jnp.fft.rfft(fr_lo * window, axis=-1)
                cq_lo = jnp.take(_cqt_mag(sp_lo, lo_basis),
                                 perm_lo[:fchunk], axis=0)
                cq_hi = jnp.take(_cqt_mag(sp_hi, hi_basis),
                                 perm_hi[:fchunk], axis=0)
            cqs.append(jnp.concatenate([cq_lo, cq_hi], axis=-1))
        cq = jnp.concatenate(cqs, axis=0)             # (F, n_bins) natural
        local_f = jnp.arange(n_fchunks * fchunk)
        valid_col = (local_f < f_valid)[:, None]

        def fold_norm_sum(cqx):
            ch = cqx.reshape(-1, cfg.chroma_n_octaves, bpo).sum(axis=1)
            peak = jnp.max(ch, axis=-1, keepdims=True)
            ch = jnp.where(peak > 1e-12, ch / jnp.maximum(peak, 1e-12), 0.0)
            return jnp.sum(jnp.where(valid_col, ch, 0.0), axis=0)

        if cfg.chroma_floor_sub:
            floor = _masked_bin_floor(cq, valid_col, f_valid)
            top = jnp.max(jnp.where(valid_col, cq, 0.0), axis=0,
                          keepdims=True)
            proxy = jnp.sum(floor) / jnp.maximum(jnp.sum(top), 1e-20)
            # floor spectral flatness (gm/am) — same arithmetic as the
            # kernel (all of cq's bins are real here, no padding)
            am = jnp.mean(floor)
            eps_f = 1e-9 * am + 1e-30
            flat = (jnp.exp(jnp.mean(jnp.log(floor + eps_f)))
                    / jnp.maximum(am, 1e-30))
            s_base = fold_norm_sum(jnp.maximum(
                cq - cfg.chroma_floor_scale * floor, 0.0))
            s_noisy = (fold_norm_sum(jnp.maximum(
                cq - cfg.chroma_floor_scale_noisy * floor, 0.0))
                if auto else s_base)
        else:
            s_base = s_noisy = fold_norm_sum(cq)
            proxy = jnp.zeros(())
            flat = jnp.zeros(())
        return None, (s_base, s_noisy, proxy, flat)

    _, (sums_base, sums_noisy, proxy_c, flat_c) = jax.lax.scan(
        body, None, (tiles_hi, tiles_lo, f_valid_all))
    return _auto_select(sums_base, sums_noisy, proxy_c, flat_c)


def cyclic_xcorr_lag(src_chroma: jnp.ndarray, nc_chroma: jnp.ndarray) -> jnp.ndarray:
    """Wrapped argmax lag of the cyclic cross-correlation over all rotations.

    Positive lag ⇒ nc shifted UP vs src, wrapped to ``[-n//2, n//2]``
    (reference ``pitch.py:67-85``: ``xcorr[k] = dot(src, roll(nc, -k))``).
    Works on (..., n) batches.
    """
    n = src_chroma.shape[-1]
    rolls = (jnp.arange(n)[:, None] + jnp.arange(n)[None, :]) % n   # [k, i] -> i+k
    nc_rolled = nc_chroma[..., rolls]                                # (..., k, i)
    xc = jnp.einsum("...i,...ki->...k", src_chroma, nc_rolled)
    raw = jnp.argmax(xc, axis=-1).astype(jnp.int32)
    return jnp.where(raw > n // 2, raw - n, raw)
