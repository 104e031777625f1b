"""Onset-strength envelopes (STFT → mel → dB → positive spectral flux).

TPU-native rebuild of the reference's hottest numeric path
(``librosa.onset.onset_strength``, used per-window at hop 512 in
``tempo.py:44`` and full-signal at hop 64 in ``tempo.py:158`` — SURVEY §3.5
measures the hop-64 pass as the dominant cost of the whole pipeline).

Design:
* the per-window path materializes all window spectrograms in chunks of
  ``cfg.window_chunk`` slots (memory-bounded, MXU-batched mel matmul);
* the global hop-64 path streams STFT frames through ``lax.scan`` in chunks
  of ``cfg.frame_chunk`` frames — the full hop-64 STFT of a 5-minute track
  would be ~0.9 GB and never fits; only the (frames, n_mels) mel power
  spectrogram (~50 MB) is kept, on which the dB clamp + flux run fused.
* dB clamping (top_db=80) is relative to the spectrogram max, matching
  librosa ``power_to_db`` — per *window* for the windowed path, per *signal*
  for the global path, exactly as the reference's call structure implies.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AnalyzerConfig
from . import filters
from .spectrum import frame_interleaved, interleave_params, power_to_db

__all__ = ["onset_pad_width", "mel_power_windows", "mel_power_global",
           "mel_power_global_batch", "onset_envelope_from_mel",
           "envelope_floor_sub", "onset_frames_valid"]


@lru_cache(maxsize=8)
def _mel_basis(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    return filters.mel_filterbank(sr, n_fft, n_mels).T.copy()  # (1+n_fft//2, n_mels)


@lru_cache(maxsize=8)
def _dft_windowed(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT matrices with the Hann analysis window folded in:
    ``spectrum = frames @ F`` — one clean MXU matmul per block instead of a
    VPU FFT plus layout shuffles (~2× faster end-to-end in the mel scans)."""
    w = filters.hann(n_fft).astype(np.float64)
    n = np.arange(n_fft)[:, None]
    b = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * n * b / n_fft
    return ((np.cos(ang) * w[:, None]).astype(np.float32),
            (np.sin(ang) * w[:, None]).astype(np.float32))


def onset_pad_width(n_fft: int, hop: int) -> int:
    """librosa onset_strength lag/centering compensation (frames)."""
    return 1 + n_fft // (2 * hop)


def _stft_mel_power(seg_frames: jnp.ndarray, window: jnp.ndarray,
                    mel_T: jnp.ndarray) -> jnp.ndarray:
    """frames (..., n, n_fft) -> mel power (..., n, n_mels).

    TPU path: windowed DFT as two bf16 MXU matmuls (window folded into the
    DFT matrices) → |·|² → bf16 mel matmul, f32 accumulation throughout.
    Mel power only feeds a dB → flux path, where bf16's ~0.4% relative
    error is ~0.02 dB — far below musical onset contrast.  Non-TPU backends
    use the exact rfft (golden-value tests run there).
    """
    from .fft_mxu import _use_mxu
    bf = jnp.bfloat16
    if _use_mxu():
        Fr, Fi = _dft_windowed(seg_frames.shape[-1])
        fr = seg_frames.astype(bf)
        xr = jnp.matmul(fr, jnp.asarray(Fr).astype(bf),
                        preferred_element_type=jnp.float32)
        xi = jnp.matmul(fr, jnp.asarray(Fi).astype(bf),
                        preferred_element_type=jnp.float32)
        mag2 = xr * xr + xi * xi
    else:
        spec = jnp.fft.rfft(seg_frames * window, axis=-1)
        mag2 = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.matmul(mag2.astype(bf), mel_T.astype(bf),
                      preferred_element_type=jnp.float32)


def mel_power_windows(y: jnp.ndarray, cfg: AnalyzerConfig) -> jnp.ndarray:
    """Mel power spectrogram of every analysis-window slot.

    ``y``: (max_samples,) padded signal (window slot *i* starts at
    ``i * hop_samples``, reference ``io.py:93-99``).
    Returns (n_window_slots, onset_frames_per_window, n_mels).
    """
    n_fft, hop = cfg.tempo_n_fft, cfg.tempo_hop
    n_slots, win_n = cfg.n_window_slots, cfg.win_samples
    f_per_win = cfg.onset_frames_per_window
    window = jnp.asarray(filters.hann(n_fft))
    mel_T = jnp.asarray(_mel_basis(cfg.sample_rate, n_fft, cfg.n_mels))

    chunk = max(1, cfg.window_chunk)
    n_chunks = -(-n_slots // chunk)
    pad = n_fft // 2
    P, K, f_padded, perm = interleave_params(f_per_win, n_fft, hop)
    slot_seg = (f_padded - 1) * hop + n_fft + n_fft
    seg_len = (chunk - 1) * cfg.hop_samples + slot_seg
    ypad = jnp.pad(y, (pad, pad + seg_len))
    perm_j = jnp.asarray(perm)

    def body(_, c):
        seg = jax.lax.dynamic_slice(ypad, (c * chunk * cfg.hop_samples,),
                                    (seg_len,))
        outs = []
        for s in range(chunk):                    # static slot offsets
            sseg = jax.lax.slice_in_dim(seg, s * cfg.hop_samples,
                                        s * cfg.hop_samples + slot_seg, axis=-1)
            frames = frame_interleaved(sseg, f_per_win, n_fft, hop)
            mel = _stft_mel_power(frames, window, mel_T)   # (f_padded, mels)
            outs.append(jnp.take(mel, perm_j, axis=0)[:f_per_win])
        return None, jnp.stack(outs)

    _, mels = jax.lax.scan(body, None, jnp.arange(n_chunks))
    mels = mels.reshape(n_chunks * chunk, f_per_win, cfg.n_mels)
    return mels[:n_slots]


def mel_power_global(y: jnp.ndarray, cfg: AnalyzerConfig) -> jnp.ndarray:
    """Mel power spectrogram of the full signal at ``cfg.ibi_hop``.

    Streams frames through lax.scan in chunks of ``cfg.frame_chunk``; returns
    (global_onset_frames_padded, n_mels) with the tail rows garbage (callers
    mask by :func:`onset_frames_valid`).
    """
    n_fft, hop = cfg.tempo_n_fft, cfg.ibi_hop
    n_frames = cfg.global_onset_frames
    window = jnp.asarray(filters.hann(n_fft))
    mel_T = jnp.asarray(_mel_basis(cfg.sample_rate, n_fft, cfg.n_mels))

    chunk = cfg.frame_chunk
    n_chunks = -(-n_frames // chunk)
    P, K, c_padded, perm = interleave_params(chunk, n_fft, hop)
    assert c_padded == chunk, "frame_chunk must be a multiple of n_fft//hop"
    seg_len = (K - 1) * n_fft + (P - 1) * hop + n_fft
    pad = n_fft // 2
    ypad = jnp.pad(y, (pad, pad + seg_len))
    perm_j = jnp.asarray(perm)

    def body(_, c):
        start = c * (chunk * hop)
        seg = jax.lax.dynamic_slice(ypad, (start,), (seg_len,))
        frames = frame_interleaved(seg, chunk, n_fft, hop)
        mel = _stft_mel_power(frames, window, mel_T)
        return None, jnp.take(mel, perm_j, axis=0)

    _, mels = jax.lax.scan(body, None, jnp.arange(n_chunks))
    return mels.reshape(n_chunks * chunk, cfg.n_mels)[:n_frames]


def mel_power_global_batch(ys: jnp.ndarray, cfg: AnalyzerConfig) -> jnp.ndarray:
    """Batched :func:`mel_power_global` over (S, max_samples) signals.

    On TPU with the default geometry (n_fft 2048, hop 64, ≤128 mels) this
    dispatches to the fused Pallas kernel (framing + factored rfft + mel in
    VMEM, ops/pallas/melfft.py — 98 ms → 43 ms at production shape on v5e);
    otherwise it falls back to the vmapped scan path.
    """
    from .fft_mxu import _use_mxu
    from .pallas import melfft
    if _use_mxu() and melfft.supported(cfg.tempo_n_fft, cfg.ibi_hop,
                                       cfg.n_mels):
        return melfft.mel_power_global_batch(
            ys, sr=cfg.sample_rate, n_mels=cfg.n_mels,
            n_frames=cfg.global_onset_frames)
    return jax.vmap(lambda y: mel_power_global(y, cfg))(ys)


def onset_envelope_from_mel(mel_power: jnp.ndarray, n_valid_frames: jnp.ndarray,
                            n_fft: int, hop: int) -> jnp.ndarray:
    """Positive first-order flux of the dB mel spectrogram.

    ``mel_power``: (..., frames, n_mels); ``n_valid_frames`` masks the padded
    tail out of both the dB max and the returned envelope.  Matches
    ``librosa.onset.onset_strength`` (power_to_db(top_db=80) → lagged diff →
    clip(0) → mean over mels → zero-pad by ``onset_pad_width`` at the start).
    """
    frames = mel_power.shape[-2]
    fidx = jnp.arange(frames)
    valid = fidx < n_valid_frames                       # (..., frames) broadcast
    while valid.ndim < mel_power.ndim - 1:
        valid = valid[None]
    mp = jnp.where(valid[..., None], mel_power, 0.0)

    log_spec = 10.0 * jnp.log10(jnp.maximum(mp, 1e-10))
    peak = jnp.max(jnp.where(valid[..., None], log_spec, -jnp.inf),
                   axis=(-2, -1), keepdims=True)
    db = jnp.maximum(log_spec, peak - 80.0)

    flux = jnp.maximum(0.0, db[..., 1:, :] - db[..., :-1, :]).mean(axis=-1)
    pad = onset_pad_width(n_fft, hop)
    env = jnp.concatenate(
        [jnp.zeros(flux.shape[:-1] + (pad,), flux.dtype), flux], axis=-1)[..., :frames]
    return jnp.where(valid, env, 0.0)


def envelope_floor_sub(env: jnp.ndarray, n_frames: jnp.ndarray,
                       scale: float, thresh: float = 0.0) -> jnp.ndarray:
    """Noise-gated masked-median baseline subtraction on onset envelopes.

    Broadband noise adds a near-constant positive-flux baseline to the
    envelope (per band the dB flux of stationary noise is ~σ/√π > 0, and
    the mean over 128 mel bands makes it almost time-constant).  The
    Ellis-DP objective rewards Σ env[beat] — a constant baseline pays every
    inserted beat, biasing the tracker toward spurious subdivisions and
    beat-position jitter exactly on noisy material (the 11 dB sweep row).
    The masked median over the signal's valid frames IS that baseline, so
    subtracting it (clipped at 0) restores the clean-signal reward
    structure.

    The subtraction is gated per row on the envelope's own median/mean
    ratio against ``thresh`` (pass 0 to condition unconditionally):
    measured on the sweep conditions the ratio is 0.45–0.51 for clean /
    drift / swing material (onset mass dominates the mean), 0.92–0.93 at
    17 dB SNR and 0.96–0.97 at 11 dB, with swing not moving it at all —
    and unconditional subtraction, while fixing 11 dB outright, degrades
    heavy-swing rows (it converts their cleanly-rescuable octave locks
    into ~1 % unrescuable beat corruption), so only genuinely
    noise-floored envelopes (ratio > thresh ≈ 0.95, i.e. ≲14 dB SNR) are
    conditioned.  ``env``: (..., F); ``n_frames``: (...,) valid counts.
    f32 in/out (the tempo ACF canary — bf16 here flips tempo octaves)."""
    from .stats import masked_median_bisect
    mask = jnp.arange(env.shape[-1]) < n_frames[..., None]
    med = masked_median_bisect(env, mask)
    med = jnp.where(jnp.isnan(med), 0.0, med)
    mf = mask.astype(env.dtype)
    mean = (jnp.sum(env * mf, axis=-1) /
            jnp.maximum(jnp.sum(mf, axis=-1), 1.0))
    noisy = med / jnp.maximum(mean, 1e-12) > thresh
    sub = jnp.maximum(env - scale * med[..., None], 0.0)
    return jnp.where(mask & noisy[..., None], sub,
                     jnp.where(mask, env, 0.0))


def onset_frames_valid(n_samples: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Number of centered-STFT frames for a signal of ``n_samples``."""
    return 1 + n_samples // hop
