"""Autocorrelation tempogram and prior-weighted tempo picking.

Rebuilds ``librosa.feature.tempogram`` + ``librosa.feature.tempo`` — which is
the *actual* per-window BPM estimator of the reference: both of its
"independent" estimators resolve to ``feature.tempo`` (``tempo.py:45-68``;
``beat_track`` returns the tempo it was seeded with), so the windowed BPM is
quantized to the ACF lag grid ``60*sr/(hop*k)`` — the exact quantization the
reference's degenerate-CI sanity rule documents (``consensus.py:472-500``).

Implementation notes:
* local ACF per onset frame (win_length centered, periodic-Hann windowed,
  FFT autocorrelation, per-column inf-norm) aggregated by mean, streamed in
  chunks of ``tg_frame_chunk`` columns;
* the reference (librosa) pads the envelope with a linear ramp before
  framing; we zero-pad instead — with hundreds of interior columns averaged,
  the two differ only in edge-column taper and never move the argmax lag;
* ``stride`` subsamples aggregated columns (mean-transparent); the hop-64
  global pass uses it to bound compute (cfg.ibi_tempo_stride).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import filters

__all__ = ["tempogram_mean_acf", "tempo_from_acf"]


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=8)
def _dft_direct(frame_len: int, nfft: int) -> tuple[np.ndarray, np.ndarray]:
    """Direct real-DFT matrices on the nfft bin grid for short frames:
    ``spec = frames @ (Cr, Ci)`` — for small windows one clean f32 MXU
    matmul beats the factored FFT, whose n2-lane intermediates (4 lanes at
    nfft=512) pad 32× and drown in relayouts."""
    t = np.arange(frame_len)[:, None]
    k = np.arange(nfft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * t * k / nfft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@lru_cache(maxsize=8)
def _acf_cos_matrix(nfft: int, win_length: int) -> np.ndarray:
    """Cosine matrix turning a power spectrum into its autocorrelation:
    ``ac = mag2 @ M`` with ``M[k, l] = w_k·cos(2πkl/nfft)/nfft``
    (w = 1 for DC/Nyquist, 2 otherwise) — the irfft of a real-even spectrum
    as a single MXU matmul instead of a VPU inverse FFT."""
    k = np.arange(nfft // 2 + 1)[:, None]
    l = np.arange(win_length)[None, :]
    M = np.cos(2.0 * np.pi * k * l / nfft) / nfft
    M[1:-1] *= 2.0
    return M.astype(np.float32)


def _acf_from_frames(windowed: jnp.ndarray, nfft: int, win_length: int):
    """|rfft|² → autocorrelation[:win_length] for (..., win_length) frames.

    On TPU the inverse transform becomes a cosine matmul on the MXU (the
    irfft of a real-even spectrum), at f32/HIGHEST precision — the ACF
    argmax decides between near-tied harmonic peaks, so bf16's ~0.4% noise
    is NOT acceptable here (it flips tempo octaves).  The forward rfft stays
    exact for the same reason.
    """
    from .fft_mxu import _use_mxu, rfft_mxu
    on_mxu = _use_mxu() and nfft in (512, 1024, 2048, 4096, 8192)
    frame_len = windowed.shape[-1]
    if on_mxu and frame_len * (nfft // 2 + 1) <= 600_000:
        # short windows: direct real-DFT matmul at f32/HIGHEST (exact to
        # ~1e-7 — the ACF argmax decides near-tied harmonic peaks, bf16 is
        # NOT acceptable as it flips tempo octaves)
        Cr, Ci = _dft_direct(frame_len, nfft)
        hp = jax.lax.Precision.HIGHEST
        xr = jnp.matmul(windowed, jnp.asarray(Cr),
                        preferred_element_type=jnp.float32, precision=hp)
        xi = jnp.matmul(windowed, jnp.asarray(Ci),
                        preferred_element_type=jnp.float32, precision=hp)
        mag2 = xr * xr + xi * xi
        M = jnp.asarray(_acf_cos_matrix(nfft, win_length))
        return jnp.matmul(mag2, M, preferred_element_type=jnp.float32,
                          precision=hp)
    if windowed.shape[-1] < nfft:
        windowed = jnp.pad(
            windowed, [(0, 0)] * (windowed.ndim - 1)
            + [(0, nfft - windowed.shape[-1])])
    if on_mxu:
        # forward rfft as f32/HIGHEST MXU matmuls (exact to ~1e-7)
        spec = rfft_mxu(windowed, dtype=jnp.float32)
    else:
        spec = jnp.fft.rfft(windowed, n=nfft, axis=-1)
    mag2 = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if on_mxu:
        M = jnp.asarray(_acf_cos_matrix(nfft, win_length))
        return jnp.matmul(mag2, M, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    return jnp.fft.irfft(mag2, n=nfft, axis=-1)[..., :win_length]


def tempogram_mean_acf(env: jnp.ndarray, n_valid: jnp.ndarray, *,
                       win_length: int, stride: int = 1,
                       chunk: int = 64,
                       max_lag: int | None = None) -> jnp.ndarray:
    """Mean over frames of the per-frame normalized local ACF.

    ``env``: (frames,) onset envelope, zeros beyond ``n_valid``.
    Returns ``(max_lag or win_length,)`` — the aggregated tempogram column.

    ``max_lag`` truncates only the *output* lags while keeping the full
    ``win_length`` analysis window: the window width sets the (1 - lag/W)
    triangular taper of the local ACF, so shrinking the window (rather than
    the lag range) would bias slow-BPM lags relative to librosa's ac_size
    window and could flip octave picks near ties (round-1 advisor finding).
    Normalization uses lag 0, which for a true windowed autocorrelation
    equals the inf-norm librosa takes over the full column.
    """
    frames = env.shape[-1]
    half = win_length // 2
    out_len = win_length if max_lag is None else min(max_lag, win_length)
    n_cols = -(-frames // stride)            # columns t = 0, stride, 2*stride…
    n_used = jnp.maximum((jnp.minimum(n_valid, frames) + stride - 1) // stride, 1)

    if stride > 1:
        # Gather-free strided path: pad the analysis window with trailing
        # zeros to a stride multiple, then the column frames decompose into
        # P contiguous reshapes (spectrum.interleave_params) — ~5× cheaper
        # than a (cols, win) take at the hop-64 IBI shape.  The zero tail
        # cannot change the windowed frame, and the FFT length only needs
        # win + out_len (lags beyond out_len are discarded, so circular
        # wrap-around never reaches a kept lag).
        from .spectrum import frame_interleaved, interleave_params
        win_pad = -(-win_length // stride) * stride
        P, K, n_padded, _ = interleave_params(n_cols, win_pad, stride)
        nfft = _next_pow2(win_pad + out_len)
        window = jnp.zeros(win_pad).at[:win_length].set(
            jnp.asarray(filters.hann(win_length)))
        envp = jnp.pad(env, (half, half + win_pad + (n_padded - n_cols) * stride))
        cols = frame_interleaved(envp, n_cols, win_pad, stride)  # (P*K, wp)
        ac = _acf_from_frames(cols * window, nfft, out_len)
        peak = ac[..., :1]                   # lag 0 == max |ac| exactly
        ac = jnp.where(peak > 1e-20, ac / jnp.maximum(peak, 1e-20), 0.0)
        r = jnp.arange(P * K)
        t_idx = (r % K) * P + r // K         # interleaved row → column index
        m = (t_idx < n_used)[:, None]        # column t covers frame t*stride
        return jnp.sum(jnp.where(m, ac, 0.0), axis=0) / n_used

    envp = jnp.pad(env, (half, half + win_length))
    window = jnp.asarray(filters.hann(win_length))
    nfft = _next_pow2(win_length + out_len)
    n_chunks = -(-n_cols // chunk)
    local = jnp.arange(chunk)[:, None] * stride + jnp.arange(win_length)[None, :]

    def body(acc, c):
        t0 = c * (chunk * stride)
        cols = jnp.take(envp, local + t0, axis=0)            # (chunk, win)
        ac = _acf_from_frames(cols * window, nfft, out_len)
        peak = ac[..., :1]                   # lag 0 == max |ac| exactly
        ac = jnp.where(peak > 1e-20, ac / jnp.maximum(peak, 1e-20), 0.0)
        t_idx = t0 + jnp.arange(chunk) * stride
        m = (t_idx < n_valid)[:, None]
        return acc + jnp.sum(jnp.where(m, ac, 0.0), axis=0), None

    acc, _ = jax.lax.scan(body, jnp.zeros(out_len), jnp.arange(n_chunks))
    return acc / n_used


def tempo_from_acf(acf: jnp.ndarray, start_bpm: jnp.ndarray, *,
                   hop_length: int, sr: float, std_bpm: float = 1.0,
                   max_tempo: float | None = 320.0,
                   subgrid: bool = False) -> jnp.ndarray:
    """Prior-weighted argmax over the BPM grid (librosa ``feature.tempo``).

    ``start_bpm`` may be a traced scalar (the nightcore prior is data-derived,
    reference ``pipeline.py:174-186``).

    ``subgrid=True`` refines the winning lag with a parabolic fit through the
    ACF peak's neighbors — a beyond-reference option (``AnalyzerConfig
    .tempo_subgrid``): the reference's estimator is quantized to the integer
    lag grid (steps of 2–5 % at high BPM), which its degenerate-CI warning
    documents; the parabola interpolates between grid points.  OFF by
    default for parity.
    """
    win_length = acf.shape[-1]
    bpms = jnp.asarray(filters.tempo_frequencies(win_length, hop_length, sr))
    logprior = -0.5 * ((jnp.log2(bpms) - jnp.log2(start_bpm)) / std_bpm) ** 2
    if max_tempo is not None:
        logprior = jnp.where(bpms > max_tempo, -jnp.inf, logprior)
    logprior = jnp.where(jnp.isfinite(bpms), logprior, -jnp.inf)
    score = jnp.log1p(1e6 * acf) + logprior
    best = jnp.argmax(score, axis=-1)
    if not subgrid:
        return jnp.take(bpms, best)
    k = jnp.clip(best, 1, win_length - 2)
    am = jnp.take(acf, k - 1)
    a0 = jnp.take(acf, k)
    ap = jnp.take(acf, k + 1)
    denom = am - 2.0 * a0 + ap
    off = jnp.where(jnp.abs(denom) > 1e-12,
                    0.5 * (am - ap) / denom, 0.0)
    off = jnp.clip(off, -0.5, 0.5)
    lag = jnp.maximum(k.astype(jnp.float32) + off, 1e-3)
    return 60.0 * sr / (hop_length * lag)
