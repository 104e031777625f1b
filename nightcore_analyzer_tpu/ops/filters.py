"""Host-side (numpy) construction of static filters and bases.

These arrays are computed once per configuration and closed over by the jitted
device programs as constants (XLA folds them into the executable):

* periodic Hann window — matches ``scipy.signal.get_window('hann', n)`` which
  librosa uses for every STFT (reference ``tempo.py:44``, ``pitch.py:58``).
* Slaney mel filterbank — librosa ``filters.mel`` defaults (htk=False,
  norm='slaney'), backbone of the onset envelope (reference ``tempo.py:44``).
* CQT spectral kernels — frequency-domain constant-Q basis used by the
  chroma estimator (reference ``pitch.py:55-64``); built as a dense matrix so
  the transform is a single MXU matmul per frame block.
* windowed-sinc low-pass — for the power-of-two decimators used by the
  auto-aligner (22.05k→11.025k, reference ``xcorr.py:206-207``) and the
  low-octave chroma stream.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "hann",
    "hann_sym",
    "mel_filterbank",
    "cqt_kernels",
    "halfband_lowpass",
    "tempo_frequencies",
    "log_tempo_prior",
]


def hann(n: int) -> np.ndarray:
    """Periodic Hann window of length ``n`` (fftbins=True convention)."""
    k = np.arange(n)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(np.float32)


def hann_sym(n: int) -> np.ndarray:
    """Symmetric Hann window (scipy ``hann(n, sym=True)``)."""
    if n == 1:
        return np.ones(1, np.float32)
    k = np.arange(n)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / (n - 1))).astype(np.float32)


# ── mel ──────────────────────────────────────────────────────────────────────

def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa default, htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


def mel_filterbank(sr: int, n_fft: int, n_mels: int = 128,
                   fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape ``(n_mels, 1+n_fft//2)``."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)

    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # slaney normalization: equal area per filter
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ── CQT basis ────────────────────────────────────────────────────────────────

def cqt_kernels(sr: float, n_fft: int, fmin: float, n_bins: int,
                bins_per_octave: int = 36) -> tuple[np.ndarray, np.ndarray]:
    """Frequency-domain constant-Q kernels.

    For each bin ``k`` with center frequency ``f_k = fmin * 2**(k/bpo)`` a
    Hann-windowed complex sinusoid of length ``N_k = min(n_fft, Q*sr/f_k)``
    (Q = 1/(2**(1/bpo)-1)) is placed centered in an ``n_fft`` frame and
    transformed with an rfft.  The CQT of a signal frame ``x`` is then
    ``K @ rfft(x)`` — a dense complex matmul that maps straight onto the MXU.

    Returns ``(K_re, K_im)``, each ``(n_bins, 1 + n_fft//2)`` float32.
    Kernels whose full Q-length exceeds ``n_fft`` are truncated (reduced Q);
    callers route low octaves through a decimated stream to avoid this.
    """
    Q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    n_rfft = 1 + n_fft // 2
    K = np.zeros((n_bins, n_rfft), dtype=np.complex128)
    for k in range(n_bins):
        fk = fmin * 2.0 ** (k / bins_per_octave)
        Nk = int(min(n_fft, round(Q * sr / fk)))
        Nk = max(Nk, 4)
        win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(Nk) / Nk)
        t = (np.arange(Nk) - (Nk - 1) / 2.0)
        kern = win * np.exp(2j * np.pi * fk * t / sr)
        kern /= np.sum(win)                      # unit DC gain per kernel
        frame = np.zeros(n_fft, dtype=np.complex128)
        start = (n_fft - Nk) // 2
        frame[start:start + Nk] = kern
        # conj so that K @ rfft(x) ≈ <x, kernel>
        spec = np.fft.fft(frame)[:n_rfft] / n_fft
        K[k] = np.conj(spec)
    # account for rfft symmetry: double non-DC/non-nyquist bins
    K[:, 1:-1] *= 2.0
    return K.real.astype(np.float32), K.imag.astype(np.float32)


def cqt_time_kernels(sr: float, n_fft: int, fmin: float, n_bins: int,
                     bins_per_octave: int = 36,
                     frame_window: np.ndarray | None = None
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Time-domain constant-Q kernels with the frame analysis window folded
    in: ``CQT = frames @ (K_re + i·K_im)`` — the DFT and the spectral-kernel
    matmul fused into one MXU matmul.  Matches :func:`cqt_kernels` applied
    to ``rfft(frame·window)`` up to a global scale (chroma is per-frame
    max-normalized downstream, so scale is irrelevant).

    Returns ``(K_re, K_im)``, each ``(n_fft, n_bins)`` float32.
    """
    Q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    K = np.zeros((n_fft, n_bins), dtype=np.complex128)
    for k in range(n_bins):
        fk = fmin * 2.0 ** (k / bins_per_octave)
        Nk = int(min(n_fft, round(Q * sr / fk)))
        Nk = max(Nk, 4)
        win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(Nk) / Nk)
        t = (np.arange(Nk) - (Nk - 1) / 2.0)
        kern = win * np.exp(-2j * np.pi * fk * t / sr) / np.sum(win)
        start = (n_fft - Nk) // 2
        K[start:start + Nk, k] = kern
    if frame_window is not None:
        K *= frame_window[:, None]
    return K.real.astype(np.float32), K.imag.astype(np.float32)


# ── decimation low-pass ──────────────────────────────────────────────────────

def halfband_lowpass(n_taps: int = 97, beta: float = 8.0) -> np.ndarray:
    """Kaiser-windowed half-band low-pass FIR for 2× decimation (odd length)."""
    assert n_taps % 2 == 1
    m = np.arange(n_taps) - (n_taps - 1) / 2.0
    h = 0.5 * np.sinc(0.5 * m)
    h *= np.kaiser(n_taps, beta)
    h /= np.sum(h)
    return h.astype(np.float32)


# ── tempo grid + prior ───────────────────────────────────────────────────────

def tempo_frequencies(n: int, hop_length: int, sr: float) -> np.ndarray:
    """BPM value of each autocorrelation lag: ``bpm[k] = 60*sr/(hop*k)``.

    Lag 0 maps to +inf, mirroring ``librosa.tempo_frequencies`` — this grid is
    the source of the tempo quantization the reference documents in its
    degenerate-CI sanity warning (``consensus.py:472-500``).
    """
    bpms = np.zeros(n, dtype=np.float64)
    bpms[0] = np.inf
    bpms[1:] = 60.0 * sr / (hop_length * np.arange(1, n))
    return bpms


def log_tempo_prior(bpms: np.ndarray, start_bpm: float, std_bpm: float,
                    max_tempo: float | None) -> np.ndarray:
    """Log-normal tempo prior in log2-BPM space (librosa ``feature.tempo``)."""
    prior = -0.5 * ((np.log2(bpms) - np.log2(start_bpm)) / std_bpm) ** 2
    if max_tempo is not None:
        prior[bpms > max_tempo] = -np.inf
    prior[~np.isfinite(bpms)] = -np.inf
    return prior
