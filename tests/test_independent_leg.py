"""Author-independent third leg for the librosa-parity triangle.

Round-1 review: every "parity" test compared the JAX path against
``cpu_baseline/reference.py`` — which shares ``ops/filters.py`` constants
with the device path, so a wrong constant would pass both legs.  Real
librosa is not installable in this image (no egress), so this module
re-derives the shared constants and transforms FROM THE PUBLISHED
ALGORITHM SPECS using only torch / numpy primitives, with every number
typed fresh here:

* Slaney mel scale + filterbank (O'Shaughnessy linear<1 kHz, log above,
  equal-area normalization) — the documented librosa ``filters.mel``
  default
* periodic Hann window
* centered STFT → mel → dB → positive flux onset envelope via
  ``torch.stft`` (pocketfft-independent FFT implementation)
* tempo lag→BPM grid ``60·sr/(hop·k)``
* end-to-end: known-factor pair ratio recovered through the full device
  program using ONLY oracle ground truth (no reimplementation at all)

Agreement here means an error in the shared constants would have to be
replicated independently from the spec text to go unnoticed.
"""

import numpy as np
import pytest
import torch

from nightcore_analyzer_tpu.ops import filters

SR = 22050
N_FFT = 2048


# ── fresh constant derivations (typed from the spec, not imported) ─────────

def mel_scale_fresh(f):
    """Slaney mel: linear below 1 kHz at 3/200 mel/Hz, logarithmic above
    with step log(6.4)/27 per mel."""
    f = np.asarray(f, np.float64)
    linear = 3.0 * f / 200.0
    min_log_hz = 1000.0
    min_log_mel = 3.0 * min_log_hz / 200.0
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        logpart = min_log_mel + np.log(
            np.maximum(f, 1e-30) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, logpart, linear)


def mel_to_hz_fresh(m):
    m = np.asarray(m, np.float64)
    linear = 200.0 * m / 3.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    1000.0 * np.exp(logstep * (m - min_log_mel)), linear)


def mel_bank_fresh(sr, n_fft, n_mels):
    bins = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    pts = mel_to_hz_fresh(np.linspace(mel_scale_fresh(0.0),
                                      mel_scale_fresh(sr / 2.0), n_mels + 2))
    W = np.zeros((n_mels, len(bins)))
    for m in range(n_mels):
        lo, mid, hi = pts[m], pts[m + 1], pts[m + 2]
        up = (bins - lo) / (mid - lo)
        down = (hi - bins) / (hi - mid)
        W[m] = np.maximum(0.0, np.minimum(up, down))
        W[m] *= 2.0 / (hi - lo)              # equal-area (Slaney) norm
    return W


def test_mel_scale_anchors():
    """Spec anchor points: 1 kHz = 15 mel, 6.4 kHz = 42 mel (one log step
    of 27 above the corner), linearity below the corner."""
    assert mel_scale_fresh(1000.0) == pytest.approx(15.0)
    assert mel_scale_fresh(6400.0) == pytest.approx(42.0)
    assert mel_scale_fresh(500.0) == pytest.approx(7.5)
    got = filters._hz_to_mel(np.array([500.0, 1000.0, 6400.0]))
    assert np.allclose(got, [7.5, 15.0, 42.0], rtol=1e-9)


def test_mel_filterbank_matches_fresh_derivation():
    ours = filters.mel_filterbank(SR, N_FFT, 128)
    fresh = mel_bank_fresh(SR, N_FFT, 128)
    assert ours.shape == fresh.shape
    assert np.max(np.abs(ours - fresh)) < 1e-6 * np.max(fresh)


def test_hann_is_periodic_form():
    n = np.arange(N_FFT)
    fresh = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / N_FFT)
    assert np.max(np.abs(filters.hann(N_FFT) - fresh)) < 1e-7


def test_tempo_grid_formula():
    got = filters.tempo_frequencies(8, 512, SR)
    k = np.arange(8, dtype=np.float64)
    with np.errstate(divide="ignore"):
        fresh = 60.0 * SR / (512.0 * k)
    assert np.allclose(got[1:], fresh[1:], rtol=1e-9)
    assert not np.isfinite(got[0])


def test_onset_envelope_vs_torch_stft():
    """Full onset path against a from-scratch torch implementation:
    centered STFT (torch.stft, reflect-free zero pad like our path),
    |.|² → fresh mel bank → 10·log10 with 80 dB clamp → positive flux →
    mean over mels → pad by 1 + n_fft//(2·hop)."""
    import jax.numpy as jnp
    from nightcore_analyzer_tpu.ops import onset
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    cfg = AnalyzerConfig(max_duration_sec=4.0, window_sec=2.0, hop_sec=1.0,
                         max_beats=128, max_beats_window=16)
    hop = cfg.ibi_hop
    rng = np.random.default_rng(7)
    y = rng.standard_normal(cfg.max_samples).astype(np.float32) * 0.1
    y[::4500] += 2.0                          # clicky
    n_frames = int(onset.onset_frames_valid(jnp.asarray(len(y)), hop))

    mel = np.asarray(onset.mel_power_global(jnp.asarray(y), cfg))[:n_frames]
    env = np.asarray(onset.onset_envelope_from_mel(
        jnp.asarray(mel), jnp.asarray(n_frames), cfg.tempo_n_fft, hop))

    # independent torch leg
    yt = torch.from_numpy(np.pad(y, (N_FFT // 2, N_FFT // 2)))
    win = torch.from_numpy(
        (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(N_FFT) / N_FFT))
        .astype(np.float32))
    spec = torch.stft(yt, N_FFT, hop_length=hop, win_length=N_FFT,
                      window=win, center=False, return_complex=True)
    mag2 = (spec.real ** 2 + spec.imag ** 2).numpy()[:, :n_frames]
    melspec = mel_bank_fresh(SR, N_FFT, cfg.n_mels) @ mag2      # (mels, t)
    db = 10.0 * np.log10(np.maximum(melspec, 1e-10))
    db = np.maximum(db, db.max() - 80.0)
    flux = np.maximum(0.0, db[:, 1:] - db[:, :-1]).mean(axis=0)
    pad = 1 + N_FFT // (2 * hop)
    env_fresh = np.concatenate([np.zeros(pad), flux])[:n_frames]

    denom = max(env_fresh.max(), 1e-6)
    assert np.max(np.abs(env - env_fresh)) / denom < 5e-3


def test_end_to_end_oracle_no_reimplementation():
    """The strongest leg needs no reimplementation at all: a pair built
    with a known resampling factor must come back with that factor."""
    from nightcore_analyzer_tpu.analyze.pipeline import analyze_arrays
    from nightcore_analyzer_tpu.utils import synth
    from tests.test_pipeline_tiny import TINY
    factor = 1.22
    src = synth.music_like(26.0, SR, bpm=150.0, seed=42, chord_bars=0.5)
    nc = synth.speed_shift(src, factor)
    res, _ = analyze_arrays(nc, src, TINY)
    assert res.ibi_regression_ratio == pytest.approx(factor, rel=2e-3)
