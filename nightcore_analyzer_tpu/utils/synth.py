"""Synthetic audio generation — the test oracle of the TPU build.

The reference ships no tests (SURVEY §4); the natural oracle is synthetic
pair generation: render a music-like signal, speed-shift it by a *known*
factor (optionally pitch-shift), and assert the recovered tempo / IBI /
pitch ratios.  A pure resample shifts tempo and pitch together — exactly how
classic nightcore is produced (sox ``speed``, reference ``workflow.py:117``).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import scipy.signal

__all__ = ["click_track", "music_like", "speed_shift", "nightcore_pair"]


def click_track(bpm: float, duration: float, sr: int = 22050,
                click_hz: float = 1500.0, seed: int = 0) -> np.ndarray:
    """Percussive click track: short exponentially-decaying tone bursts on
    the beat grid plus low-level noise."""
    rng = np.random.default_rng(seed)
    n = int(duration * sr)
    y = 0.002 * rng.normal(size=n).astype(np.float32)
    period = 60.0 / bpm
    t_click = np.arange(int(0.03 * sr)) / sr
    burst = (np.exp(-t_click / 0.008) * np.sin(2 * np.pi * click_hz * t_click)
             ).astype(np.float32)
    beat = 0
    while True:
        start = int(round(beat * period * sr))
        if start + len(burst) > n:
            break
        y[start:start + len(burst)] += burst
        beat += 1
    return y


def music_like(duration: float, sr: int = 22050, bpm: float = 128.0,
               root_hz: float = 220.0, seed: int = 0,
               chord_bars: float = 2.0,
               tempo_drift: float = 0.0,
               accent_jitter: float = 0.0,
               section_gains: float = 0.0,
               swing: float = 0.0,
               noise_level: float = 0.0) -> np.ndarray:
    """Music-like signal: chord pad (root + harmonics over a small chord
    progression) amplitude-pulsed on the beat, plus percussive clicks and a
    bass line.  Has enough spectral flux for onset/beat tracking and enough
    stable harmonic energy for chroma pitch estimation.

    ``tempo_drift`` adds a slow sinusoidal tempo wobble of that relative
    amplitude (e.g. 0.008 = ±0.8%).  Human performances and real recordings
    always carry some drift; it dithers the analyzers' frame/lag grids the
    way real music does, whereas a mathematically constant tempo makes every
    window snap to the same quantized BPM (the degenerate-CI case the
    reference documents, consensus.py:472-500).

    ``accent_jitter`` varies each beat's click amplitude and brightness by
    that relative amount (seeded).  A zero value renders every beat
    identically — pathologically self-similar for waveform matching
    (any ±1-beat lag correlates as well as the true one); real music has
    fills and accents, which this emulates for the xcorr-verifier checks.

    ``section_gains`` adds verse/chorus-like macro loudness structure:
    ~7 s sections with per-section gain 1 ± that relative amount (seeded,
    0.5 s crossfades).  RMS-envelope alignment (auto-align) fundamentally
    keys on such macro structure — a structureless constant-loudness
    loop gives every candidate (speed, lag) the same flat correlation.

    ``swing`` delays every *odd* beat by that fraction of a beat period
    (smooth phase warp, so envelope, clicks, and bass all shift together).
    Alternating long/short inter-beat intervals are the classic stress for
    IBI statistics: the per-side median picks one of the two interval
    lengths while the mean/regression estimators stay centred.

    ``noise_level`` adds broadband noise of that amplitude relative to the
    normalized signal peak (0.1 ≈ 17 dB SNR on this material) — the
    noisy-passage robustness axis."""
    rng = np.random.default_rng(seed)
    n = int(duration * sr)
    t = np.arange(n) / sr

    # beat phase with optional drift: inst_bpm(t) = bpm·(1 + d·sin(2πt/T))
    if tempo_drift:
        T = 23.0
        inst = bpm / 60.0 * (1.0 + tempo_drift * np.sin(2 * np.pi * t / T))
        beat_phase_abs = np.cumsum(inst) / sr
    else:
        beat_phase_abs = t * bpm / 60.0
    if swing:
        # period-2 smooth warp: zero at even beats, -swing at odd beats, so
        # odd beats land `swing` of a period late (monotonic for swing<0.6)
        beat_phase_abs = beat_phase_abs - swing * 0.5 * (
            1.0 - np.cos(np.pi * beat_phase_abs))
    beat_frac = beat_phase_abs % 1.0

    # chord progression: I - vi - IV - V (semitone offsets), chord_bars each
    prog = [0, -3, 5, 7]
    beats_per_chord = 4 * chord_bars
    chord_idx = ((beat_phase_abs / beats_per_chord).astype(np.int64)
                 % len(prog))

    y = np.zeros(n, np.float64)
    for ratio, amp in [(1.0, 0.22), (2.0, 0.12), (3.0, 0.07), (5.0 / 4.0, 0.1),
                       (3.0 / 2.0, 0.12), (4.0, 0.04), (6.0, 0.025)]:
        f = root_hz * ratio * 2.0 ** (np.take(prog, chord_idx) / 12.0)
        phase = 2 * np.pi * np.cumsum(f) / sr
        y += amp * np.sin(phase)

    # beat-synchronous amplitude pulse (gives the onset envelope its peaks)
    env = 0.35 + 0.65 * np.exp(-beat_frac / 0.12)
    y *= env

    # percussive clicks at the (possibly drifting) beat grid
    t_click = np.arange(int(0.03 * sr)) / sr
    starts = np.flatnonzero(np.diff(np.floor(beat_phase_abs)) > 0) + 1
    for bi, s in enumerate(starts):
        amp, hz = 2.0, 2500.0
        if accent_jitter:
            amp *= 1.0 + accent_jitter * float(rng.uniform(-1.0, 1.0))
            hz *= 1.0 + 0.3 * accent_jitter * float(rng.uniform(-1.0, 1.0))
        burst = amp * (np.exp(-t_click / 0.008) *
                       np.sin(2 * np.pi * hz * t_click))
        e = min(n, s + len(burst))
        y[s:e] += burst[:e - s]

    # bass on the beat
    fbass = root_hz / 2.0 * 2.0 ** (np.take(prog, chord_idx) / 12.0)
    y += 0.15 * np.sin(2 * np.pi * np.cumsum(fbass) / sr) * env

    if section_gains:
        sec = 7.3                      # seconds; off the beat/bar grid
        n_sec = int(duration / sec) + 2
        gains = 1.0 + section_gains * rng.uniform(-1.0, 1.0, size=n_sec)
        knots_t, knots_g = [0.0], [gains[0]]
        for si in range(1, n_sec):
            knots_t += [si * sec - 0.25, si * sec + 0.25]
            knots_g += [gains[si - 1], gains[si]]
        y *= np.interp(t, knots_t, knots_g)

    y += 0.003 * rng.normal(size=n)
    y /= np.max(np.abs(y)) * 1.25
    if noise_level:
        y += noise_level * np.max(np.abs(y)) * rng.normal(size=n)
        y /= np.max(np.abs(y)) * 1.25
    return y.astype(np.float32)


def speed_shift(y: np.ndarray, factor: float, max_denom: int = 4096) -> np.ndarray:
    """Resample-based speed change (tempo and pitch co-shift by ``factor``),
    the transform sox ``speed`` applies (reference ``workflow.py:108-118``)."""
    frac = Fraction(factor).limit_denominator(max_denom)
    # new_rate = old / factor  →  up = denominator, down = numerator
    out = scipy.signal.resample_poly(y.astype(np.float64), frac.denominator,
                                     frac.numerator)
    return out.astype(np.float32)


def nightcore_pair(duration: float = 60.0, sr: int = 22050, bpm: float = 128.0,
                   factor: float = 1.25, extra_pitch_st: float = 0.0,
                   seed: int = 0, **music_kwargs):
    """(nightcore, source) pair with known speed ``factor`` and optional
    additional pitch shift (crude spectral shift via resample + time-stretch
    is not attempted; ``extra_pitch_st`` instead re-renders the source with a
    transposed root, emulating an independent pitch shift).  Extra keyword
    arguments pass through to :func:`music_like`."""
    src = music_like(duration, sr, bpm=bpm, seed=seed, **music_kwargs)
    if extra_pitch_st:
        shifted = music_like(duration, sr, bpm=bpm,
                             root_hz=220.0 * 2.0 ** (extra_pitch_st / 12.0),
                             seed=seed, **music_kwargs)
        nc = speed_shift(shifted, factor)
    else:
        nc = speed_shift(src, factor)
    return nc, src
