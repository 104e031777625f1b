"""Auto-align (intro-offset detection) and waveform-xcorr verification."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nightcore_analyzer_tpu.config import AnalyzerConfig
from nightcore_analyzer_tpu.ops.align import find_content_offset
from nightcore_analyzer_tpu.ops.verify import estimate_speed_xcorr_arrays
from nightcore_analyzer_tpu.utils import synth

CFG = AnalyzerConfig(max_duration_sec=60.0)


def _pad(y):
    buf = np.zeros(CFG.max_samples, np.float32)
    buf[:len(y)] = y
    return jnp.asarray(buf), jnp.asarray(len(y), jnp.int32)


def test_find_content_offset_detects_intro():
    sr = 22050
    body = synth.music_like(30.0, sr, bpm=150.0, seed=2)
    intro = 0.05 * synth.click_track(80.0, 8.0, sr, click_hz=700.0)
    src = np.concatenate([intro, body]).astype(np.float32)
    nc = synth.speed_shift(body, 1.25)

    fn = jax.jit(lambda s, n, ns_, nn_: find_content_offset(s, n, ns_, nn_, CFG))
    s, ns_ = _pad(src)
    m, nn_ = _pad(nc)
    off, speed = fn(s, m, ns_, nn_)
    # envelope alignment on bar-repetitive material can lock a bar off —
    # the reference documents auto-align as approximate (xcorr.py:44-51)
    assert float(off) == pytest.approx(8.0, abs=2.0)
    assert float(speed) == pytest.approx(1.25, abs=0.05)


def test_xcorr_verify_same_speed():
    sr = 22050
    y = synth.music_like(40.0, sr, bpm=140.0, seed=4)
    # slightly different renditions of the same content at the same speed
    a = y + 0.01 * np.random.default_rng(0).normal(size=len(y)).astype(np.float32)
    fn = jax.jit(lambda a_, na, b_, nb: estimate_speed_xcorr_arrays(
        a_, b_, na, nb, CFG))
    ya, na = _pad(a)
    yb, nb = _pad(y)
    ratio, quality = fn(ya, na, yb, nb)
    # the exhaustive FFT search (round 3) finds the exact alignment: slope
    # sample-exact, quality ≈ the windows' true cosine (≈1 here, the two
    # renditions differ only by 1% additive noise)
    assert float(ratio) == pytest.approx(1.0, abs=1e-4)
    assert float(quality) > 0.9


def test_xcorr_verify_speed_offset():
    sr = 22050
    y = synth.music_like(40.0, sr, bpm=140.0, seed=5)
    b = synth.speed_shift(y, 1.02)         # 2% faster — within ±5% search
    fn = jax.jit(lambda a_, na, b_, nb: estimate_speed_xcorr_arrays(
        a_, b_, na, nb, CFG))
    ya, na = _pad(y)
    yb, nb = _pad(b)
    ratio, quality = fn(ya, na, yb, nb)
    # file B runs 2% faster → its positions advance ~2% more slowly.
    # A 2% residual drifts content ~60 ms across each 3 s window, far past
    # a pitch period, so per-window peaks can lock to beat-aligned lags —
    # the Theil-Sen fit keeps the slope usable even so (the reference's
    # quality gate would flag this pair as low-confidence, correctly)
    assert float(ratio) == pytest.approx(1.0 / 1.02, abs=0.02)


def test_xcorr_verify_silent_returns_sentinel():
    silent = np.zeros(22050 * 20, np.float32)
    fn = jax.jit(lambda a_, na, b_, nb: estimate_speed_xcorr_arrays(
        a_, b_, na, nb, CFG))
    ya, na = _pad(silent)
    ratio, quality = fn(ya, na, ya, na)
    assert float(ratio) == 1.0
    assert float(quality) == 0.0
