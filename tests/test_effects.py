"""Effects: speed change, phase-vocoder stretch/pitch-shift, limiter, gain."""

import numpy as np
import pytest

from nightcore_analyzer_tpu.effects import (change_speed, time_stretch,
                                            pitch_shift, true_peak_limit,
                                            apply_gain)
from nightcore_analyzer_tpu.effects.speed import create_speed_changed_file
from nightcore_analyzer_tpu import native

SR = 22050


def _tone(freq, dur=3.0, amp=0.5):
    t = np.arange(int(dur * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _peak_freq(y, sr=SR):
    n = 1 << 15
    seg = y[len(y) // 4:len(y) // 4 + n]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    return np.fft.rfftfreq(len(seg), 1 / sr)[np.argmax(spec)]


def test_change_speed_duration_and_pitch():
    y = _tone(440.0, 4.0)
    out = change_speed(y, SR, 1.25)
    assert len(out) == pytest.approx(len(y) / 1.25, rel=0.001)
    assert _peak_freq(out) == pytest.approx(440.0 * 1.25, rel=0.01)


def test_time_stretch_preserves_pitch():
    y = _tone(440.0, 4.0)
    out = time_stretch(y, SR, 1.3)
    assert len(out) == pytest.approx(len(y) * 1.3, rel=0.02)
    assert _peak_freq(out) == pytest.approx(440.0, rel=0.01)


def test_pitch_shift_preserves_duration():
    y = _tone(330.0, 4.0)
    out = pitch_shift(y, SR, 3.0)               # +3 st
    assert len(out) == len(y)
    assert _peak_freq(out) == pytest.approx(330.0 * 2 ** (3 / 12), rel=0.01)


def test_pitch_shift_down():
    y = _tone(440.0, 3.0)
    out = pitch_shift(y, SR, -2.0)
    assert _peak_freq(out) == pytest.approx(440.0 * 2 ** (-2 / 12), rel=0.01)


def test_true_peak_limiter_shaves_only_peaks():
    rng = np.random.default_rng(0)
    y = (0.15 * rng.normal(size=SR * 2)).astype(np.float32)  # peaks ~0.65
    y[SR // 2:SR // 2 + 50] = 1.4               # clipping burst
    out = true_peak_limit(y, SR, limit_db=-0.1)
    limit = 10 ** (-0.1 / 20)
    assert np.max(np.abs(out)) <= limit * 1.01
    # quiet region well before the burst is untouched
    np.testing.assert_allclose(out[:SR // 4], y[:SR // 4], atol=1e-4)


def test_apply_gain():
    y = _tone(440.0, 1.0)
    out = apply_gain(y, -6.0)
    assert np.max(np.abs(out)) == pytest.approx(0.5 * 10 ** (-6 / 20), rel=1e-4)


def test_create_speed_changed_file_native(tmp_path):
    y = _tone(440.0, 3.0)
    src = tmp_path / "in.flac"
    dst = tmp_path / "out.flac"
    native.encode_flac(str(src), y, SR)
    create_speed_changed_file(src, dst, 1.25, prefer_sox=False)
    z, sr = native.decode_native(str(dst))
    assert sr == SR
    assert len(z) == pytest.approx(len(y) / 1.25, rel=0.01)
