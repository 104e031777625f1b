"""Spectral comparator + loudness (device spectral stats, peak scan,
limiter/gain file round-trips, ADJ paths, transcode grading)."""

import numpy as np
import pytest
import scipy.signal

from nightcore_analyzer_tpu import native, loudness, spectral

SR = 44100


def _music(dur=4.0, lowpass_hz=None, amp=0.5, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(dur * SR)) / SR
    y = np.zeros_like(t)
    for f, a in [(220, 0.4), (440, 0.25), (880, 0.15), (3000, 0.1),
                 (9000, 0.06), (15000, 0.04)]:
        y += a * np.sin(2 * np.pi * f * t)
    y += 0.02 * rng.normal(size=len(t))
    if lowpass_hz:
        sos = scipy.signal.butter(10, lowpass_hz, fs=SR, output="sos")
        y = scipy.signal.sosfilt(sos, y)
    y = y / np.max(np.abs(y)) * amp
    return y.astype(np.float32)


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("spec")
    full = d / "full.flac"
    cut = d / "cut.flac"
    native.encode_flac(str(full), _music(), SR)
    native.encode_flac(str(cut), _music(lowpass_hz=15500), SR)
    return full, cut


def test_spectral_analyze_fields(files):
    full, _ = files
    st = spectral.analyze(str(full))
    assert st.duration == pytest.approx(4.0, abs=0.05)
    assert 200 < st.centroid < 6000
    assert st.rolloff > 400
    assert st.rms_mean > 0.01
    assert st.bass > 0 and st.brilliance > 0
    assert st.effective_bandwidth_hz > 14000


def test_spectral_bandwidth_detects_lowpass(files):
    full, cut = files
    bw_full = spectral.analyze(str(full)).effective_bandwidth_hz
    bw_cut = spectral.analyze(str(cut)).effective_bandwidth_hz
    assert bw_full > 14500
    assert bw_cut < 16500          # graded as MP3-ish transcode
    assert spectral.transcode_grade(bw_cut) is not None
    assert spectral.transcode_grade(21000) is None


def test_compare_and_print_runs(files, capsys):
    full, cut = files
    a = spectral.analyze(str(full))
    b = spectral.analyze(str(cut))
    spectral.compare_and_print(a, b, "FULL", "CUT", str(full), str(cut))
    out = capsys.readouterr().out
    assert "SPECTRAL COMPARISON RESULTS" in out
    assert "FORMAT / QUALITY NOTE" in out
    assert "Effective bandwidth" in out


def test_detect_peak_and_clipping(tmp_path):
    y = _music(amp=0.5)
    p = tmp_path / "ok.flac"
    native.encode_flac(str(p), y, SR)
    peak, clip = loudness.detect_peak(p)
    assert peak == pytest.approx(20 * np.log10(0.5), abs=0.2)
    assert not clip

    # int16 clamps at ±1 so craft near-0 dBFS content via WAV float32
    yc = (y / np.max(np.abs(y))).astype(np.float32)
    pc = tmp_path / "clip.wav"
    native.encode_wav(str(pc), yc, SR, bits=32)
    peak_c, clip_c = loudness.detect_peak(pc)
    assert peak_c > -0.2


def test_make_adj_path():
    from pathlib import Path
    assert loudness.make_adj_path(Path("Song [Nightcore].flac"), 1).name == \
        "Song [Nightcore] ADJ1.flac"
    assert loudness.make_adj_path(Path("Song.flac"), 2).name == "Song ADJ2.flac"


def test_limiter_file_roundtrip(tmp_path):
    y = _music(amp=0.4)
    y[1000:1050] = 1.2
    src = tmp_path / "hot.wav"
    dst = tmp_path / "hot ADJ1.wav"
    native.encode_wav(str(src), y, SR, bits=32)
    loudness.apply_true_peak_limiter(src, dst, limit_db=-0.5)
    z, _ = native.decode_native(str(dst))
    assert np.max(np.abs(z)) <= 10 ** (-0.5 / 20) * 1.02


def test_gain_file_roundtrip(tmp_path):
    y = _music(amp=0.5)
    src = tmp_path / "g.flac"
    dst = tmp_path / "g ADJ1.flac"
    native.encode_flac(str(src), y, SR)
    loudness.apply_gain_reduction(src, dst, -6.0)
    z, _ = native.decode_native(str(dst))
    assert np.max(np.abs(z)) == pytest.approx(0.5 * 10 ** (-6 / 20), rel=0.01)
