"""Native C++ audio runtime: FLAC/WAV round-trips, resampler, peak scan."""

import os

import numpy as np
import pytest
import scipy.signal

from nightcore_analyzer_tpu import native


@pytest.fixture(scope="module")
def tone():
    t = np.arange(22050 * 3) / 22050
    y = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 1230 * t)
    return y.astype(np.float32)


def _quant16(x):
    return np.round(np.clip(x, -1, 32767 / 32768) * 32768) / 32768


def test_wav_roundtrip_16(tmp_path, tone):
    p = str(tmp_path / "t.wav")
    native.encode_wav(p, tone, 22050, bits=16)
    y, sr = native.decode_native(p)
    assert sr == 22050 and len(y) == len(tone)
    np.testing.assert_allclose(y, _quant16(tone), atol=2 / 32768)


def test_wav_roundtrip_24(tmp_path, tone):
    p = str(tmp_path / "t24.wav")
    native.encode_wav(p, tone, 44100, bits=24)
    y, sr = native.decode_native(p)
    assert sr == 44100
    np.testing.assert_allclose(y, tone, atol=2 / 8388608)


def test_flac_roundtrip(tmp_path, tone, rng):
    noisy = (tone + 0.05 * rng.normal(size=len(tone)).astype(np.float32))
    p = str(tmp_path / "t.flac")
    native.encode_flac(p, noisy, 22050)
    y, sr = native.decode_native(p)
    assert sr == 22050 and len(y) == len(noisy)
    np.testing.assert_allclose(y, _quant16(noisy), atol=2 / 32768)
    # FLAC should actually compress vs raw 16-bit
    assert os.path.getsize(p) < len(noisy) * 2


def test_flac_smaller_than_wav_on_music(tmp_path):
    from nightcore_analyzer_tpu.utils import synth
    y = synth.music_like(5.0, 22050)
    wav, flac = str(tmp_path / "m.wav"), str(tmp_path / "m.flac")
    native.encode_wav(wav, y, 22050)
    native.encode_flac(flac, y, 22050)
    assert os.path.getsize(flac) < os.path.getsize(wav)


def test_resample_tone_preserves_frequency():
    # 440 Hz tone resampled 44100→22050 must stay 440 Hz with same amplitude
    t = np.arange(44100 * 2) / 44100
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    z = native.resample(y, 44100, 22050)
    assert abs(len(z) - 22050 * 2) <= 2
    spec = np.abs(np.fft.rfft(z[1000:1000 + 32768] * np.hanning(32768)))
    f = np.fft.rfftfreq(32768, 1 / 22050)
    assert abs(f[np.argmax(spec)] - 440.0) < 2.0
    assert np.max(np.abs(z[1000:-1000])) == pytest.approx(0.5, rel=0.02)


def test_resample_vs_scipy_rational():
    rng = np.random.default_rng(5)
    y = rng.normal(size=48000).astype(np.float32)
    # band-limit so both filters agree away from the transition band
    y = scipy.signal.sosfilt(
        scipy.signal.butter(8, 6000, fs=48000, output="sos"), y).astype(np.float32)
    z = native.resample(y, 48000, 22050)
    ref = scipy.signal.resample_poly(y.astype(np.float64), 147, 320)
    m = min(len(z), len(ref))
    err = z[500:m - 500] - ref[500:m - 500]
    assert np.sqrt(np.mean(err ** 2)) < 1e-3


def test_decode_audio_resamples(tmp_path, tone):
    p = str(tmp_path / "t.flac")
    native.encode_flac(p, tone, 22050)
    y = native.decode_audio(p, 11025)
    assert abs(len(y) - len(tone) // 2) <= 2


def test_peak_dbfs(tone):
    assert native.peak_dbfs(tone) == pytest.approx(
        20 * np.log10(np.max(np.abs(tone))), abs=1e-3)


def test_decode_error_surface(tmp_path):
    bad = tmp_path / "x.flac"
    bad.write_bytes(b"not audio at all")
    with pytest.raises(native.NativeAudioError):
        native.decode_native(str(bad))
    with pytest.raises(native.NativeAudioError):
        native.decode_native(str(tmp_path / "missing.flac"))


def test_decode_corruption_fuzz(tmp_path, tone):
    """Truncated and bit-flipped FLAC/WAV must decode or raise
    NativeAudioError — never crash the host process (the decoder runs
    in-process on untrusted files; round-1 advisory found heap overflows
    here, so this pins the hardening).  Deterministic seed."""
    rng = np.random.default_rng(0xC0DEC)
    paths = []
    f = tmp_path / "t.flac"
    native.encode_flac(str(f), tone, 22050)
    paths.append(f)
    w = tmp_path / "t.wav"
    native.encode_wav(str(w), tone, 22050)
    paths.append(w)
    for p in paths:
        data = bytearray(p.read_bytes())
        for cut in (8, len(data) // 3, len(data) - 5):
            q = tmp_path / f"cut_{p.suffix[1:]}_{cut}{p.suffix}"
            q.write_bytes(bytes(data[:cut]))
            try:
                native.decode_native(str(q))
            except native.NativeAudioError:
                pass
        for trial in range(20):
            mut = bytearray(data)
            for _ in range(rng.integers(1, 24)):
                mut[int(rng.integers(0, len(mut)))] = int(rng.integers(256))
            q = tmp_path / f"mut_{p.suffix[1:]}_{trial}{p.suffix}"
            q.write_bytes(bytes(mut))
            try:
                native.decode_native(str(q))
            except native.NativeAudioError:
                pass
