"""Lossy-format decode (MP3/OGG/M4A via the system libav*), crafted-file
hardening, per-channel peak detection, and LPC FLAC encoder conformance.

The reference loads lossy audio through librosa → audioread → ffmpeg
(reference io.py:54, requirements.txt:24); these tests cover the same
capability in the native runtime, plus cross-validation of the first-party
FLAC codec against ffmpeg's FLAC implementation (independent oracle).
"""

import struct

import numpy as np
import pytest

from nightcore_analyzer_tpu import native
from tests.test_flac_decoder_modes import BW, crc8, crc16

SR = 22050

pytestmark = pytest.mark.skipif(
    not native.has_lossy_codecs(),
    reason="built without libav* (lossy decode unavailable)")


@pytest.fixture(scope="module")
def tone():
    t = np.arange(SR * 3) / SR
    return (0.4 * np.sin(2 * np.pi * 440 * t)
            + 0.15 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)


def _dominant_freq(y, sr):
    seg = y[len(y) // 4: len(y) // 4 + 16384]
    w = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    return np.fft.rfftfreq(len(seg), 1.0 / sr)[w.argmax()]


@pytest.mark.parametrize("ext,codec,bitrate", [
    ("mp3", "libmp3lame", 128_000),
    ("ogg", "libvorbis", 64_000),
    ("m4a", "aac", 96_000),
])
def test_lossy_roundtrip(tmp_path, tone, ext, codec, bitrate):
    p = tmp_path / f"tone.{ext}"
    native.encode_lossy(str(p), tone, SR, codec, bitrate)
    y, sr, pk = native.decode_native_peak(str(p))
    assert sr == SR
    # codecs pad to frame boundaries; length within one long frame
    assert abs(len(y) - len(tone)) <= 4096
    assert abs(_dominant_freq(y, sr) - 440.0) < 2.0
    assert 0.3 < pk < 0.8


def test_mp3_decode_through_io_layer(tmp_path, tone):
    """The signal layer must load .mp3 like any other container."""
    from nightcore_analyzer_tpu.signal.io import load_audio
    p = tmp_path / "t.mp3"
    native.encode_lossy(str(p), tone, SR, "libmp3lame", 160_000)
    y, sr = load_audio(str(p), sr=SR)
    assert sr == SR
    assert abs(_dominant_freq(np.asarray(y), sr) - 440.0) < 2.0


def test_flac_encoder_vs_ffmpeg_oracle(tmp_path, tone):
    """Our (LPC) FLAC encode must decode bit-compatibly in *ffmpeg's*
    decoder — an author-independent conformance check."""
    p = tmp_path / "enc.flac"
    native.encode_flac(str(p), tone, SR)
    ours, sr1 = native.decode_native(str(p))
    ff, sr2 = native.decode_oracle(str(p))
    assert sr1 == sr2 == SR
    assert len(ff) == len(ours) == len(tone)
    assert np.max(np.abs(ours - ff)) < 1e-6          # same decoded ints
    assert np.max(np.abs(ours - tone)) < 2e-4        # 16-bit quantization


def test_flac_decoder_vs_ffmpeg_encoder(tmp_path, tone):
    """ffmpeg's FLAC encode (its own subframe/partition choices) must
    decode exactly in our first-party decoder."""
    p = tmp_path / "ffenc.flac"
    native.encode_lossy(str(p), tone, SR, "flac", 0)
    ours, sr1 = native.decode_native(str(p))
    ff, sr2 = native.decode_oracle(str(p))
    assert sr1 == sr2 == SR
    assert len(ours) == len(ff)
    assert np.max(np.abs(ours - ff)) < 1e-6


def test_lpc_beats_fixed_on_tonal(tmp_path):
    """Order-8 LPC should compress a tonal signal well below the raw size
    (the round-1 fixed-predictor encoder left ~2x on the table)."""
    t = np.arange(SR * 4) / SR
    x = (0.5 * np.sin(2 * np.pi * 220 * t) * (1 + 0.2 * np.sin(2 * np.pi * 3 * t))
         ).astype(np.float32)
    p = tmp_path / "lpc.flac"
    native.encode_flac(str(p), x, SR)
    raw_bytes = len(x) * 2
    assert p.stat().st_size < 0.45 * raw_bytes
    y, _ = native.decode_native(str(p))
    assert np.max(np.abs(y - x)) < 2e-4


# ── crafted-file hardening (round-1 advisor findings) ──────────────────────

def test_wav_zero_bits_rejected(tmp_path):
    """fmt chunk declaring bits=0 must error, not SIGFPE the host."""
    hdr = (b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 2, SR, 0, 0, 0)
           + b"data" + struct.pack("<I", 8) + b"\x00" * 8)
    p = tmp_path / "bad.wav"
    p.write_bytes(hdr)
    with pytest.raises(native.NativeAudioError):
        native.decode_native(str(p))


def test_flac_order_exceeding_blocksize_rejected(tmp_path):
    """LPC order 32 with blocksize 4: warmup samples would write past the
    block — must fail cleanly (ASan-confirmed heap overflow in round 1)."""
    n = 4
    hdr = bytearray(b"fLaC")
    si = bytearray(38)
    si[0] = 0x80
    si[3] = 34
    p = memoryview(si)[4:]
    p[0], p[1], p[2], p[3] = 0, n, 0, n
    p[10] = (SR >> 12) & 0xFF
    p[11] = (SR >> 4) & 0xFF
    p[12] = ((SR & 0xF) << 4) | ((1 - 1) << 1) | (((16 - 1) >> 4) & 1)
    p[13] = ((16 - 1) & 0xF) << 4
    p[17] = n

    bw = BW()
    bw.bits(0x3FFE, 14)
    bw.bits(0, 2)
    bw.bits(0b0111, 4)            # 16-bit blocksize follows
    bw.bits(0, 4)
    bw.bits(0, 4)                 # 1 channel
    bw.bits(0b100, 3)             # 16 bps
    bw.bits(0, 1)
    bw.bits(0, 8)                 # frame number 0
    bw.bits(n - 1, 16)
    bw.align()
    bw.bits(crc8(bytes(bw.bytes)), 8)
    bw.bits(0, 1)
    bw.bits(0b111111, 6)          # LPC order 32
    bw.bits(0, 1)
    for _ in range(32):           # 32 warmup samples into a 4-sample block
        bw.sbits(1, 16)
    bw.bits(3, 4)                 # precision 4
    bw.sbits(0, 5)
    for _ in range(32):
        bw.sbits(1, 4)
    bw.bits(0, 2)
    bw.bits(0, 4)
    bw.bits(0, 4)
    bw.align()
    fcrc = crc16(bytes(bw.bytes))
    bw.bits(fcrc >> 8, 8)
    bw.bits(fcrc & 0xFF, 8)

    pth = tmp_path / "evil.flac"
    pth.write_bytes(bytes(hdr) + bytes(si) + bytes(bw.bytes))
    with pytest.raises(native.NativeAudioError):
        native.decode_native(str(pth))


def test_mp3_pair_recovers_speed_factor(tmp_path):
    """Full analysis of an MP3 nightcore against a FLAC source — the
    reference's primary use case (lossy YouTube rip vs lossless source,
    reference README) — must recover the known factor."""
    from nightcore_analyzer_tpu.analyze.pipeline import analyze_arrays
    from nightcore_analyzer_tpu.signal.io import load_audio
    from nightcore_analyzer_tpu.utils import synth
    from tests.test_pipeline_tiny import TINY, FACTOR

    src = synth.music_like(26.0, SR, bpm=160.0, seed=3, chord_bars=0.5)
    nc = synth.speed_shift(src, FACTOR)
    src_p, nc_p = tmp_path / "src.flac", tmp_path / "nc.mp3"
    native.encode_flac(str(src_p), src.astype(np.float32), SR)
    native.encode_lossy(str(nc_p), nc.astype(np.float32), SR, "libmp3lame",
                        192_000)
    nc_y, sr = load_audio(str(nc_p))
    src_y, _ = load_audio(str(src_p), sr=sr)
    res, _ = analyze_arrays(np.asarray(nc_y), np.asarray(src_y), TINY)
    assert res.ibi_ratio == pytest.approx(FACTOR, rel=0.01)
    assert res.tempo_ratio == pytest.approx(FACTOR, rel=0.03)


def test_detect_peak_sees_per_channel_clipping(tmp_path):
    """A clipped left channel with silent right must trip the clipping
    detector even though the mono mixdown peaks at ~0.5 (-6 dBFS)."""
    from nightcore_analyzer_tpu.loudness import detect_peak
    n = 2000
    inter = np.zeros(2 * n, np.float32)
    inter[0::2] = 1.0             # L hard-clipped
    pcm = (np.clip(inter, -1, 32767 / 32768) * 32768).astype("<i2").tobytes()
    wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 2, SR, SR * 4, 4, 16)
           + b"data" + struct.pack("<I", len(pcm)) + pcm)
    p = tmp_path / "clipL.wav"
    p.write_bytes(wav)
    peak_db, clipping = detect_peak(p)
    assert peak_db > -0.1
    y, _, pk = native.decode_native_peak(str(p))
    assert np.abs(y).max() < 0.51          # mixdown hides the clip
    assert pk > 0.99                       # per-channel peak sees it


def test_probe_duration_headers_only(tmp_path, tone):
    """Duration probe reads container headers, no decode: FLAC, WAV, MP3."""
    for name, enc in [
        ("t.flac", lambda p: native.encode_flac(p, tone, SR)),
        ("t.wav", lambda p: native.encode_wav(p, tone, SR)),
        ("t.mp3", lambda p: native.encode_lossy(p, tone, SR, "libmp3lame",
                                                128_000)),
    ]:
        p = tmp_path / name
        enc(str(p))
        d = native.probe_duration(str(p))
        assert d == pytest.approx(3.0, abs=0.1), name
    with pytest.raises(native.NativeAudioError):
        native.probe_duration(str(tmp_path / "nope.flac"))
