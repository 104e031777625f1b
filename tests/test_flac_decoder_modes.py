"""FLAC decoder conformance: stereo decorrelation modes + LPC subframes.

The first-party encoder only emits mono fixed-predictor streams, so these
paths — which every real-world FLAC uses — are exercised with a minimal
bit-level FLAC writer built here in the test (verbatim + LPC subframes,
left/side, right/side, mid/side channel assignments).
"""

import numpy as np
import pytest

from nightcore_analyzer_tpu import native


class BW:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.n = 0

    def bits(self, v, nbits):
        for i in range(nbits - 1, -1, -1):
            self.cur = (self.cur << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.bytes.append(self.cur)
                self.cur = 0
                self.n = 0

    def sbits(self, v, nbits):
        self.bits(v & ((1 << nbits) - 1), nbits)

    def align(self):
        while self.n:
            self.bits(0, 1)


def crc8(data):
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data):
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def write_flac(path, left, right, mode, sr=22050, lpc=False):
    """One-frame stereo FLAC with the given channel assignment.

    mode: 'indep' | 'LS' | 'RS' | 'MS'.  Subframes are verbatim, or (for
    ``lpc=True``) a first-order LPC subframe on channel 0.
    """
    n = len(left)
    hdr = bytearray(b"fLaC")
    si = bytearray(38)
    si[0] = 0x80
    si[3] = 34
    p = memoryview(si)[4:]
    p[0], p[1], p[2], p[3] = n >> 8 & 0xFF, n & 0xFF, n >> 8 & 0xFF, n & 0xFF
    p[10] = (sr >> 12) & 0xFF
    p[11] = (sr >> 4) & 0xFF
    p[12] = ((sr & 0xF) << 4) | ((2 - 1) << 1) | (((16 - 1) >> 4) & 1)
    p[13] = (((16 - 1) & 0xF) << 4)
    p[17] = n & 0xFF
    p[16] = (n >> 8) & 0xFF

    side = [int(a) - int(b) for a, b in zip(left, right)]
    mid = [(int(a) + int(b)) >> 1 for a, b in zip(left, right)]
    chans = {"indep": (left, right, 0b0001, (16, 16)),
             "LS": (left, side, 0b1000, (16, 17)),
             "RS": (side, right, 0b1001, (17, 16)),
             "MS": (mid, side, 0b1010, (16, 17))}[mode]
    ch0, ch1, ch_code, bps = chans

    bw = BW()
    bw.bits(0x3FFE, 14)
    bw.bits(0, 1)
    bw.bits(0, 1)
    bw.bits(0b0111, 4)            # 16-bit blocksize follows
    bw.bits(0, 4)                 # sr from streaminfo
    bw.bits(ch_code, 4)
    bw.bits(0b100, 3)             # 16 bps
    bw.bits(0, 1)
    bw.bits(0, 8)                 # frame number 0 (utf8)
    bw.bits(n - 1, 16)
    bw.align()
    bw.bits(crc8(bytes(bw.bytes)), 8)

    def verbatim(samples, nbits):
        bw.bits(0, 1)
        bw.bits(0b000001, 6)
        bw.bits(0, 1)
        for s in samples:
            bw.sbits(int(s), nbits)

    def lpc1(samples, nbits):
        """order-1 LPC: coef=1 (qlp precision 4, shift 0) → residual = diff."""
        bw.bits(0, 1)
        bw.bits(0b100000, 6)      # LPC order 1
        bw.bits(0, 1)
        bw.sbits(int(samples[0]), nbits)      # warmup
        bw.bits(4 - 1, 4)                     # qlp precision 4
        bw.sbits(0, 5)                        # shift 0
        bw.sbits(1, 4)                        # coefficient +1
        # residual: method 0, partition order 0, escape (raw nbits+1)
        bw.bits(0, 2)
        bw.bits(0, 4)
        bw.bits(0xF, 4)                       # escape
        bw.bits(nbits + 1, 5)
        for i in range(1, len(samples)):
            bw.sbits(int(samples[i]) - int(samples[i - 1]), nbits + 1)

    for ch, nbits in zip((ch0, ch1), bps):
        if lpc and ch is ch0:
            lpc1(ch, nbits)
        else:
            verbatim(ch, nbits)
    bw.align()
    fcrc = crc16(bytes(bw.bytes))
    bw.bits(fcrc >> 8, 8)
    bw.bits(fcrc & 0xFF, 8)

    with open(path, "wb") as fh:
        fh.write(bytes(hdr) + bytes(si) + bytes(bw.bytes))


@pytest.fixture(scope="module")
def stereo():
    rng = np.random.default_rng(0)
    n = 512
    left = (rng.integers(-3000, 3000, n)).astype(np.int64)
    right = (left * 0.6 + rng.integers(-500, 500, n)).astype(np.int64)
    return left, right


@pytest.mark.parametrize("mode", ["indep", "LS", "RS", "MS"])
def test_stereo_modes_decode_to_mono_mix(tmp_path, stereo, mode):
    left, right = stereo
    p = str(tmp_path / f"{mode}.flac")
    write_flac(p, left, right, mode)
    y, sr = native.decode_native(p)
    assert sr == 22050 and len(y) == len(left)
    want = (left + right) / 2.0 / 32768.0
    np.testing.assert_allclose(y, want, atol=1.0 / 32768.0)


def test_lpc_subframe_decodes(tmp_path, stereo):
    left, right = stereo
    p = str(tmp_path / "lpc.flac")
    write_flac(p, left, right, "indep", lpc=True)
    y, sr = native.decode_native(p)
    want = (left + right) / 2.0 / 32768.0
    np.testing.assert_allclose(y, want, atol=1.0 / 32768.0)
