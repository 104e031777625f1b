"""MELODIA-present branch coverage via a stubbed ``essentia.standard``.

The reference's optional essentia path (``pitch.py:187-241`` extraction and
the ±1.5 st accept gate at ``:274-289``) is mirrored in
``nightcore_analyzer_tpu/pitch.py:96-160`` but the library is absent in this
image, so every other test only exercises the probe-and-skip branch.  Here a
fake ``essentia.standard`` module is injected into ``sys.modules`` to drive
the extraction, voiced-frame filtering, subsample cap, failure handling, and
both sides of the agreement gate.
"""

import sys
import types

import numpy as np
import pytest

from nightcore_analyzer_tpu import pitch
from nightcore_analyzer_tpu.utils import synth

SR = 22050


def _install_fake_essentia(monkeypatch, contour_for):
    """Install ``essentia`` + ``essentia.standard`` stubs whose
    ``PredominantPitchMelodia`` returns ``contour_for(audio)`` per call."""

    class _Extractor:
        def __init__(self, frameSize=2048, hopSize=128, sampleRate=44100.0):
            # the reference constructs with these exact kwargs (pitch.py:196)
            assert frameSize == 2048 and hopSize == 128
            assert sampleRate == float(SR)

        def __call__(self, audio):
            hz = contour_for(np.asarray(audio))
            conf = np.ones_like(hz)
            return hz, conf

    std = types.ModuleType("essentia.standard")
    std.PredominantPitchMelodia = _Extractor
    root = types.ModuleType("essentia")
    root.standard = std
    monkeypatch.setitem(sys.modules, "essentia", root)
    monkeypatch.setitem(sys.modules, "essentia.standard", std)


def test_extraction_filters_unvoiced_and_subsamples(monkeypatch):
    """Zeros (unvoiced frames) are dropped; >2000 voiced frames are
    stride-subsampled (reference pitch.py:224-231)."""
    def contour(audio):
        n = 5000
        hz = np.full(n, 440.0, np.float32)
        hz[::3] = 0.0                      # a third of the frames unvoiced
        return hz

    _install_fake_essentia(monkeypatch, contour)
    got = pitch.estimate_pitch_melodia(
        np.zeros(SR, np.float32), np.zeros(SR, np.float32), SR)
    assert got is not None
    sv, nv = got
    for lst in (sv, nv):
        assert all(v == 440.0 for v in lst)        # no zeros survive
        # 5000 - ceil(5000/3) = 3333 voiced -> stride 3333//2000 = 1 keeps all;
        # make the cap itself bite with a bigger contour below
        assert len(lst) == 3333

    def contour_big(audio):
        return np.linspace(100.0, 900.0, 9000).astype(np.float32)

    _install_fake_essentia(monkeypatch, contour_big)
    got = pitch.estimate_pitch_melodia(
        np.zeros(SR, np.float32), np.zeros(SR, np.float32), SR)
    assert got is not None
    sv, _ = got
    assert len(sv) <= 2251                 # 9000[::4] = 2250: the cap bit
    assert len(sv) >= 2000


def test_extraction_failure_and_all_unvoiced_return_none(monkeypatch):
    def boom(audio):
        raise RuntimeError("essentia exploded")

    _install_fake_essentia(monkeypatch, boom)
    assert pitch.estimate_pitch_melodia(
        np.zeros(SR, np.float32), np.zeros(SR, np.float32), SR) is None

    _install_fake_essentia(
        monkeypatch, lambda a: np.zeros(64, np.float32))
    assert pitch.estimate_pitch_melodia(
        np.zeros(SR, np.float32), np.zeros(SR, np.float32), SR) is None


@pytest.fixture(scope="module")
def shifted_pair():
    """+2 st speed/pitch pair, same shapes as test_reference_api (warm jit)."""
    src = synth.music_like(25.0, SR, bpm=150.0, seed=8, chord_bars=0.5)
    nc = synth.speed_shift(src, 2.0 ** (2.0 / 12.0))
    return src, nc


def test_combined_accepts_agreeing_melodia(monkeypatch, shifted_pair):
    """MELODIA within ±1.5 st of chroma -> its lists are used and the method
    tag says so (reference pitch.py:274-283)."""
    src, nc = shifted_pair

    def contour(audio):
        hz = 440.0 if len(audio) == len(src) else 440.0 * 2.0 ** (2.0 / 12.0)
        return np.full(100, hz, np.float32)

    _install_fake_essentia(monkeypatch, contour)
    sv, nv, method = pitch.estimate_pitch_combined(src, nc, SR)
    assert method == "chroma+melodia"
    st = 12.0 * np.log2(np.median(nv) / np.median(sv))
    assert st == pytest.approx(2.0, abs=1e-6)      # the stub contour, exactly


def test_combined_rejects_disagreeing_melodia(monkeypatch, shifted_pair):
    """MELODIA beyond ±1.5 st of chroma -> chroma-only result; the f0
    fallback is NOT consulted (reference pitch.py:284-289: essentia present
    but rejected means no refinement)."""
    src, nc = shifted_pair
    logs = []

    def contour(audio):
        hz = 440.0 if len(audio) == len(src) else 440.0 * 2.0           # +12 st
        return np.full(100, hz, np.float32)

    _install_fake_essentia(monkeypatch, contour)
    sv, nv, method = pitch.estimate_pitch_combined(src, nc, SR,
                                                   log=logs.append)
    assert method == "chroma_xcorr"
    assert all(v == 440.0 for v in sv)
    st = 12.0 * np.log2(np.median(nv) / np.median(sv))
    assert st == pytest.approx(2.0, abs=0.34)      # 1/3-semitone chroma grid
    assert any("disagrees with chroma" in m for m in logs)
