"""Reference-surface compatibility: every public symbol of the reference's
module map resolves and behaves (SURVEY §1 public interfaces table)."""

import numpy as np
import pytest

from nightcore_analyzer_tpu.utils import synth


def test_package_root_exports():
    import nightcore_analyzer_tpu as pkg
    assert callable(pkg.run)
    assert pkg.AnalysisResult is not None
    assert hasattr(pkg.export, "export_json")
    assert hasattr(pkg.session, "set_many")
    assert pkg.__version__


def test_io_module_surface():
    from nightcore_analyzer_tpu import io
    assert io.SAMPLE_RATE == 22050
    assert io.WINDOW_SEC == 10.0 and io.HOP_SEC == 5.0
    y = synth.click_track(120.0, 12.0)
    wins = io.slice_windows(y, io.SAMPLE_RATE, 4.0, 2.0)
    assert len(wins) == 5
    assert all(len(w.audio) == 4 * 22050 for w in wins)
    gated = io.energy_gate(wins, -40.0)
    assert 0 < len(gated) <= len(wins)
    trimmed, lead, trail = io.strip_silence(
        np.concatenate([np.zeros(22050, np.float32), y]), io.SAMPLE_RATE)
    assert lead == pytest.approx(1.0, abs=0.1)


def test_tempo_module_surface():
    from nightcore_analyzer_tpu import io, tempo
    assert tempo.MIN_BEATS == 4 and tempo.IBI_HOP_LENGTH == 64
    y = synth.click_track(120.0, 12.0)
    wins = io.slice_windows(y, 22050, 10.0, 5.0)
    vals = tempo.batch_estimate_tempo(wins[:1])
    assert len(vals) == 1
    assert vals[0] == pytest.approx(120.0, rel=0.05)

    ibis = tempo.estimate_ibis_global(y, 22050)
    assert ibis is not None and len(ibis) >= 10
    assert np.median(ibis) == pytest.approx(0.5, rel=0.02)


def test_pitch_module_surface():
    from nightcore_analyzer_tpu import pitch
    assert pitch.CHROMA_BINS_PER_OCTAVE == 36
    sr = 22050
    src = synth.music_like(25.0, sr, bpm=150.0, seed=8, chord_bars=0.5)
    nc = synth.speed_shift(src, 2.0 ** (2.0 / 12.0))   # +2 st
    src_hz, nc_hz, method = pitch.estimate_pitch_combined(src, nc, sr)
    # without essentia the refinement leg is the first-party tracker; it is
    # accepted only within ±1.5 st of chroma (reference pitch.py:274-289)
    assert method in ("chroma_xcorr", "chroma+tpu_f0")
    st = 12 * np.log2(np.median(nc_hz) / np.median(src_hz))
    if method == "chroma_xcorr":
        assert all(v == 440.0 for v in src_hz)
        assert st == pytest.approx(2.0, abs=0.34)   # 1/3-semitone grid
    else:
        assert st == pytest.approx(2.0, abs=1.5)    # inside the accept gate
    assert pitch.estimate_pitch_melodia(src, nc, sr) is None  # no essentia


def test_xcorr_module_surface(tmp_path):
    from nightcore_analyzer_tpu import xcorr, native
    assert xcorr.ALIGN_MIN_OFFSET == 1.0
    y = synth.music_like(30.0, 22050, bpm=145.0, seed=9)
    a = tmp_path / "a.flac"
    b = tmp_path / "b.flac"
    native.encode_flac(str(a), y, 22050)
    native.encode_flac(str(b), y, 22050)
    ratio, quality = xcorr.estimate_speed_xcorr(a, b)
    assert ratio == pytest.approx(1.0, abs=0.02)
    assert xcorr.quality_label(0.8) == "good match"


def test_consensus_module_surface():
    from nightcore_analyzer_tpu.analyze import consensus
    assert callable(consensus.build_result)
    assert callable(consensus.compute_ibi_ratio)
