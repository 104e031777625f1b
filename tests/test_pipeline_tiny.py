"""End-to-end behavior of the device analysis program at toy scale.

Runs on the CPU backend with a small config (short windows, few bootstrap
resamples) so compile stays fast; full-scale precision is exercised by
``bench.py`` on TPU hardware.  Oracle = synthetic pairs with known speed
factors (SURVEY §4).
"""

import numpy as np
import pytest

from nightcore_analyzer_tpu.config import AnalyzerConfig
from nightcore_analyzer_tpu.analyze.pipeline import analyze_arrays
from nightcore_analyzer_tpu.utils import synth

# toy-scale config: 3 s windows / 1.5 s hop, 5 s pitch chunks
TINY = AnalyzerConfig(
    max_duration_sec=30.0, window_sec=3.0, hop_sec=1.5,
    chunk_sec=5.0, n_bootstrap=128,
    max_beats=512, max_beats_window=32,
    frame_chunk=256, window_chunk=4,
    min_beats=3, ibi_min_ibis=3,
)

# 16/13 sits exactly on the windowed-tempo ACF lag grid at 3 s windows
# (src → lag 16, nc → lag 13), so the toy-scale classification isn't thrown
# off by BPM-grid quantization (the same quantization the reference
# documents in consensus.py:472-500).  The chroma grid then snaps the pitch
# ratio to the nearest 1/3 semitone: 12·log2(16/13)=3.589 st → lag 11.
FACTOR = 16.0 / 13.0
PITCH_EXPECT = 2.0 ** (11.0 / 36.0)


@pytest.fixture(scope="module")
def pair():
    src = synth.music_like(26.0, 22050, bpm=160.0, seed=3, chord_bars=0.5)
    nc = synth.speed_shift(src, FACTOR)
    return nc, src


@pytest.fixture(scope="module")
def analyzed(pair):
    nc, src = pair
    # patch bucket selection to our toy bucket by passing cfg directly
    res, pa = analyze_arrays(nc, src, TINY)
    return res, pa


def test_tempo_ratio_recovered(analyzed):
    res, _ = analyzed
    assert res.tempo_ratio == pytest.approx(FACTOR, rel=0.03)


def test_ibi_ratio_recovered(analyzed):
    res, _ = analyzed
    assert res.ibi_ratio is not None
    assert res.ibi_ratio == pytest.approx(FACTOR, rel=0.01)
    lo, hi = res.ibi_ci
    assert lo <= res.ibi_ratio <= hi


def test_pitch_ratio_recovered(analyzed):
    res, _ = analyzed
    assert res.n_source_pitch_windows >= 3
    assert res.pitch_ratio == pytest.approx(PITCH_EXPECT, rel=0.002)


def test_classification_pure_nightcore(analyzed):
    res, _ = analyzed
    assert res.classification == "pure_nightcore"


def test_rubberband_and_export(analyzed):
    from nightcore_analyzer_tpu import export
    res, _ = analyzed
    # primary block = best-estimate chain (round 5); windowed stays as the
    # labeled parity field
    rb = res.rubberband
    best = res.ibi_regression_ratio or res.ibi_ratio or res.tempo_ratio
    assert rb["time_ratio"] == pytest.approx(best, abs=1e-6)
    assert rb["windowed_time_ratio"] == pytest.approx(res.tempo_ratio, abs=1e-6)
    assert rb["time_source"] in ("ibi_regression", "ibi_median", "windowed")
    d = export.to_dict(res)
    assert d["classification"] == "pure_nightcore"
    assert d["durations"]["duration_ratio"] == pytest.approx(FACTOR, rel=0.01)
    import json
    json.dumps(d)   # serializable


def test_raw_window_data_for_histograms(analyzed):
    res, _ = analyzed
    assert res.src_tempos_raw and res.nc_tempos_raw
    vals = [t for t in res.src_tempos_raw if t is not None]
    assert vals and all(100 < t < 320 for t in vals)
    assert len(res.nc_pitches_raw) == res.n_nc_pitch_windows


def test_str_renders(analyzed):
    res, _ = analyzed
    s = str(res)
    assert "Tempo ratio" in s and "Rubber Band" in s


def test_silence_strip_applied():
    src = synth.music_like(12.0, 22050, bpm=160.0, seed=5)
    pad = np.zeros(22050 * 2, np.float32)
    res, pa = analyze_arrays(np.concatenate([pad, src / 1.0, pad]),
                             np.concatenate([pad, src, pad]), TINY)
    # both sides trimmed back to ~12 s
    assert res.nc_duration == pytest.approx(12.0, abs=0.3)
    assert res.src_duration == pytest.approx(12.0, abs=0.3)


def test_src_trim_sec():
    src = synth.music_like(20.0, 22050, bpm=160.0, seed=6)
    nc = synth.speed_shift(src[22050 * 4:], FACTOR)   # nc lacks 4 s intro
    cfg = TINY.replace(strip_silence=False)
    res, pa = analyze_arrays(nc, src, cfg, src_trim_sec=4.0)
    assert res.intro_offset_sec == pytest.approx(4.0, abs=0.05)
    assert res.ibi_ratio == pytest.approx(FACTOR, rel=0.01)


def test_all_gated_raises():
    quiet = np.zeros(22050 * 10, np.float32)
    with pytest.raises((RuntimeError, ValueError)):
        analyze_arrays(quiet, quiet, TINY)


def test_halftime_flip_device_path():
    """If the windowed estimator half-times the nightcore, the host consensus
    inverts the ratio (consensus.py:563-576).  Construct directly."""
    from nightcore_analyzer_tpu.analyze.consensus import build_result
    r = build_result([], [], [128.0] * 8, [104.0] * 8,
                     nc_duration=60.0, src_duration=75.0)
    assert r.tempo_ratio > 1.0


def test_auto_align_pipeline_path():
    """auto_align=True traces the align branch and trims a detected intro."""
    src_body = synth.music_like(20.0, 22050, bpm=160.0, seed=11, chord_bars=0.5)
    intro = 0.05 * synth.click_track(70.0, 6.0, 22050, click_hz=600.0)
    src = np.concatenate([intro, src_body]).astype(np.float32)
    nc = synth.speed_shift(src_body, FACTOR)
    cfg = TINY.replace(strip_silence=False,
                       align_speed_lo=1.1, align_speed_hi=1.4)
    res, pa = analyze_arrays(nc, src, cfg, auto_align=True)
    assert res.intro_offset_sec is not None
    assert res.intro_offset_sec == pytest.approx(6.0, abs=2.0)
    assert res.ibi_ratio == pytest.approx(FACTOR, rel=0.015)


def test_independent_pitch_shift_classification():
    """A pair with extra pitch processing on top of the speed-up classifies
    as independent_pitch_shift (reference consensus.py:315-336).

    The extra shift is kept at +1 st: chroma rotation is cyclic over the
    octave, so total shifts near ±6 st are inherently wrap-ambiguous (the
    reference's ±18-bin wrap, pitch.py:77-85, has the same property)."""
    nc, src = synth.nightcore_pair(duration=26.0, bpm=160.0,
                                   factor=FACTOR, extra_pitch_st=1.0,
                                   seed=12, chord_bars=0.5)
    res, pa = analyze_arrays(nc, src, TINY)
    total_st = 12 * np.log2(res.pitch_ratio)
    speed_st = 12 * np.log2(FACTOR)
    assert total_st == pytest.approx(speed_st + 1.0, abs=0.34)
    assert res.classification == "independent_pitch_shift"


def test_ibi_regression_estimator(analyzed):
    """Beat-time LS-slope estimator: present, finer than the median path
    (the median is bounded by hop-64 grid quantization; the regression
    averages the grid noise of every beat timestamp)."""
    res, _ = analyzed
    assert res.ibi_regression_ratio is not None
    reg_err = abs(res.ibi_regression_ratio / FACTOR - 1.0)
    med_err = abs(res.ibi_ratio / FACTOR - 1.0)
    assert reg_err < 5e-3
    assert reg_err <= med_err + 1e-4


def test_ibi_ls_slope_exact_on_clean_ibis():
    """Masked LS slope recovers the exact interval from noisy-masked IBIs."""
    import jax.numpy as jnp
    from nightcore_analyzer_tpu.models.analyzer import _ibi_ls_slope
    ibi = 0.42
    vals = np.full((1, 20), ibi, np.float32)
    mask = np.ones((1, 20), bool)
    mask[0, 7] = False                       # a glitch-filtered hole
    vals[0, 7] = 99.0                        # masked value must not matter
    slope = float(_ibi_ls_slope(jnp.asarray(vals), jnp.asarray(mask))[0])
    assert slope == pytest.approx(ibi, rel=1e-6)


def test_octave_rescue_veto_on_excerpted_nightcore():
    """End-to-end different-edits veto through the REAL pipeline: the
    nightcore is a speed-shifted EXCERPT (first half) of the source, so
    the duration ratio (~2/FACTOR·... ≈ 2×true) sits exactly on an octave
    multiple of the correct regression ratio.  Round 3's unconditional
    duration arbitration would have doubled every IBI estimator here; the
    round-4 veto (windowed corroborates the raw regression against the
    durations) must leave them alone and surface the different-edits
    warning instead.  Also validated on the real chip at 55 s
    (BENCH_NOTES round-4 notes)."""
    src = synth.music_like(26.0, 22050, bpm=160.0, seed=5, chord_bars=0.5)
    nc = synth.speed_shift(src[: len(src) // 2], FACTOR)
    res, _ = analyze_arrays(nc, src, TINY)
    assert res.ibi_octave_corrected is None
    assert res.ibi_regression_ratio == pytest.approx(FACTOR, rel=0.01)
    assert any("different edits" in w for w in res.warnings)
    assert not any("octave rescue" in w for w in res.warnings)
