"""Effects-chain validation corpus: every sanity-warning rule fires on
exactly its designed trigger, end-to-end through the analysis program
(reference ``consensus.py:384-515``), plus the lossy-transcode detector
(``spectral.py:288-298``).

Inputs are rendered with the first-party effects chain (speed change,
phase-vocoder pitch shift, limiter) — the same operations a real nightcore
creator applies — so the warnings are exercised by *audio*, not by
hand-built result objects, except for the no-duration branch which is only
reachable through the reference-compatible list API (``build_result`` with
durations omitted), exactly as in the reference.
"""

import numpy as np
import pytest

from nightcore_analyzer_tpu.analyze.pipeline import analyze_arrays
from nightcore_analyzer_tpu.utils import synth
from tests.test_pipeline_tiny import TINY

SR = 22050


def _warns(res, key):
    return [w for w in res.warnings if key in w]


# 1. half-time artefact auto-correction (flip + explanation)
def test_halftime_flip_warning():
    """Raw ratio < 1 while the 'nightcore' is >=1% shorter: the flip rule
    inverts the ratio and explains itself (consensus.py:563-576)."""
    src = synth.music_like(26.0, SR, bpm=160.0, seed=11, chord_bars=0.5)
    slowed = synth.speed_shift(src, 0.8)          # runs slower…
    nc = slowed[: int(0.7 * len(slowed))]         # …but cut shorter
    res, _ = analyze_arrays(nc, src, TINY)
    assert res.tempo_ratio > 1.0                  # flipped
    assert _warns(res, "half-time artefact corrected")


# 2. same-duration inputs
def test_same_duration_warning():
    src = synth.music_like(26.0, SR, bpm=160.0, seed=12, chord_bars=0.5)
    other = synth.music_like(26.0, SR, bpm=160.0, seed=13, chord_bars=0.5)
    res, _ = analyze_arrays(other, src, TINY)
    assert _warns(res, "nearly the same duration")


# 3. out-of-range ratio — reachable only without durations, via the
#    reference-compatible list API (reference consensus.py:414-436)
def test_out_of_range_ratio_warnings():
    from nightcore_analyzer_tpu.analyze.consensus import build_result
    mk = lambda r: build_result(                      # noqa: E731
        src_pitches=[440.0] * 5, nc_pitches=[440.0] * 5,
        src_tempos=[100.0] * 5, nc_tempos=[100.0 * r] * 5,
        nc_duration=None, src_duration=None)
    assert _warns(mk(1.0), "appear to run at the same speed")
    assert _warns(mk(0.8), "half-time detection artefact")
    assert _warns(mk(1.9), "above the typical nightcore range")


# 4. duration vs tempo mismatch (different edits)
def test_different_edits_warning():
    """A sped-up nightcore with an extra chunk chopped off: detected tempo
    is the true factor but the duration ratio disagrees."""
    src = synth.music_like(30.0, SR, bpm=160.0, seed=14, chord_bars=0.5)
    nc_full = synth.speed_shift(src, 16.0 / 13.0)
    nc = nc_full[: int(0.80 * len(nc_full))]      # radio edit
    res, _ = analyze_arrays(nc, src, TINY)
    assert _warns(res, "disagree by")
    assert _warns(res, "different edits")


# 5. degenerate tempo CI — both variants
def test_degenerate_ci_reliable_variant():
    """Constant-tempo synthetic at a grid-exact factor: every window snaps
    to the same BPM and the duration ratio agrees — 'result is reliable'."""
    src = synth.music_like(26.0, SR, bpm=160.0, seed=3, chord_bars=0.5)
    nc = synth.speed_shift(src, 16.0 / 13.0)
    res, _ = analyze_arrays(nc, src, TINY)
    if abs(res.tempo_ci[1] - res.tempo_ci[0]) < 0.001:
        assert _warns(res, "result is reliable")


def test_degenerate_ci_quantization_variant():
    from nightcore_analyzer_tpu.analyze.consensus import build_result
    res = build_result(
        src_pitches=[440.0] * 5, nc_pitches=[440.0] * 5,
        src_tempos=[120.0] * 8, nc_tempos=[150.0] * 8,   # every window equal
        nc_duration=100.0, src_duration=140.0)  # dur 1.40 vs 1.25: >8% apart
    assert _warns(res, "quantisation artefact")
    assert _warns(res, "Duration-based")


# 6. wide pitch CI.  NOTE: with the chroma estimator the CI span is
#    bounded by the ±6-semitone lag wrap (max span ≈ 0.9×), so the
#    reference's own 2.0× threshold (consensus.py:62) is unreachable by
#    audio — the rule is a holdover from its continuous-Hz CREPE era.
#    We exercise the rule itself at its declared trigger.
def test_wide_pitch_ci_warning_rule():
    from nightcore_analyzer_tpu.analyze.consensus import sanity_warnings
    warns = sanity_warnings(
        tempo_ratio=1.25, pitch_ratio=1.2,
        tempo_ci=(1.24, 1.26), pitch_ci=(0.4, 3.2),   # span 2.8 > 2×1.2
        nc_duration=100.0, src_duration=125.0, tempo_was_corrected=False)
    assert any("Pitch CI is very wide" in w for w in warns)
    warns2 = sanity_warnings(
        tempo_ratio=1.25, pitch_ratio=1.2,
        tempo_ci=(1.24, 1.26), pitch_ci=(1.1, 1.3),
        nc_duration=100.0, src_duration=125.0, tempo_was_corrected=False)
    assert not any("Pitch CI is very wide" in w for w in warns2)


# transcode detector: limiter + speed chain encoded lossy, repackaged FLAC
def test_transcode_detector_on_effects_chain(tmp_path):
    from nightcore_analyzer_tpu import native, spectral
    from nightcore_analyzer_tpu.effects.dynamics import true_peak_limit
    if not native.has_lossy_codecs():
        pytest.skip("no libav")
    # the bandwidth grading presumes full-rate audio (cutoffs at 16.5-20 kHz)
    sr44 = 44100
    rng = np.random.default_rng(0)
    y = rng.standard_normal(sr44 * 6).astype(np.float32) * 0.3   # full-band
    y = true_peak_limit(y, sr44, -1.0)
    mp3 = tmp_path / "rip.mp3"
    # 64 kbps: with white-noise content the -60 dB bandwidth scan is
    # generous (codec noise reaches ~20 kHz at 96k+); the aggressive lowpass
    # at 64k lands at ~17 kHz — inside the grading table
    native.encode_lossy(str(mp3), np.asarray(y, np.float32), sr44,
                        "libmp3lame", 64_000)
    rip, _sr, _pk = native.decode_native_peak(str(mp3))
    fake_flac = tmp_path / "fake_lossless.flac"
    native.encode_flac(str(fake_flac), rip[:sr44 * 6], sr44)
    st = spectral.analyze(str(fake_flac))
    grade = spectral.transcode_grade(st.effective_bandwidth_hz)
    assert grade is not None                      # lossy rip detected
    true_flac = tmp_path / "true.flac"
    native.encode_flac(str(true_flac), y[:sr44 * 6], sr44)
    st2 = spectral.analyze(str(true_flac))
    assert spectral.transcode_grade(st2.effective_bandwidth_hz) is None
