"""Envelope speed-candidate discriminator (analyze/envspeed.py) and its use
as the octave-rescue third leg (round 5; reference independent-verifier
discipline, xcorr.py:54-162)."""

import numpy as np
import pytest

from nightcore_analyzer_tpu.analyze.envspeed import (
    envelope_speed_scores, envelope_prefers)

SR = 22050


def _song(dur_sec, seed=0):
    """Noise with section-level amplitude structure + a beat pulse — enough
    envelope detail for speed-candidate discrimination, no tonal content."""
    rng = np.random.default_rng(seed)
    n = int(dur_sec * SR)
    t = np.arange(n) / SR
    sec = (t // 4.0).astype(int)
    levels = rng.uniform(0.15, 1.0, sec.max() + 1)
    beat = 0.55 + 0.45 * np.cos(2 * np.pi * 2.0 * t)   # 120 BPM pulse
    return (rng.standard_normal(n) * levels[sec] * beat).astype(np.float32)


def _speed(y, factor):
    """Speed up by ``factor`` (sample-drop resample — envelope-exact)."""
    n_out = int(len(y) / factor)
    x = np.arange(n_out) * factor
    return np.interp(x, np.arange(len(y)), y).astype(np.float32)


def test_true_speed_outscores_octave_wrong():
    src = _song(120.0)
    nc = _speed(src, 1.25)
    s_true, s_wrong = envelope_speed_scores(nc, src, (1.25, 2.5), SR)
    assert s_true > 0.6
    assert s_true - s_wrong > 0.2
    assert envelope_prefers(nc, src, 1.25, 2.5, sr=SR) is True
    assert envelope_prefers(nc, src, 2.5, 1.25, sr=SR) is False


def test_excerpt_prefers_true_speed_over_duration_octave():
    """nc is a half-length excerpt sped by 1.23 — the duration ratio sits at
    2×1.23 but the envelope aligns only at the true speed."""
    src = _song(120.0, seed=3)
    nc = _speed(src[: len(src) // 2], 1.23)
    assert envelope_prefers(nc, src, 2.46, 1.23, sr=SR) is False


def test_inconclusive_on_structureless_audio():
    rng = np.random.default_rng(9)
    nc = rng.standard_normal(SR * 20).astype(np.float32)
    src = rng.standard_normal(SR * 30).astype(np.float32)
    assert envelope_prefers(nc, src, 1.25, 2.5, sr=SR) is None


# ── rescue integration (crafted PairAnalysis + real audio third leg) ─────────

def test_rescue_third_leg_overrides_dual_level_veto():
    """Round-4 advisor case: the windowed ACF doubles onto the SAME metrical
    level as the DP (both read 2×true), so the two-leg arbiter vetoes a
    needed rescue; the envelope discriminator sides with the duration and
    the rescue fires."""
    from test_consensus import _mk_pa
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    from nightcore_analyzer_tpu.analyze.consensus import result_from_pair_analysis

    src = _song(120.0, seed=5)
    nc = _speed(src, 1.25)
    # durations 1.25, windowed AND IBI estimators doubled to 2.5
    pa = _mk_pa(1.25, 2.5, 1.25, ibi_scale=2.0)
    cfg = AnalyzerConfig(max_duration_sec=120.0)
    # without audio: the veto holds (round-4 behavior)
    r0 = result_from_pair_analysis(pa, cfg)
    assert r0.ibi_octave_corrected is None
    # with audio: the third leg breaks the dual-level tie
    r = result_from_pair_analysis(pa, cfg, audio_provider=lambda: (nc, src))
    assert r.ibi_octave_corrected == 0.5
    assert r.ibi_regression_ratio == pytest.approx(1.25, rel=1e-6)


def test_rescue_third_leg_withholds_when_windowed_broken_and_durations_lie():
    """The round-4 verdict's prescribed case: heavy swing pushes the
    windowed ACF onto a 3/2 metrical level (agrees with nothing) while the
    nc is an excerpt whose duration ratio sits at 2× the correct regression
    — without audio the duration arbitrates (rescue fires, wrongly); the
    envelope discriminator sides with the IBI estimators and withholds."""
    from test_consensus import _mk_pa
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    from nightcore_analyzer_tpu.analyze.consensus import result_from_pair_analysis

    src = _song(120.0, seed=7)
    nc = _speed(src[: len(src) // 2], 1.23)    # excerpt + speed 1.23
    # durations imply 2.46; windowed on a 3/2 level (1.845); IBIs correct
    pa = _mk_pa(2.46, 1.845, 1.23, ibi_scale=0.5)   # regression = 1.23
    cfg = AnalyzerConfig(max_duration_sec=120.0)
    r0 = result_from_pair_analysis(pa, cfg)
    assert r0.ibi_octave_corrected == 2.0           # two-leg design rescales
    r = result_from_pair_analysis(pa, cfg, audio_provider=lambda: (nc, src))
    assert r.ibi_octave_corrected is None
    assert r.ibi_regression_ratio == pytest.approx(1.23, rel=1e-6)
    assert any("rescue withheld" in w for w in r.warnings)


def test_rescue_third_leg_confirms_duration_when_beats_halve():
    """Plain swing lock (windowed broken, durations honest): the envelope
    sides with the duration and the rescue proceeds as before."""
    from test_consensus import _mk_pa
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    from nightcore_analyzer_tpu.analyze.consensus import result_from_pair_analysis

    src = _song(120.0, seed=11)
    nc = _speed(src, 1.25)
    # windowed on a 2/3-ish level after flip; DP halved
    pa = _mk_pa(1.25, 0.8742, 1.25, ibi_scale=0.5)
    cfg = AnalyzerConfig(max_duration_sec=120.0)
    r = result_from_pair_analysis(pa, cfg, audio_provider=lambda: (nc, src))
    assert r.ibi_octave_corrected == 2.0
    assert r.ibi_regression_ratio == pytest.approx(1.25, rel=1e-6)


def test_rescue_loose_tolerance_inexact_lock():
    """Compound swing+noise halves the DP *inexactly* (~0.51–0.52×true —
    measured at swing 8% + 11 dB SNR), outside the exact octave tolerance.
    With a conclusive envelope verdict for the duration side the loose
    rescue rescales anyway and warns about the residual; without audio the
    raw estimate stands."""
    from test_consensus import _mk_pa
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    from nightcore_analyzer_tpu.analyze.consensus import result_from_pair_analysis

    src = _song(120.0, seed=13)
    nc = _speed(src, 1.25)
    # durations honest (1.25); windowed broken; IBIs at 0.516×true
    pa = _mk_pa(1.25, 1.845, 1.25, ibi_scale=0.516)
    cfg = AnalyzerConfig(max_duration_sec=120.0)
    r0 = result_from_pair_analysis(pa, cfg)
    assert r0.ibi_octave_corrected is None       # no audio → stands
    r = result_from_pair_analysis(pa, cfg, audio_provider=lambda: (nc, src))
    assert r.ibi_octave_corrected == 2.0
    assert r.ibi_regression_ratio == pytest.approx(2 * 0.516 * 1.25, rel=1e-5)
    assert any("inexact" in w for w in r.warnings)

    # an inexact mismatch that is NOT octave-shaped (e.g. 0.7×) never
    # loose-rescues — no candidate within the loose tolerance
    pa2 = _mk_pa(1.25, 1.845, 1.25, ibi_scale=0.7)
    r2 = result_from_pair_analysis(pa2, cfg, audio_provider=lambda: (nc, src))
    assert r2.ibi_octave_corrected is None


def test_discriminator_survives_broadband_noise():
    """The loose rescue consults the envelope discriminator on exactly the
    degraded material (swing/noise) — verify the verdict stays conclusive
    for the true speed under ~11 dB broadband noise on both sides."""
    rng = np.random.default_rng(21)
    src = _song(120.0, seed=21)
    nc = _speed(src, 1.25)
    src_n = src + 0.2 * rng.standard_normal(len(src)).astype(np.float32)
    nc_n = nc + 0.2 * rng.standard_normal(len(nc)).astype(np.float32)
    assert envelope_prefers(nc_n, src_n, 1.25, 0.625, sr=SR) is True
    assert envelope_prefers(nc_n, src_n, 2.5, 1.25, sr=SR) is False


def test_round_check_gate_green_at_head():
    """The round-end evidence gate (tools/round_check.py, wired into
    bench.py's exit code): at a committed HEAD whose jitted path matches
    the stamped MULTICHIP_FULL.json, the gate must pass — and the repo
    must ship in that state (the gate failing here means a kernel change
    was committed without refreshing the production multichip record)."""
    import subprocess
    import sys
    from pathlib import Path
    root = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(root / "tools" / "round_check.py")],
        capture_output=True, text=True, timeout=60)
    if "uncommitted jitted-path changes" in proc.stderr:
        pytest.skip("working tree has in-flight jitted-path edits — the "
                    "gate applies at commit time (bench.py enforces it)")
    assert proc.returncode == 0, (proc.stdout + proc.stderr)


def test_rescue_survives_failing_audio_provider():
    """A provider that raises (the batch driver re-decodes from disk — the
    file can vanish between passes) must degrade to the no-audio behavior,
    never kill the pair."""
    from test_consensus import _mk_pa
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    from nightcore_analyzer_tpu.analyze.consensus import result_from_pair_analysis

    def boom():
        raise OSError("decode failed: file gone")

    cfg = AnalyzerConfig(max_duration_sec=120.0)
    pa = _mk_pa(1.25, 0.8742, 1.25, ibi_scale=0.5)   # plain swing lock
    r = result_from_pair_analysis(pa, cfg, audio_provider=boom)
    assert r.ibi_octave_corrected == 2.0             # no-audio path: rescue
    pa2 = _mk_pa(2.46, 1.23, 1.23, ibi_scale=0.5)    # edits veto case
    r2 = result_from_pair_analysis(pa2, cfg, audio_provider=boom)
    assert r2.ibi_octave_corrected is None           # no-audio path: veto
