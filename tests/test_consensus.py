"""Host consensus logic: classification, rubberband, sanity rules, half-time
flip, list-based build_result (reference consensus.py semantics)."""

import math

import numpy as np
import pytest

from nightcore_analyzer_tpu.analyze.consensus import (
    classify, rubberband_params, sanity_warnings, build_result,
    compute_ibi_ratio)


def test_classify_pure_nightcore():
    assert classify(1.25, 1.25, (1.24, 1.26), (1.24, 1.26)) == "pure_nightcore"
    # within tolerance
    assert classify(1.25, 1.26, (1.24, 1.26), (1.25, 1.27)) == "pure_nightcore"


def test_classify_independent_pitch_shift():
    assert classify(1.25, 1.35, (1.249, 1.251), (1.349, 1.351)) == \
        "independent_pitch_shift"


def test_classify_time_stretch_only():
    assert classify(1.25, 1.0, (1.249, 1.251), (0.999, 1.001)) == \
        "time_stretch_only"


def test_classify_ambiguous():
    # tempo below 1+tol with pitch lower → ambiguous branch
    assert classify(1.01, 0.95, (1.009, 1.011), (0.949, 0.951)) == "ambiguous"


def test_rubberband_params_roundtrip():
    rb = rubberband_params(1.25, 1.25, nc_duration=80.0, src_duration=100.0)
    assert rb["time_ratio"] == 1.25
    assert rb["pitch_semitones"] == pytest.approx(-12 * math.log2(1.25), abs=1e-3)
    assert rb["nc_to_source_speed"] == pytest.approx(0.8, abs=1e-6)
    assert "rubberband --time 1.250000" in rb["cli_command"]
    assert rb["duration_time_ratio"] == 1.25
    assert "duration_cli_command" in rb


def test_sanity_same_duration_warning():
    w = sanity_warnings(1.0, 1.0, (0.99, 1.01), (0.99, 1.01), 100.0, 100.5, False)
    assert any("same duration" in x for x in w)


def test_sanity_duration_tempo_mismatch():
    w = sanity_warnings(1.10, 1.10, (1.09, 1.11), (1.09, 1.11), 80.0, 100.0, False)
    assert any("disagree" in x or "Duration ratio" in x for x in w)


def test_sanity_halftime_correction_message():
    w = sanity_warnings(1.25, 1.25, (1.24, 1.26), (1.24, 1.26), 80.0, 100.0, True)
    assert any("half-time" in x.lower() for x in w)


def test_sanity_wide_pitch_ci():
    w = sanity_warnings(1.25, 1.2, (1.2, 1.3), (0.5, 3.5), 80.0, 100.0, False)
    assert any("Pitch CI" in x for x in w)


def test_build_result_halftime_flip():
    # nc shorter (faster) but ratio < 1 → auto-invert
    src_t = [100.0] * 6
    nc_t = [80.0] * 6          # raw ratio 0.8 — half-time artefact
    r = build_result([], [], src_t, nc_t, nc_duration=80.0, src_duration=100.0)
    assert r.tempo_ratio == pytest.approx(1.25, rel=1e-6)
    assert r.tempo_ci[0] <= r.tempo_ci[1]
    assert any("half-time" in w.lower() for w in r.warnings)


def test_build_result_insufficient_raises():
    with pytest.raises(ValueError):
        build_result([], [], [100.0, 101.0], [120.0] * 5)


def test_build_result_pitch_degrades():
    r = build_result([440.0], [466.0], [100.0] * 5, [125.0] * 5,
                     nc_duration=80.0, src_duration=100.0)
    assert r.pitch_ratio == 1.0
    assert r.n_source_pitch_windows == 0


def test_build_result_point_estimates():
    rng = np.random.default_rng(7)
    src_t = list(100.0 + rng.normal(scale=0.5, size=20))
    nc_t = list(125.0 + rng.normal(scale=0.5, size=18))
    r = build_result([440.0] * 6, [554.37] * 6, src_t, nc_t,
                     nc_duration=80.0, src_duration=100.0)
    assert r.tempo_ratio == pytest.approx(
        np.median(nc_t) / np.median(src_t), rel=1e-6)
    assert r.pitch_ratio == pytest.approx(554.37 / 440.0, rel=1e-6)
    assert r.tempo_ci[0] < r.tempo_ratio < r.tempo_ci[1]
    assert r.classification == "pure_nightcore"
    assert str(r)  # pretty-printer renders


def test_compute_ibi_ratio():
    rng = np.random.default_rng(3)
    src_ibis = 0.5 + rng.normal(scale=0.002, size=200)
    nc_ibis = 0.4 + rng.normal(scale=0.002, size=190)
    ratio, (lo, hi) = compute_ibi_ratio(nc_ibis, src_ibis)
    assert ratio == pytest.approx(np.median(src_ibis) / np.median(nc_ibis),
                                  rel=1e-6)
    assert lo < ratio < hi
    assert hi - lo < 0.01


def _mk_pa(true_factor, grid_factor, pitch_ratio, *, ibi_scale=1.0,
           refined_st=None):
    """Crafted PairAnalysis row: durations imply ``true_factor``, the
    windowed tempo snapped to ``grid_factor``, and every IBI estimator
    reads ``true_factor * ibi_scale`` (ibi_scale=0.5 emulates the nc side
    locking onto the 2-beat swing-pair period).  ``refined_st`` marks the
    sub-semitone refinement gate-accepted at that shift."""
    import numpy as np
    import jax.numpy as jnp
    from nightcore_analyzer_tpu.models.analyzer import PairAnalysis

    ibi = true_factor * ibi_scale
    slots, chunks = 8, 6
    j = lambda v, dt=np.float32: jnp.asarray(np.asarray(v, dt))  # noqa: E731
    return PairAnalysis(
        nc_len=j(22050 * 80, np.int32), src_len=j(int(22050 * 80 * true_factor), np.int32),
        nc_lead=j(0, np.int32), nc_trail=j(0, np.int32),
        src_lead=j(0, np.int32), src_trail=j(0, np.int32),
        intro_offset=j(0, np.int32), align_speed=j(1.0),
        src_tempos=j(np.full(slots, 100.0)), src_tempo_mask=j(np.ones(slots, bool), bool),
        nc_tempos=j(np.full(slots, 100.0 * grid_factor)),
        nc_tempo_mask=j(np.ones(slots, bool), bool),
        n_src_windows=j(slots, np.int32), n_nc_windows=j(slots, np.int32),
        src_gate=j(np.ones(slots, bool), bool), nc_gate=j(np.ones(slots, bool), bool),
        all_gated=j(False, bool),
        src_median_bpm=j(100.0), nc_median_bpm=j(100.0 * grid_factor),
        nc_start_bpm=j(123.0),
        tempo_ratio=j(grid_factor), tempo_lo=j(grid_factor), tempo_hi=j(grid_factor),
        tempo_insufficient=j(False, bool),
        pitch_shifts_st=j(np.full(chunks, 12 * np.log2(pitch_ratio))),
        pitch_chunk_mask=j(np.ones(chunks, bool), bool), n_chunks=j(chunks, np.int32),
        pitch_point_st=j(12 * np.log2(pitch_ratio)),
        pitch_st_lo=j(12 * np.log2(pitch_ratio)), pitch_st_hi=j(12 * np.log2(pitch_ratio)),
        pitch_ratio=j(pitch_ratio), pitch_lo=j(pitch_ratio), pitch_hi=j(pitch_ratio),
        pitch_refined_chunk_st=j(np.zeros(chunks)),
        pitch_refined_st=j(refined_st or 0.0),
        pitch_refined_lo=j((refined_st or 0.0) - 0.01),
        pitch_refined_hi=j((refined_st or 0.0) + 0.01),
        pitch_refined_quality=j(0.8 if refined_st is not None else 0.0),
        pitch_refined_ok=j(refined_st is not None, bool),
        ibi_ratio=j(ibi), ibi_lo=j(ibi - 0.001),
        ibi_hi=j(ibi + 0.001), ibi_valid=j(True, bool),
        n_src_ibis=j(200, np.int32), n_nc_ibis=j(200, np.int32),
        ibi_refined_ratio=j(ibi), ibi_regression_ratio=j(ibi))


def test_classification_v2_fixes_grid_misfire():
    """classify_on_ibi (the default since round 4): a pure nightcore whose
    windowed BPM snapped to a grid point away from the true factor
    misclassifies under the parity path; the beat-time estimator fixes it."""
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    from nightcore_analyzer_tpu.analyze.consensus import result_from_pair_analysis

    pa = _mk_pa(1.23, 1.30, 1.23)
    v1 = result_from_pair_analysis(
        pa, AnalyzerConfig(max_duration_sec=120.0, classify_on_ibi=False))
    assert v1.classification == "time_stretch_only"         # the grid misfire
    assert v1.classification_mode == "windowed"
    # the DEFAULT config must take the robust path
    v2 = result_from_pair_analysis(pa, AnalyzerConfig(max_duration_sec=120.0))
    assert AnalyzerConfig().classify_on_ibi is True
    assert v2.classification == "pure_nightcore"
    assert v2.classification_mode == "ibi"


def test_ibi_octave_rescue_halftime_lock():
    """A half-time beat lock (all IBI estimators at factor/2, duration ratio
    at the true factor) is rescaled ×2 with a warning; the untouched path
    and the opt-out both leave values alone."""
    import pytest
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    from nightcore_analyzer_tpu.analyze.consensus import result_from_pair_analysis

    pa = _mk_pa(1.23, 1.30, 1.23, ibi_scale=0.5)
    r = result_from_pair_analysis(pa, AnalyzerConfig(max_duration_sec=120.0))
    assert r.ibi_octave_corrected == 2.0
    assert r.ibi_regression_ratio == pytest.approx(1.23, rel=1e-6)
    assert r.ibi_ratio == pytest.approx(1.23, rel=1e-6)
    assert r.ibi_refined_ratio == pytest.approx(1.23, rel=1e-6)
    assert r.ibi_ci == pytest.approx((2 * (0.615 - 0.001), 2 * (0.615 + 0.001)))
    assert any("octave rescue" in w for w in r.warnings)

    off = result_from_pair_analysis(
        pa, AnalyzerConfig(max_duration_sec=120.0, ibi_octave_rescue=False))
    assert off.ibi_octave_corrected is None
    assert off.ibi_regression_ratio == pytest.approx(0.615, rel=1e-6)

    # double-time lock (estimators at 2×factor) rescales ×0.5
    pa2 = _mk_pa(1.23, 1.30, 1.23, ibi_scale=2.0)
    r2 = result_from_pair_analysis(pa2, AnalyzerConfig(max_duration_sec=120.0))
    assert r2.ibi_octave_corrected == 0.5
    assert r2.ibi_regression_ratio == pytest.approx(1.23, rel=1e-6)

    # clean pair: untouched
    pa3 = _mk_pa(1.23, 1.30, 1.23)
    r3 = result_from_pair_analysis(pa3, AnalyzerConfig(max_duration_sec=120.0))
    assert r3.ibi_octave_corrected is None


def test_ibi_octave_rescue_fires_when_windowed_also_broken():
    """Heavy swing can push the windowed ACF onto a 2/3 metrical level at
    the same time the DP halves (measured: swing 8%, bpm 122 — windowed
    0.70×true, regression 0.50×true).  NO two legs agree, so the duration
    ratio stays the arbiter and the rescue must fire (sweep regression of
    the first round-4 gate design)."""
    import pytest
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    from nightcore_analyzer_tpu.analyze.consensus import result_from_pair_analysis

    # true 1.25; windowed snapped to 0.874 (flips to 1.144 — still 8.5%
    # off the duration ratio); all IBI estimators at 0.625
    pa = _mk_pa(1.25, 0.8742, 1.25, ibi_scale=0.5)
    r = result_from_pair_analysis(pa, AnalyzerConfig(max_duration_sec=120.0))
    assert r.ibi_octave_corrected == 2.0
    assert r.ibi_regression_ratio == pytest.approx(1.25, rel=1e-6)
    assert any("octave rescue" in w for w in r.warnings)


def test_ibi_octave_rescue_blocked_on_different_edits():
    """Different edits (radio edit vs extended mix): the duration ratio
    (2.46, source has an extra section) coincidentally sits at an octave
    multiple of the correct IBI ratio (1.23).  Durations are NOT a valid
    arbiter here — the duration-vs-tempo mismatch exceeds
    duration_tempo_mismatch_tolerance (the reference's own warning case,
    consensus.py:455-470) — so the rescue must NOT rescale anything."""
    import pytest
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    from nightcore_analyzer_tpu.analyze.consensus import result_from_pair_analysis

    # nc 80 s, src 196.8 s (extra 60 s-class section); windowed tempo and all
    # IBI estimators correctly read the true speed factor 1.23
    pa = _mk_pa(2.46, 1.23, 1.23, ibi_scale=0.5)    # ibi = 2.46*0.5 = 1.23
    r = result_from_pair_analysis(pa, AnalyzerConfig(max_duration_sec=120.0))
    assert r.ibi_octave_corrected is None
    assert r.ibi_regression_ratio == pytest.approx(1.23, rel=1e-6)
    assert r.ibi_ratio == pytest.approx(1.23, rel=1e-6)
    assert not any("octave rescue" in w for w in r.warnings)
    # the different-edits situation itself is surfaced (mismatch warning)
    assert any("different edits" in w for w in r.warnings)


def test_rubberband_best_estimate_block():
    """Round 5: the primary Rubber Band command carries the estimator-chain
    winner (IBI regression + refined pitch), with the windowed-detected
    command kept as the labeled parity field (the round-4 verdict's
    output-layer priorities inversion)."""
    import pytest
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    from nightcore_analyzer_tpu.analyze.consensus import result_from_pair_analysis

    true_st = 12 * np.log2(1.23)
    pa = _mk_pa(1.23, 1.30, 1.23, refined_st=true_st)
    r = result_from_pair_analysis(pa, AnalyzerConfig(max_duration_sec=120.0))
    rb = r.rubberband
    assert rb["time_source"] == "ibi_regression"
    assert rb["time_ratio"] == pytest.approx(r.ibi_regression_ratio, abs=1e-6)
    assert rb["pitch_source"] == "refined"
    assert rb["pitch_semitones"] == pytest.approx(-true_st, abs=1e-3)
    assert f"--time {r.ibi_regression_ratio:.6f}" in rb["cli_command"]
    # windowed parity field keeps the grid-quantized detected values
    assert rb["windowed_time_ratio"] == pytest.approx(1.30, abs=1e-6)
    assert "--time 1.300000" in rb["windowed_cli_command"]
    assert "CLI (best)" in str(r) and "CLI (windowed)" in str(r)

    # no refined acceptance → grid pitch; no IBI → windowed time
    pa2 = _mk_pa(1.23, 1.30, 1.23)
    r2 = result_from_pair_analysis(pa2, AnalyzerConfig(max_duration_sec=120.0))
    assert r2.rubberband["pitch_source"] == "chroma_grid"
    assert r2.rubberband["pitch_semitones"] == pytest.approx(
        -12 * np.log2(1.23), abs=1e-3)


def test_pitch_grid_midpoint_arbitration():
    """Round 5: a bootstrap pitch median on a 1/6-st grid midpoint (even
    chunk-vote split — a coin flip) snaps to the grid point nearest the
    gate-accepted refined estimate; far-from-midpoint medians and
    unaccepted refinements are left alone."""
    import pytest
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    from nightcore_analyzer_tpu.analyze.consensus import result_from_pair_analysis

    mid_st = 23.0 / 6.0                       # midpoint between 11/3 and 4.0
    true_st = 3.8631                          # true factor 1.25 → grid 4.0
    pa = _mk_pa(1.25, 1.25, 2.0 ** (mid_st / 12.0), refined_st=true_st)
    r = result_from_pair_analysis(pa, AnalyzerConfig(max_duration_sec=120.0))
    assert r.pitch_grid_arbitrated
    assert r.pitch_ratio == pytest.approx(2.0 ** (4.0 / 12.0), rel=1e-9)
    # the corrected value feeds classification and the rubberband grid path
    assert r.rubberband["pitch_source"] == "refined"

    # exact grid point: untouched
    pa2 = _mk_pa(1.25, 1.25, 2.0 ** (4.0 / 12.0), refined_st=true_st)
    r2 = result_from_pair_analysis(pa2, AnalyzerConfig(max_duration_sec=120.0))
    assert not r2.pitch_grid_arbitrated
    assert r2.pitch_ratio == pytest.approx(2.0 ** (4.0 / 12.0), rel=1e-6)

    # midpoint but refined not accepted: coin flip stands (documented)
    pa3 = _mk_pa(1.25, 1.25, 2.0 ** (mid_st / 12.0))
    r3 = result_from_pair_analysis(pa3, AnalyzerConfig(max_duration_sec=120.0))
    assert not r3.pitch_grid_arbitrated
    assert r3.pitch_ratio == pytest.approx(2.0 ** (mid_st / 12.0), rel=1e-6)

    # opt-out
    pa4 = _mk_pa(1.25, 1.25, 2.0 ** (mid_st / 12.0), refined_st=true_st)
    r4 = result_from_pair_analysis(
        pa4, AnalyzerConfig(max_duration_sec=120.0,
                            pitch_grid_arbitration=False))
    assert not r4.pitch_grid_arbitrated


def test_beta_bootstrap_matches_bisect_distribution():
    """The large-buffer bootstrap path samples the middle order statistics
    directly from their exact Beta joint law instead of materializing the
    (n_boot, n_max) index matrix; per-draw the bootstrap-median law is
    unchanged.  Same data through both paths (only the padding width picks
    the path) must give the same CI quantiles up to Monte-Carlo noise."""
    import jax
    import jax.numpy as jnp
    from nightcore_analyzer_tpu.ops import stats

    rng = np.random.default_rng(0)
    for n_valid in (120, 121):                 # even + odd medians
        vals = np.full(2048, np.inf, np.float32)
        vals[:n_valid] = 0.47 + 0.01 * rng.standard_normal(n_valid)
        mask = np.arange(2048) < n_valid
        key = jax.random.PRNGKey(7)
        beta = np.asarray(stats.bootstrap_medians(
            key, jnp.asarray(vals), jnp.asarray(mask), 20000))
        bis = np.asarray(stats.bootstrap_medians(
            key, jnp.asarray(vals[:128]), jnp.asarray(mask[:128]), 20000))
        for q in (2.5, 50.0, 97.5):
            assert abs(np.percentile(beta, q) - np.percentile(bis, q)) < 5e-4
        assert beta.std() == pytest.approx(bis.std(), rel=0.05)
