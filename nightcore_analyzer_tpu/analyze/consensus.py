"""Host-side consensus: classification, Rubber Band params, sanity warnings.

The device program (:mod:`..models.analyzer`) returns the numbers — medians,
bootstrap CIs, counts, flags.  This module turns them into an
:class:`AnalysisResult` with the same decision logic and compatibility
surface as the reference consensus layer (``consensus.py:315-608``):

* 4-way classification with CI-overlap logic (``consensus.py:315-336``);
* beat-tracker half-time auto-correction — invert ratio + CI when the
  nightcore is ≥1 % shorter yet the detected ratio is < 1
  (``consensus.py:563-576``);
* Rubber Band reconstruction parameters incl. the duration-based fallback
  (``consensus.py:339-381``);
* the six sanity-warning rules (``consensus.py:384-515``).

A list-based :func:`build_result` mirroring the reference's public signature
(``consensus.py:519``) is provided for API compatibility; it routes the
bootstraps through the same device ops.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..config import AnalyzerConfig, DEFAULT_CONFIG
from .result import AnalysisResult

__all__ = ["classify", "rubberband_params", "sanity_warnings",
           "build_result", "compute_ibi_ratio", "result_from_pair_analysis"]


def classify(tempo_ratio: float, pitch_ratio: float,
             tempo_ci: Tuple[float, float], pitch_ci: Tuple[float, float],
             tol: float = DEFAULT_CONFIG.pure_nc_tolerance) -> str:
    """4-way alignment classification (reference ``consensus.py:315-336``)."""
    diff = pitch_ratio - tempo_ratio
    ci_overlap = tempo_ci[0] <= pitch_ci[1] and pitch_ci[0] <= tempo_ci[1]
    if abs(diff) <= tol or (ci_overlap and abs(diff) <= 2 * tol):
        return "pure_nightcore"
    if diff > tol:
        return "independent_pitch_shift"
    if tempo_ratio > 1.0 + tol and diff < -tol:
        return "time_stretch_only"
    return "ambiguous"


def _rb_command(time_ratio: float, pitch_st: float) -> str:
    return (f"rubberband --time {time_ratio:.6f} --pitch {pitch_st:.4f}"
            " nightcore.flac reconstructed.flac")


def rubberband_params(tempo_ratio: float, pitch_ratio: float,
                      nc_duration: Optional[float] = None,
                      src_duration: Optional[float] = None, *,
                      time_source: str = "windowed",
                      pitch_semitones: Optional[float] = None,
                      pitch_source: str = "chroma_grid",
                      windowed_time_ratio: Optional[float] = None,
                      windowed_pitch_ratio: Optional[float] = None) -> dict:
    """Rubber Band parameters to reconstruct the original FROM the nightcore
    (reference ``consensus.py:339-381``): ``--time`` undoes the speed-up,
    ``--pitch = -12·log2(pitch_ratio)`` undoes the net pitch shift; a
    duration-ratio based alternative is included whenever durations exist.

    The primary block carries the BEST available estimators (the product is
    the reconstruction command — feeding it the weakest estimators while
    0.0002 %-class ones sit in side fields was the round-4 priorities
    inversion): callers pass the estimator-chain winner as ``tempo_ratio``
    (labeled by ``time_source``: ``ibi_regression`` → ``ibi_median`` →
    ``windowed``) and, when the refined pitch passed its agreement gate,
    its semitone shift via ``pitch_semitones`` (``pitch_source`` =
    ``refined``; otherwise ``--pitch`` derives from the 1/3-semitone-grid
    ``pitch_ratio``).  The reference's windowed-detected command stays as
    the labeled ``windowed_*`` parity block when it differs from the
    primary source."""
    pitch_st = (pitch_semitones if pitch_semitones is not None
                else -12.0 * math.log2(pitch_ratio))
    rb = {
        "time_ratio": round(tempo_ratio, 6),
        "pitch_semitones": round(pitch_st, 4),
        "nc_to_source_speed": round(1.0 / tempo_ratio, 6) if tempo_ratio else None,
        "cli_command": _rb_command(tempo_ratio, pitch_st),
        "time_source": time_source,
        "pitch_source": pitch_source,
    }
    if windowed_time_ratio is not None and windowed_pitch_ratio is not None \
            and windowed_pitch_ratio > 0:
        w_pitch_st = -12.0 * math.log2(windowed_pitch_ratio)
        rb["windowed_time_ratio"] = round(windowed_time_ratio, 6)
        rb["windowed_pitch_semitones"] = round(w_pitch_st, 4)
        rb["windowed_cli_command"] = _rb_command(windowed_time_ratio, w_pitch_st)
    if nc_duration and src_duration and nc_duration > 0:
        dur_ratio = src_duration / nc_duration
        dur_pitch = -12.0 * math.log2(dur_ratio)
        rb["duration_time_ratio"] = round(dur_ratio, 6)
        rb["duration_pitch_semitones"] = round(dur_pitch, 4)
        rb["duration_cli_command"] = _rb_command(dur_ratio, dur_pitch)
    return rb


def sanity_warnings(tempo_ratio: float, pitch_ratio: float,
                    tempo_ci: Tuple[float, float], pitch_ci: Tuple[float, float],
                    nc_duration: Optional[float], src_duration: Optional[float],
                    tempo_was_corrected: bool,
                    cfg: AnalyzerConfig = DEFAULT_CONFIG) -> List[str]:
    """The six runtime sanity rules (reference ``consensus.py:384-515``)."""
    out: List[str] = []

    if tempo_was_corrected:
        out.append(
            "Beat-tracker half-time artefact corrected: the raw tempo ratio came "
            f"out below 1 even though the nightcore file ({nc_duration:.1f} s) is "
            f"shorter than the source ({src_duration:.1f} s) — the nightcore IS "
            f"faster, so the ratio was inverted to {tempo_ratio:.4f}× "
            "automatically. Half-time beat tracking is a known artefact for "
            "high-BPM (>~130) music."
        )
    elif nc_duration is not None and src_duration is not None:
        dur_ratio = nc_duration / src_duration
        if abs(dur_ratio - 1.0) < cfg.near_unity_tolerance:
            out.append(
                f"Both files are nearly the same duration ({nc_duration:.1f} s vs "
                f"{src_duration:.1f} s). Check that you did not pass two nightcore "
                "files or two originals — a real nightcore is usually 10–35% "
                "shorter than its source."
            )
    else:
        if abs(tempo_ratio - 1.0) < cfg.near_unity_tolerance:
            out.append(
                f"Tempo ratio is {tempo_ratio:.4f} — the files appear to run at "
                "the same speed. Check that you did not pass two nightcore files "
                "or two originals; a real nightcore is typically "
                f"{cfg.nightcore_ratio_min}–{cfg.nightcore_ratio_max}× faster."
            )
        elif tempo_ratio < 1.0:
            out.append(
                f"Tempo ratio is {tempo_ratio:.4f} < 1.0 — either a half-time "
                f"detection artefact (true ratio may be {1.0 / tempo_ratio:.4f}×) "
                "or the files are in the wrong order. Re-run with the original "
                "as --source to disambiguate."
            )
        elif tempo_ratio > cfg.nightcore_ratio_max:
            out.append(
                f"Tempo ratio is {tempo_ratio:.4f}, above the typical nightcore "
                f"range ({cfg.nightcore_ratio_min}–{cfg.nightcore_ratio_max}×). "
                "Verify the input files."
            )

    if nc_duration is not None and src_duration is not None and nc_duration > 0:
        dur_speed = src_duration / nc_duration
        disc = abs(dur_speed - tempo_ratio) / tempo_ratio if tempo_ratio else 0.0
        if disc > cfg.duration_tempo_mismatch_tolerance:
            out.append(
                f"Duration ratio ({dur_speed:.4f}×) and detected tempo ratio "
                f"({tempo_ratio:.4f}×) disagree by {disc * 100:.1f}%. For a pure "
                "speed-up they should match — the two files are most likely "
                "different edits/versions of the song (radio edit vs extended "
                "mix). Either find the exact source version, or use the duration "
                f"ratio ({dur_speed:.4f}×) directly as the rubberband --time "
                "factor."
            )

    if abs(tempo_ci[1] - tempo_ci[0]) < 0.001:
        if nc_duration and src_duration:
            dur_speed = src_duration / nc_duration
            mismatch = abs(tempo_ratio - dur_speed) / dur_speed
            if mismatch < cfg.duration_tempo_mismatch_tolerance:
                out.append(
                    f"Tempo CI is degenerate [lo = hi = {tempo_ci[0]:.6f}]: every "
                    "window returned the same BPM. That is expected for "
                    "constant-tempo (drum-machine) music, and the detected ratio "
                    f"({tempo_ratio:.4f}×) agrees with the duration ratio "
                    f"({dur_speed:.4f}×) — the result is reliable."
                )
            else:
                out.append(
                    f"Tempo CI is degenerate [lo = hi = {tempo_ci[0]:.6f}] and the "
                    f"detected ratio ({tempo_ratio:.4f}×) disagrees with the "
                    f"duration ratio ({dur_speed:.4f}×) by {mismatch * 100:.1f}% — "
                    "a BPM-grid quantisation artefact (every window snapped to "
                    "the same wrong grid BPM). Prefer the primary or "
                    "'Duration-based' CLI command over 'CLI (windowed)'."
                )
        else:
            out.append(
                f"Tempo CI is degenerate [lo = hi = {tempo_ci[0]:.6f}]: every "
                "window returned the same BPM. This is either a tempo-grid "
                "quantisation artefact or genuinely constant-tempo material; "
                "provide both file durations to tell the two apart."
            )

    if pitch_ratio > 0:
        span = pitch_ci[1] - pitch_ci[0]
        if span > cfg.wide_ci_relative * pitch_ratio:
            out.append(
                f"Pitch CI is very wide ({pitch_ci[0]:.3f}–{pitch_ci[1]:.3f}) "
                f"relative to the point estimate ({pitch_ratio:.4f}) — the pitch "
                "estimator could not settle on a consistent ratio (common for "
                "heavily processed or dense polyphonic audio). Trust the tempo "
                "ratio; treat pitch and the classification as approximate."
            )

    return out


def _finalize(tempo_ratio, tempo_ci, pitch_ratio, pitch_ci,
              nc_duration, src_duration, cfg):
    """Half-time flip + classification + warnings (the Rubber Band block is
    assembled separately, after the IBI estimators are known)."""
    corrected = False
    if (nc_duration is not None and src_duration is not None
            and nc_duration < src_duration * 0.99 and tempo_ratio < 1.0):
        tempo_ratio = 1.0 / tempo_ratio
        lo, hi = tempo_ci
        tempo_ci = (1.0 / hi, 1.0 / lo)
        corrected = True
    cls = classify(tempo_ratio, pitch_ratio, tempo_ci, pitch_ci,
                   cfg.pure_nc_tolerance)
    warns = sanity_warnings(tempo_ratio, pitch_ratio, tempo_ci, pitch_ci,
                            nc_duration, src_duration, corrected, cfg)
    return tempo_ratio, tempo_ci, cls, warns, corrected


def result_from_pair_analysis(pa, cfg: AnalyzerConfig, *,
                              compute_pitch: bool = True,
                              pitch_method: Optional[str] = "chroma_xcorr",
                              audio_provider=None,
                              ) -> AnalysisResult:
    """Assemble an :class:`AnalysisResult` from a device ``PairAnalysis``.

    Raises the same error surface as the reference pipeline: RuntimeError
    when the energy gate removed every window (``pipeline.py:142-146``),
    ValueError when too few tempo windows validated (``consensus.py:543-547``).

    ``audio_provider``: optional zero-arg callable returning the pair's host
    audio ``(nc, src)`` (mono float32 @ cfg.sample_rate).  Consulted lazily
    — and only when an octave-rescue deliberation is ambiguous — as the
    envelope speed-discriminator third leg (:mod:`.envspeed`); ``None``
    keeps the two-leg (windowed + duration) arbitration.
    """
    g = lambda x: np.asarray(x)  # noqa: E731
    sr = cfg.sample_rate

    if bool(g(pa.all_gated)):
        raise RuntimeError(
            "All windows were discarded by the energy gate.  "
            "Try raising --energy-gate (e.g. --energy-gate -60).")

    n_src_t = int(g(pa.src_tempo_mask).sum())
    n_nc_t = int(g(pa.nc_tempo_mask).sum())
    if bool(g(pa.tempo_insufficient)):
        raise ValueError(
            f"Insufficient valid tempo windows (source: {n_src_t}, "
            f"nightcore: {n_nc_t}).  Need ≥ {cfg.min_valid} each.")

    nc_duration = float(g(pa.nc_len)) / sr
    src_duration = float(g(pa.src_len)) / sr

    # pitch — degrade gracefully below MIN_VALID chunks (consensus.py:550-559)
    n_chunks = int(g(pa.n_chunks)) if compute_pitch else 0
    if compute_pitch and n_chunks >= cfg.min_valid:
        pitch_ratio = float(g(pa.pitch_ratio))
        pitch_ci = (float(g(pa.pitch_lo)), float(g(pa.pitch_hi)))
        n_pitch = n_chunks
    else:
        pitch_ratio, pitch_ci, n_pitch = 1.0, (1.0, 1.0), 0

    tempo_ratio = float(g(pa.tempo_ratio))
    tempo_ci = (float(g(pa.tempo_lo)), float(g(pa.tempo_hi)))

    # ── refined pitch (first-party MELODIA replacement) — read before the
    # classification/warnings so the grid arbitration below can use it
    refined_st = refined_ci = refined_q = None
    if compute_pitch and bool(g(pa.pitch_refined_ok)):
        refined_st = float(g(pa.pitch_refined_st))
        refined_ci = (float(g(pa.pitch_refined_lo)),
                      float(g(pa.pitch_refined_hi)))
        refined_q = float(g(pa.pitch_refined_quality))

    # ── grid-midpoint coin-flip arbitration (beyond-reference, round 5).
    # The bootstrap pitch median (reference pitch.py:143-153) can land
    # BETWEEN 1/3-semitone grid points when the chunk votes split evenly —
    # on the 1 k corpus all 12 grid misses were true factors within
    # 0.9 cents of a 1/6-st midpoint (coin-flips by construction) while
    # the refined estimator was ≤0.33 cents on every one.  When the median
    # sits within pitch_midpoint_tol_st of a midpoint and the refined
    # estimate is gate-accepted, snap to the grid point nearest the
    # refined shift (an adjacent-grid tie-break only — never a move of
    # more than one grid step).
    pitch_arbitrated = False
    if (cfg.pitch_grid_arbitration and compute_pitch and n_pitch > 0
            and refined_st is not None and pitch_ratio > 0):
        step = 12.0 / cfg.chroma_bins_per_octave
        point_st = 12.0 * math.log2(pitch_ratio)
        dist = abs(point_st / step - round(point_st / step)) * step
        if dist >= step / 2.0 - cfg.pitch_midpoint_tol_st:
            snapped = round(refined_st / step) * step
            if abs(snapped - point_st) <= 0.6 * step:
                pitch_ratio = 2.0 ** (snapped / 12.0)
                pitch_arbitrated = True

    tempo_ratio, tempo_ci, cls, warns, _ = _finalize(
        tempo_ratio, tempo_ci, pitch_ratio, pitch_ci,
        nc_duration, src_duration, cfg)

    # raw per-window data for the GUI histograms (gated windows only, with
    # None for windows that failed the beat-count gate — tempo.py:98-111)
    def raw_list(tempos, tmask, gate):
        tempos, tmask, gate = g(tempos), g(tmask), g(gate)
        return [float(t) if m else None
                for t, m, in_g in zip(tempos, tmask, gate) if in_g]

    shifts = g(pa.pitch_shifts_st)
    cmask = g(pa.pitch_chunk_mask)
    nc_pitches_raw = [float(cfg.ref_hz * 2.0 ** (s / 12.0))
                      for s, m in zip(shifts, cmask) if m] if compute_pitch else []
    src_pitches_raw = [float(cfg.ref_hz)] * len(nc_pitches_raw)

    result = AnalysisResult(
        tempo_ratio=tempo_ratio,
        pitch_ratio=pitch_ratio,
        tempo_ci=tempo_ci,
        pitch_ci=pitch_ci,
        classification=cls,
        n_source_pitch_windows=n_pitch,
        n_nc_pitch_windows=n_pitch,
        n_source_tempo_windows=n_src_t,
        n_nc_tempo_windows=n_nc_t,
        src_pitches_raw=src_pitches_raw,
        nc_pitches_raw=nc_pitches_raw,
        src_tempos_raw=raw_list(pa.src_tempos, pa.src_tempo_mask, pa.src_gate),
        nc_tempos_raw=raw_list(pa.nc_tempos, pa.nc_tempo_mask, pa.nc_gate),
        nc_duration=nc_duration,
        src_duration=src_duration,
        nc_median_bpm=float(g(pa.nc_median_bpm)) if n_nc_t else None,
        src_median_bpm=float(g(pa.src_median_bpm)) if n_src_t else None,
        warnings=warns,
        pitch_method=pitch_method if compute_pitch else None,
        pitch_refined_st=refined_st,
        pitch_refined_ci=refined_ci,
        pitch_refined_quality=refined_q,
        pitch_grid_arbitrated=pitch_arbitrated,
    )

    if bool(g(pa.ibi_valid)):
        result.ibi_ratio = float(g(pa.ibi_ratio))
        result.ibi_ci = (float(g(pa.ibi_lo)), float(g(pa.ibi_hi)))
        result.ibi_refined_ratio = float(g(pa.ibi_refined_ratio))
        reg = float(g(pa.ibi_regression_ratio))
        result.ibi_regression_ratio = reg if reg > 0 else None

        # ── octave rescue (beyond-reference; config.py ibi_octave_rescue).
        # A swung/shuffled groove can make the DP lock one side onto the
        # 2-beat pair period, exactly halving/doubling every IBI-derived
        # ratio (measured: swing ≥ 8% flips some pairs to ratio/2 with
        # ~0.01% residual).  Three arbitration legs, in order of trust:
        #
        # 1. Windowed tempo ratio (independent of the DP): when it agrees
        #    with the duration ratio but not the raw regression, two legs
        #    outvote the beats → rescue.  When it corroborates the raw
        #    regression against the durations, that is the different-edits
        #    situation (radio edit vs extended mix / excerpted nightcore —
        #    the reference's own warning case, consensus.py:455-470) →
        #    veto the rescale.
        # 2. Envelope speed discriminator (:mod:`.envspeed` — the
        #    reference's independent-verifier discipline, xcorr.py:54-162):
        #    consulted lazily, audio permitting, whenever leg 1 is
        #    ambiguous — either the windowed ACF is itself broken (heavy
        #    swing can push it onto a 2/3 metrical level at the same time
        #    the DP halves — measured at swing 8%, bpm 122), or the
        #    windowed veto could itself be a same-level windowed+DP lock
        #    (round-4 advisor case).  A conclusive NCC margin between the
        #    two candidate speeds decides; inconclusive keeps leg 1/3.
        # 3. Duration ratio — the only beat-free arbiter left (the same
        #    arbiter the reference uses for its half-time flip and
        #    duration-based rubberband fallback).
        if (cfg.ibi_octave_rescue and result.ibi_regression_ratio
                and nc_duration and src_duration and nc_duration > 0):
            dur_ratio = src_duration / nc_duration
            tol = cfg.ibi_octave_tolerance
            agree_tol = cfg.duration_tempo_mismatch_tolerance
            base = result.ibi_regression_ratio
            k = None
            if abs(base / dur_ratio - 1.0) > tol:
                k = next((kk for kk in (2.0, 0.5)
                          if abs(kk * base / dur_ratio - 1.0) <= tol), None)

            def _env_prefers_dur():
                # the two hypotheses are "the durations are honest" (true
                # speed = dur_ratio — NOT k·base, which under an inexact
                # lock is a few % off and decorrelates the envelope) vs
                # "the regression is right" (true speed = base)
                if audio_provider is None:
                    return None
                from .envspeed import envelope_prefers
                try:
                    # a provider may re-decode from disk (the batch
                    # driver's lazy path) — a decode failure here must
                    # degrade to "inconclusive", not kill the pair/batch
                    nc_y, src_y = audio_provider()
                except Exception:
                    return None
                return envelope_prefers(
                    nc_y, src_y, dur_ratio, base, sr=cfg.sample_rate,
                    min_score=cfg.rescue_env_min_score,
                    margin=cfg.rescue_env_margin)

            def _rescale(kk, extra=""):
                result.ibi_ratio *= kk
                result.ibi_ci = (result.ibi_ci[0] * kk,
                                 result.ibi_ci[1] * kk)
                result.ibi_refined_ratio *= kk
                result.ibi_regression_ratio *= kk
                result.ibi_octave_corrected = kk
                result.warnings.append(
                    f"IBI octave rescue: the beat tracker locked one "
                    f"side onto a {'half' if kk == 2.0 else 'double'}"
                    f"-time grid (raw IBI ratio {base:.4f} vs "
                    f"duration ratio {dur_ratio:.4f}); all IBI "
                    f"estimators were rescaled by ×{kk:g}. Common on "
                    f"heavily swung material — verify with the "
                    f"waveform xcorr step." + extra)

            if k is not None:
                w_agrees_reg = (tempo_ratio > 0 and
                                abs(base / tempo_ratio - 1.0) <= agree_tol)
                w_agrees_dur = (tempo_ratio > 0 and
                                abs(dur_ratio / tempo_ratio - 1.0) <= agree_tol)
                if w_agrees_dur and not w_agrees_reg:
                    do_rescue = True            # two legs vs the beats
                else:
                    # leg-1 veto (w_agrees_reg) or no two legs agreeing:
                    # consult the envelope discriminator when audio exists
                    do_rescue = not (w_agrees_reg and not w_agrees_dur)
                    prefers_dur = _env_prefers_dur()
                    if prefers_dur is not None:
                        do_rescue = prefers_dur
                    if prefers_dur is False and do_rescue is False \
                            and not w_agrees_reg:
                        result.warnings.append(
                            f"IBI octave rescue withheld: the raw IBI "
                            f"regression ({base:.4f}) disagrees with the "
                            f"duration ratio ({dur_ratio:.4f}) by an "
                            f"octave multiple, but the envelope "
                            f"alignment check sides with the IBI "
                            f"estimators — the files are most likely "
                            f"different edits.")
                if do_rescue:
                    _rescale(k)
            elif abs(base / dur_ratio - 1.0) > tol:
                # inexact octave lock (measured: swing + ≤11 dB noise
                # halves the DP at ~0.51–0.52×, outside the exact
                # tolerance) — rescale ONLY on a conclusive envelope
                # verdict for the duration side (config.py
                # ibi_octave_loose_tolerance)
                k_loose = next(
                    (kk for kk in (2.0, 0.5)
                     if abs(kk * base / dur_ratio - 1.0)
                     <= cfg.ibi_octave_loose_tolerance), None)
                if k_loose is not None and _env_prefers_dur():
                    resid = abs(k_loose * base / dur_ratio - 1.0) * 100.0
                    _rescale(k_loose, extra=(
                        f" NOTE: the lock was inexact — after rescaling "
                        f"the IBI estimators still disagree with the "
                        f"duration ratio by {resid:.1f}%; beat tracking "
                        f"is degraded on this material (typically heavy "
                        f"swing + noise), treat IBI precision as reduced "
                        f"and prefer the duration-based factor."))
        if cfg.classify_on_ibi and compute_pitch and n_pitch > 0:
            # v2 (the default since round 4; --classify-parity restores the
            # reference path): the windowed ratio is lag-grid quantized,
            # which misclassifies constant-tempo material whose grid snap
            # lands away from the true factor; the beat-time estimators do
            # not carry that quantization
            best = result.ibi_regression_ratio or result.ibi_ratio
            half_span = max(result.ibi_ci[1] - result.ibi_ci[0], 1e-6) / 2
            result.classification = classify(
                best, pitch_ratio, (best - half_span, best + half_span),
                pitch_ci, cfg.pure_nc_tolerance)
            result.classification_mode = "ibi"

    # ── Rubber Band block from the BEST estimators (round 5; the estimator
    # chain the interactive workflow already trusts, workflow.py HQNC loop):
    # --time from ibi_regression → ibi_median → windowed, --pitch from the
    # gate-accepted refined shift, grid fallback otherwise.  The windowed
    # command stays as the labeled parity field.
    best_time, time_source = tempo_ratio, "windowed"
    if result.ibi_ratio is not None:
        best_time, time_source = result.ibi_ratio, "ibi_median"
    if result.ibi_regression_ratio:
        best_time, time_source = result.ibi_regression_ratio, "ibi_regression"
    best_pitch_st, pitch_source = None, "chroma_grid"
    if refined_st is not None:
        best_pitch_st, pitch_source = -refined_st, "refined"
    result.rubberband = rubberband_params(
        best_time, pitch_ratio, nc_duration, src_duration,
        time_source=time_source, pitch_semitones=best_pitch_st,
        pitch_source=pitch_source,
        windowed_time_ratio=tempo_ratio, windowed_pitch_ratio=pitch_ratio)

    off = float(g(pa.intro_offset)) / sr
    result.intro_offset_sec = off if off > 0 else None
    return result


# ── reference-compatible list-based API ──────────────────────────────────────

def _to_masked(values: Sequence[Optional[float]], n_max: Optional[int] = None):
    vals = np.zeros(max(n_max or len(values), 1), np.float32)
    mask = np.zeros(vals.shape, bool)
    for i, v in enumerate(values):
        if v is not None and np.isfinite(v) and v > 0:
            vals[i] = v
            mask[i] = True
    return vals, mask


def _np_bootstrap_ratio(num, den, n_boot, ci, seed=42):
    import jax
    import jax.numpy as jnp
    from ..ops.stats import bootstrap_ratio_ci
    nv, nm = _to_masked(num)
    dv, dm = _to_masked(den)
    point, lo, hi = bootstrap_ratio_ci(
        jax.random.PRNGKey(seed), jnp.asarray(nv), jnp.asarray(nm),
        jnp.asarray(dv), jnp.asarray(dm), n_boot=n_boot, ci=ci)
    return float(point), (float(lo), float(hi))


def build_result(src_pitches: Sequence[Optional[float]],
                 nc_pitches: Sequence[Optional[float]],
                 src_tempos: Sequence[Optional[float]],
                 nc_tempos: Sequence[Optional[float]], *,
                 nc_duration: Optional[float] = None,
                 src_duration: Optional[float] = None,
                 cfg: AnalyzerConfig = DEFAULT_CONFIG) -> AnalysisResult:
    """Reference-signature consensus entry (``consensus.py:519-608``) for
    callers that hold per-window estimate lists."""
    def valid(xs):
        return [x for x in xs if x is not None and np.isfinite(x) and x > 0]

    sv, nv = valid(src_tempos), valid(nc_tempos)
    if len(sv) < cfg.min_valid or len(nv) < cfg.min_valid:
        raise ValueError(
            f"Insufficient valid tempo windows (source: {len(sv)}, "
            f"nightcore: {len(nv)}).  Need ≥ {cfg.min_valid} each.")

    sp, npi = valid(src_pitches), valid(nc_pitches)
    if len(sp) >= cfg.min_valid and len(npi) >= cfg.min_valid:
        pitch_ratio, pitch_ci = _np_bootstrap_ratio(
            nc_pitches, src_pitches, cfg.n_bootstrap, cfg.ci_level)
        n_sp, n_np = len(sp), len(npi)
    else:
        pitch_ratio, pitch_ci, n_sp, n_np = 1.0, (1.0, 1.0), 0, 0

    tempo_ratio, tempo_ci = _np_bootstrap_ratio(
        nc_tempos, src_tempos, cfg.n_bootstrap, cfg.ci_level)

    tempo_ratio, tempo_ci, cls, warns, _ = _finalize(
        tempo_ratio, tempo_ci, pitch_ratio, pitch_ci,
        nc_duration, src_duration, cfg)
    # list-based callers hold no IBI/refined estimators — the windowed
    # ratios are the best available and the primary block says so
    rb = rubberband_params(
        tempo_ratio, pitch_ratio, nc_duration, src_duration,
        windowed_time_ratio=tempo_ratio, windowed_pitch_ratio=pitch_ratio)

    return AnalysisResult(
        tempo_ratio=tempo_ratio, pitch_ratio=pitch_ratio,
        tempo_ci=tempo_ci, pitch_ci=pitch_ci, classification=cls,
        n_source_pitch_windows=n_sp, n_nc_pitch_windows=n_np,
        n_source_tempo_windows=len(sv), n_nc_tempo_windows=len(nv),
        rubberband=rb,
        src_pitches_raw=list(src_pitches), nc_pitches_raw=list(nc_pitches),
        src_tempos_raw=list(src_tempos), nc_tempos_raw=list(nc_tempos),
        nc_duration=nc_duration, src_duration=src_duration,
        nc_median_bpm=float(np.median(nv)) if nv else None,
        src_median_bpm=float(np.median(sv)) if sv else None,
        warnings=warns)


def compute_ibi_ratio(nc_ibis: np.ndarray, src_ibis: np.ndarray,
                      n_boot: int = DEFAULT_CONFIG.n_bootstrap,
                      ci: float = DEFAULT_CONFIG.ci_level):
    """``median(src_ibis)/median(nc_ibis)`` + bootstrap CI
    (reference ``consensus.py:270-312``)."""
    point, bounds = _np_bootstrap_ratio(list(map(float, src_ibis)),
                                        list(map(float, nc_ibis)), n_boot, ci)
    return point, bounds
