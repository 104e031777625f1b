"""Interactive terminal workflow (reference ``workflow.py``).

Five modes plus exit (``workflow.py:986-994``):

    [f] full suite   — speed compare → create HQNC → verification retry loop
                       → pitch analysis + correction loop → spectral →
                       loudness
    [s] speed comparison (+ optional HQNC + optional spectral)
    [p] standalone pitch analysis
    [a] standalone spectral comparison
    [l] loudness adjustment loop
    [e] exit

Artefact conventions match the reference: ``Song [Nightcore].flac`` for the
first HQNC, ``… UPD<n>`` for corrected re-renders (``workflow.py:90-105``),
``… PS<n>`` for pitch-corrected files (``workflow.py:134-140``), ``… ADJ<n>``
for loudness passes.  Where the reference shells out to sox / rubberband /
ffmpeg, this build prefers those binaries when installed and otherwise uses
its first-party equivalents (:mod:`.effects`).

Verification tolerances mirror ``workflow.py:160-163``: BPM ±2 %, IBI
±0.5 %, xcorr quality gate 0.30, length-ratio warning 0.5 %.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path
from typing import Optional

import numpy as np

from .analyze import pipeline
from . import loudness as lda
from . import spectral as spec
from .effects import create_speed_changed_file, create_pitch_shifted_file

__all__ = ["main", "run_full_suite", "run_speed_comparison",
           "run_pitch_analysis", "run_spectral_analysis",
           "run_loudness_adjustment"]

# ── tolerances (reference workflow.py:160-163) ───────────────────────────────
NEAR_UNITY = 0.02            # |ratio − 1| below this → "essentially the same"
PITCH_TEMPO_TOLERANCE = 0.02
XCORR_QUALITY_GATE = 0.30
LEN_RATIO_WARN = 0.005
IBI_TOLERANCE = 0.005        # 0.5 % for IBI vs 2 % for BPM
PITCH_SIGNIFICANT_ST = 0.5

_LOSSLESS_EXTENSIONS = {"flac", "wav", "aiff", "aif"}


# ── prompt helpers ───────────────────────────────────────────────────────────

def _prompt_choice(question: str, options: str = "yne", default: str = "") -> str:
    """Single-letter prompt; uppercase marks the default; 'e' exits."""
    shown = "/".join(o.upper() if o == default else o for o in options)
    while True:
        raw = input(f"{question} [{shown}]: ").strip().lower()
        if not raw and default:
            raw = default
        if raw and raw[0] in options:
            if raw[0] == "e":
                print("Exiting.")
                sys.exit(0)
            return raw[0]
        print(f"  Please answer one of: {', '.join(options)}")


def _prompt_file(label: str, existing: Optional[str] = None) -> Path:
    """Prompt for a file path; strips drag-and-drop quotes."""
    if existing:
        p = Path(existing).expanduser()
        if p.is_file():
            print(f"Path to {label}: {p}")
            return p
    while True:
        raw = input(f"Path to {label}: ").strip().strip("'\"")
        p = Path(raw).expanduser()
        if p.is_file():
            return p
        print(f"  File not found: {p}")


def _hr(char: str = "─", width: int = 57) -> None:
    print(char * width)


# ── artefact paths (reference workflow.py:90-105,134-140) ────────────────────

def _hqnc_path(hq: Path, version: int = 0) -> Path:
    base = hq.with_name(f"{hq.stem} [Nightcore]{hq.suffix}")
    if version == 0:
        return base
    return hq.with_name(f"{hq.stem} [Nightcore] UPD{version}{hq.suffix}")


def _ps_path(src: Path, version: int) -> Path:
    return src.with_name(f"{src.stem} PS{version}{src.suffix}")


def _lossy_note(hq: Path) -> Optional[str]:
    ext = hq.suffix.lstrip(".").lower()
    if ext not in _LOSSLESS_EXTENSIONS:
        return (f"  Note: HQ source is {ext.upper()} (lossy). The HQNC is "
                f"written as {ext.upper()} too — transcoding a lossy source "
                "into FLAC adds no quality.")
    return None


# ── pipeline wrapper + printers ──────────────────────────────────────────────

#: module-level parity toggle, set by --classify-parity (the interactive
#: modes all route through _run_pipeline; mirrors the CLI flag)
CLASSIFY_PARITY = False


def _run_pipeline(nightcore: Path, source: Path, step_label: str,
                  src_trim_sec: float = 0.0, compute_pitch: bool = True):
    print()
    _hr()
    print(f"  {step_label}")
    _hr()
    print(f"  Nightcore file: {nightcore.name}")
    print(f"  Source file   : {source.name}")
    print()
    return pipeline.run(str(nightcore), str(source),
                        src_trim_sec=src_trim_sec,
                        compute_pitch=compute_pitch,
                        classify_on_ibi=not CLASSIFY_PARITY,
                        log=lambda m: print(f"  {m}"))


def _print_speed_result(result, hq: Path, ncog: Path) -> None:
    tr, pr = result.tempo_ratio, result.pitch_ratio
    print()
    _hr("═")
    print("  SPEED COMPARISON RESULTS")
    _hr("═")
    print(f"  Windowed-BPM speed : {tr:.6f}×   95% CI "
          f"[{result.tempo_ci[0]:.4f}, {result.tempo_ci[1]:.4f}]")
    if result.ibi_ratio is not None:
        print(f"  Beat-interval speed: {result.ibi_ratio:.6f}×   95% CI "
              f"[{result.ibi_ci[0]:.6f}, {result.ibi_ci[1]:.6f}]")
    if result.ibi_regression_ratio:
        print(f"  Beat-regression    : {result.ibi_regression_ratio:.6f}×"
              "   <- finest estimator (LS slope of beat times)")
    if result.n_source_pitch_windows > 0:
        print(f"  Pitch ratio        : {pr:.6f}")
    print(f"  Classified as      : {result.classification}")
    if result.intro_offset_sec is not None:
        print(f"  Intro offset       : dropped the first "
              f"{result.intro_offset_sec:.2f}s of the source before analysis")
    if result.nc_median_bpm and result.src_median_bpm:
        print(f"  Detected BPM       : {result.nc_median_bpm:.1f} (NCOG) vs "
              f"{result.src_median_bpm:.1f} (HQ), medians over windows")
    if result.nc_duration and result.src_duration:
        dr = result.src_duration / result.nc_duration
        print(f"  Trimmed lengths    : {result.nc_duration:.3f}s (NCOG) vs "
              f"{result.src_duration:.3f}s (HQ)"
              f"  ->  length ratio {dr:.6f}× / {1.0 / dr:.6f}×")

    if result.n_source_pitch_windows > 0 and tr > 0:
        pt_diff = abs(pr - tr) / tr
        if pt_diff > PITCH_TEMPO_TOLERANCE:
            extra = -12 * math.log2(pr / tr)
            print(f"\n  Pitch ({pr:.4f}) tracks the tempo ({tr:.4f}) only to "
                  f"{pt_diff * 100:.1f}% — about {extra:+.2f} st of pitch "
                  "processing beyond the plain speed-up.")
        else:
            print("\n  Pitch moved together with tempo: a plain resampling "
                  "speed-up explains both.")
    elif result.n_source_pitch_windows == 0:
        print("\n  (Pitch gets its own step later in the suite.)")

    for w in result.warnings:
        print(f"  Warning: {w[:200]}")

    print()
    if tr > 0:
        inv = 1.0 / tr
        if abs(tr - 1.0) < NEAR_UNITY:
            print("  Swapped-order check: speed ≈ 1.000× either way, so file "
                  "order cannot be confirmed from tempo alone.")
        elif inv < 1.0:
            print(f"  Swapped-order check: reversing the files would give "
                  f"{inv:.6f}× (a slow-down) — the order you gave looks right.")
        else:
            print(f"  Swapped-order check: reversing the files would give "
                  f"{inv:.6f}× (a speed-UP of the 'source') — make sure the "
                  "nightcore really is the first file.")

    hqnc = _hqnc_path(hq)
    print()
    best = result.ibi_regression_ratio or result.ibi_ratio
    if best is not None:
        print("  To render the HQ nightcore, prefer the finest factor:")
        print(f"    sox '{hq}' '{hqnc}' speed {best:.6f}")
        print(f"  (windowed-BPM fallback: speed {tr:.6f})")
    else:
        print("  To render the HQ nightcore:")
        print(f"    sox '{hq}' '{hqnc}' speed {tr:.6f}")
    note = _lossy_note(hq)
    if note:
        print()
        print(note)


def _print_verification_result(result, hqnc: Path, ncog: Path) -> bool:
    """Interpret HQNC-vs-NCOG; True when tempo is within tolerance
    (IBI ±0.5 % preferred over BPM ±2 %, reference workflow.py:380-387)."""
    tr, pr = result.tempo_ratio, result.pitch_ratio
    print()
    _hr("═")
    print("  VERIFICATION  (HQNC vs NCOG — nightcore ↔ nightcore)")
    _hr("═")
    print(f"  {hqnc.name}  <->  {ncog.name}")
    print(f"  Windowed BPM : {tr:.6f}×  (pass band ±{NEAR_UNITY * 100:.0f}%)")
    if result.ibi_ratio is not None:
        lo, hi = result.ibi_ci or (result.ibi_ratio, result.ibi_ratio)
        print(f"  Beat IBIs    : {result.ibi_ratio:.6f}×  "
              f"95% CI [{lo:.6f}, {hi:.6f}]")
    if result.xcorr_ratio is not None:
        q = result.xcorr_quality or 0.0
        if q < XCORR_QUALITY_GATE:
            print(f"  Waveform xcorr: {result.xcorr_ratio:.6f}× at "
                  f"confidence {q:.2f} — below the {XCORR_QUALITY_GATE:.2f} "
                  "gate, ignored")
        else:
            print(f"  Waveform xcorr: {result.xcorr_ratio:.6f}× at "
                  f"confidence {q:.2f} ({quality_label(q)})")
    if result.nc_duration and result.src_duration:
        dr = result.src_duration / result.nc_duration
        print(f"  Trimmed lengths: {result.nc_duration:.3f}s (NCOG) vs "
              f"{result.src_duration:.3f}s (HQNC)  ->  {dr:.6f}× / "
              f"{1.0 / dr:.6f}×")
        len_ratio = result.nc_duration / result.src_duration
        if abs(len_ratio - 1.0) > LEN_RATIO_WARN:
            print(f"\n  ⚠️  The two renditions differ in length by "
                  f"{abs(result.nc_duration - result.src_duration):.3f}s "
                  f"even after silence trimming (ratio {len_ratio:.4f}) — "
                  "typically a different cut (intro/outro or internal edit), "
                  "which old uploads often had.")
        else:
            print(f"  Length check : ratio {len_ratio:.4f}, inside the 0.5% "
                  "band — same cut of the song.")
    print(f"  Pitch        : {pr:.6f}")

    if result.ibi_ratio is not None:
        tempo_ok = abs(result.ibi_ratio - 1.0) < IBI_TOLERANCE
    else:
        tempo_ok = abs(tr - 1.0) < NEAR_UNITY
    pitch_ok = abs(pr - 1.0) < NEAR_UNITY

    print()
    if tempo_ok and pitch_ok:
        print("  Tempo and pitch both land on 1.000× — the rendered HQNC "
              "faithfully recreates the NCOG at full quality.")
    elif tempo_ok:
        st = -12 * math.log2(pr) if pr > 0 else 0.0
        print(f"  Tempo is right, pitch is off by about {st:+.2f} st — the "
              "NCOG carries its own pitch shift; a '--pitch' pass would "
              "remove it.")
    else:
        print(f"  Speed is still {(tr - 1.0) * 100:+.2f}% away from unity.")

    ext_h = hqnc.suffix.lstrip(".").lower()
    ext_n = ncog.suffix.lstrip(".").lower()
    tag = lambda e: ("lossless container" if e in _LOSSLESS_EXTENSIONS  # noqa: E731
                     else "lossy")
    print()
    print(f"  Containers: HQNC {ext_h.upper()} ({tag(ext_h)}), "
          f"NCOG {ext_n.upper()} ({tag(ext_n)}) — the spectral step "
          "grades actual quality (incl. transcode detection).")
    return tempo_ok


from .xcorr import quality_label  # noqa: E402  (reference xcorr.py:262-268)


def _estimate_xcorr(path_a: Path, path_b: Path) -> tuple[float, float]:
    """Waveform-xcorr verify on two files (device program,
    reference xcorr.py:54-162)."""
    import jax.numpy as jnp
    from .signal.io import load_audio
    from .config import DEFAULT_CONFIG, bucket_for_duration, \
        config_for_bucket
    from .ops.verify import estimate_speed_xcorr_arrays
    import jax as _jax

    ya, sr = load_audio(str(path_a))
    yb, _ = load_audio(str(path_b))
    bucket = bucket_for_duration(max(len(ya), len(yb)) / sr)
    cfg = config_for_bucket(DEFAULT_CONFIG, bucket)

    def pad(y):
        buf = np.zeros(cfg.max_samples, np.float32)
        n = min(len(y), cfg.max_samples)
        buf[:n] = y[:n]
        return buf, n

    ba, na = pad(ya)
    bb, nb = pad(yb)
    fn = _jax.jit(lambda a, na_, b, nb_: estimate_speed_xcorr_arrays(
        a, b, na_, nb_, cfg))
    r, q = fn(jnp.asarray(ba), jnp.asarray(na), jnp.asarray(bb), jnp.asarray(nb))
    return float(np.asarray(r)), float(np.asarray(q))


# ── mode: spectral ───────────────────────────────────────────────────────────

def run_spectral_analysis(path_a: Optional[Path] = None,
                          path_b: Optional[Path] = None,
                          label_a: str = "FILE A",
                          label_b: str = "FILE B") -> None:
    print()
    _hr("═")
    print("  SPECTRAL ANALYSIS")
    _hr("═")
    if path_a is None:
        path_a = _prompt_file("File A (reference)")
        label_a = path_a.name
    if path_b is None:
        path_b = _prompt_file("File B (other)")
        label_b = path_b.name
    print()
    stats_a = spec.analyze(str(path_a), label=label_a)
    stats_b = spec.analyze(str(path_b), label=label_b)
    spec.compare_and_print(stats_a, stats_b, label_ref=label_a,
                           label_other=label_b, ref_path=str(path_a),
                           other_path=str(path_b))


# ── mode: loudness ───────────────────────────────────────────────────────────

def run_loudness_adjustment(src: Path) -> None:
    print()
    _hr("═")
    print("  LOUDNESS ADJUSTMENT")
    _hr("═")
    print(f"  Target: {src.name}")
    print()
    print("  Two ways to pull the level down:")
    print("    [l]  true-peak limiter — touches only the samples over the "
          "ceiling (keeps dynamics; the usual choice)")
    print("    [g]  fixed gain — drops the whole track by N dB")
    print()

    current, version = src, 0
    while True:
        print(f"  Measuring peak of {current.name} …")
        peak_db, clipping = lda.detect_peak(current)
        if peak_db == float("-inf"):
            print("  Peak: -inf dBFS — the file contains only silence, "
                  "leaving it untouched.")
            break
        print(f"  Peak: {peak_db:+.2f} dBFS"
              f"{'  !! CLIPPING' if clipping else '  OK'}")

        if not clipping:
            print("\n  Peak stays under 0 dBFS — no clipping to fix.")
            if _prompt_choice("  Adjust anyway?", "yne", "n") != "y":
                print("  Leaving the file as-is.")
                break

        print()
        method = _prompt_choice(
            "  Which method?  [l] true-peak limiter  [g] fixed gain", "lge")
        version += 1
        dst = lda.make_adj_path(src, version)

        if method == "l":
            raw = input("  Limiter ceiling in dBFS (default -0.1): ").strip()
            try:
                limit_db = float(raw) if raw else -0.1
            except ValueError:
                print("  Could not parse that — falling back to -0.1 dBFS.")
                limit_db = -0.1
            limit_db = min(limit_db, 0.0)
            print(f"  Limiting to {limit_db:.1f} dBFS  ->  {dst.name}")
            lda.apply_true_peak_limiter(current, dst, limit_db=limit_db)
        else:
            raw = input("  Gain reduction in dB (default -1.0): ").strip()
            try:
                gain_db = float(raw) if raw else -1.0
            except ValueError:
                print("  Could not parse that — falling back to -1.0 dB.")
                gain_db = -1.0
            gain_db = min(gain_db, 0.0)
            print(f"  Applying {gain_db:.1f} dB  ->  {dst.name}")
            lda.apply_gain_reduction(current, dst, gain_db=gain_db)

        print(f"\n  Re-measuring {dst.name} …")
        new_peak, still = lda.detect_peak(dst)
        print(f"  Peak (after): {new_peak:+.2f} dBFS"
              f"{'  !! still clipping' if still else '  OK'}")
        print("\n  " + (f"Clipping gone — final file: {dst.name}"
                        if not still
                        else "Still clipping; another pass may be needed."))

        if _prompt_choice(
                f"\n  Run another pass (next file would be "
                f"{lda.make_adj_path(src, version + 1).name})?",
                "yne", "n") != "y":
            break
        current = dst

    print()
    _hr()
    print("  Loudness step finished.")
    _hr()


# ── mode: pitch ──────────────────────────────────────────────────────────────

def _pitch_shift_between(src_path: Path, nc_path: Path) -> Optional[tuple]:
    """(ratio, shift_st, n_samples, method) from the device pitch pipeline.

    Prefers the sub-semitone log-spectrum refinement when its agreement
    gate accepts it (the chroma value is 1/3-st grid-quantized, so the
    PS-file correction loop converges much tighter on the refined value)."""
    from .config import DEFAULT_CONFIG, bucket_for_duration, \
        config_for_bucket
    from .analyze.pipeline import analyze_arrays
    from .signal.io import load_audio

    src_audio, sr = load_audio(str(src_path))
    nc_audio, _ = load_audio(str(nc_path))
    cfg = DEFAULT_CONFIG
    try:
        res, pa = analyze_arrays(nc_audio, src_audio, cfg,
                                 log=lambda m: print(f"  {m}"))
    except (RuntimeError, ValueError) as exc:
        print(f"  Pitch analysis failed: {exc}")
        return None
    n = int(np.asarray(pa.n_chunks))
    if bool(np.asarray(pa.pitch_refined_ok)):
        st = float(np.asarray(pa.pitch_refined_st))
        method = "log-spectrum xcorr"
    else:
        st = float(np.asarray(pa.pitch_point_st))
        method = "chroma xcorr"
    return 2.0 ** (st / 12.0), st, n, method


def run_pitch_analysis(src_path: Path, nc_path: Path, *,
                       label: str = "Pitch analysis") -> Optional[Path]:
    """Chroma-xcorr pitch estimate + optional correction loop producing
    PS<n> files until the residual is within ±0.5 st
    (reference workflow.py:591-704)."""
    print()
    _hr()
    print(f"  {label}")
    _hr()
    print(f"  Source file   : {src_path.name}")
    print(f"  Nightcore file: {nc_path.name}")
    print()

    out = _pitch_shift_between(src_path, nc_path)
    if out is None:
        return None
    ratio, shift_st, n_used, method = out

    print()
    _hr("═")
    print("  PITCH SHIFT — RESULT")
    _hr("═")
    print(f"  Ratio {ratio:.6f}  =  {shift_st:+.6f} semitones  "
          f"({method} over {n_used} chunks)")


    if shift_st == 0.0:
        print("\n  The two files sit at the same pitch — nothing to correct.")
        return None
    if abs(shift_st) < PITCH_SIGNIFICANT_ST:
        print(f"\n  Small pitch shift detected: {shift_st:+.6f} st — below "
              f"the {PITCH_SIGNIFICANT_ST} st significance threshold.")
        return None

    print(f"\n  Independent pitch shift detected: {shift_st:+.6f} st above "
          "the speed-up.\n  To reconstruct the original: "
          f"rubberband --pitch {-shift_st:+.6f}  (in addition to --time)")

    version = 0
    current: Optional[Path] = None
    while True:
        version += 1
        nxt = _ps_path(src_path, version)
        print(f"\n  Would create: {nxt.name}")
        if _prompt_choice(f"  Apply pitch correction (--pitch "
                          f"{shift_st:+.6f})?", "yne", "y") != "y":
            break
        create_pitch_shifted_file(current or src_path, nxt, shift_st)
        current = nxt

        print()
        _hr()
        print(f"  Pitch verification  ({nxt.name} vs {nc_path.name})")
        _hr()
        out = _pitch_shift_between(nxt, nc_path)
        if out is None:
            break
        _, shift_st, n_used, method = out
        print()
        _hr("═")
        print("  PITCH — POST-CORRECTION CHECK")
        _hr("═")
        print(f"  Residual shift: {shift_st:+.6f} st  "
              f"({method} over {n_used} chunks)")
        if abs(shift_st) < PITCH_SIGNIFICANT_ST:
            print("\n  Residual is inside the ±0.5 st window — correction done.")
            break
        print(f"\n  Residual {shift_st:+.6f} st still exceeds the 0.5 st "
              "threshold.")
    return current


# ── mode: full suite ─────────────────────────────────────────────────────────

def run_full_suite(hq: Path, ncog: Path, src_trim_sec: float = 0.0) -> None:
    print()
    _hr("═")
    print("  FULL SUITE")
    _hr("═")

    print("\n  Step 1/5 — speed relationship between HQ and NCOG")
    result1 = _run_pipeline(ncog, hq, "Analysing HQ vs NCOG…",
                            src_trim_sec=src_trim_sec, compute_pitch=False)
    _print_speed_result(result1, hq, ncog)

    tr = result1.tempo_ratio
    dur_override: Optional[float] = None
    print()
    if abs(tr - 1.0) < NEAR_UNITY:
        print(f"  ! Speed factor is ~1.000× — no meaningful speed change "
              f"would be applied.\n    Output would be: {_hqnc_path(hq).name}"
              "\n    Check that the correct files were provided (NCOG first, then HQ).")
        if result1.src_duration and result1.nc_duration:
            dr = result1.src_duration / result1.nc_duration
            print(f"\n  Duration ratio (HQ÷NCOG): {dr:.6f}×"
                  "\n  [d] uses this as the speed factor instead of ~1.000×.")
            ans = _prompt_choice("  Create HQNC?", "ydne", "n")
            if ans == "d":
                dur_override, ans = dr, "y"
        else:
            ans = _prompt_choice("  Create HQNC anyway?", "yne", "n")
    elif tr < 1.0:
        print(f"  !! Speed factor is {tr:.6f}× — LESS THAN 1.\n"
              "     This would create a SLOWER version of HQ.  Check file "
              "order (NCOG first, then HQ).")
        ans = _prompt_choice("  Create this slower file anyway?", "yne", "n")
    else:
        ans = _prompt_choice("  Create HQNC (speed up HQ by the detected "
                             "factor)?", "yne", "y")

    current_speed = dur_override
    if current_speed is None:
        # finest first: beat-time regression > median IBI > windowed BPM
        current_speed = (result1.ibi_regression_ratio
                         or result1.ibi_ratio or tr)
    hqnc: Optional[Path] = None
    upd = 0
    if ans == "y":
        hqnc = _hqnc_path(hq, upd)
        create_speed_changed_file(hq, hqnc, current_speed)

    if hqnc and hqnc.is_file():
        attempt = 0
        while True:
            attempt += 1
            label = ("Step 2/5 — Verification  (HQNC vs NCOG)" if attempt == 1
                     else f"Step 2/5 — Re-verification  (attempt {attempt})")
            print(f"\n  {label}")
            result2 = _run_pipeline(ncog, hqnc, "Analysing HQNC vs NCOG…",
                                    compute_pitch=False)
            print("  Running cross-correlation verification…")
            result2.xcorr_ratio, result2.xcorr_quality = _estimate_xcorr(hqnc, ncog)

            if _print_verification_result(result2, hqnc, ncog):
                break

            residual = (result2.ibi_regression_ratio
                        or result2.ibi_ratio or result2.tempo_ratio)
            corrected = current_speed * residual
            upd += 1
            nxt = _hqnc_path(hq, upd)
            estimator = ("IBI regression" if result2.ibi_regression_ratio
                         else "IBI" if result2.ibi_ratio is not None
                         else "BPM")
            print(f"\n  Speed is still off by {(residual - 1.0) * 100:+.2f}%.")
            print(f"  Corrected factor ({estimator}): {current_speed:.6f} × "
                  f"{residual:.6f} = {corrected:.6f}×")
            print(f"  Would create: {nxt.name}")
            if _prompt_choice("  Re-run speed change with corrected factor?",
                              "yne", "y") != "y":
                break
            create_speed_changed_file(hq, nxt, corrected)
            hqnc, current_speed = nxt, corrected
    else:
        print("\n  Step 2/5 — skipped (nothing to verify without an HQNC).")

    print()
    _hr("═")
    print("  Step 3/5 — pitch relationship")
    _hr("═")
    psfile: Optional[Path] = None
    if _prompt_choice("  Run pitch analysis?", "yn", "y") == "y":
        pitch_src = hqnc if (hqnc and hqnc.is_file()) else hq
        psfile = run_pitch_analysis(
            pitch_src, ncog,
            label=f"Step 3/5 — pitch: {pitch_src.name} vs {ncog.name}")

    print()
    _hr("═")
    print("  Step 4/5 — spectral comparison")
    _hr("═")
    if _prompt_choice("  Run spectral analysis?", "yn", "y") == "y":
        best = psfile if (psfile and psfile.is_file()) else hqnc
        if best and best.is_file():
            run_spectral_analysis(best, ncog, best.name, f"NCOG ({ncog.name})")
        else:
            run_spectral_analysis(hq, ncog, f"HQ ({hq.name})",
                                  f"NCOG ({ncog.name})")

    print()
    if _prompt_choice("  Run loudness adjustment? (detects 0 dBFS clipping, "
                      "offers limiter or gain fix)", "yn") == "y":
        target = (psfile if (psfile and psfile.is_file())
                  else hqnc if (hqnc and hqnc.is_file()) else hq)
        print(f"\n  Target: {target.name}")
        run_loudness_adjustment(target)


# ── mode: speed comparison ───────────────────────────────────────────────────

def run_speed_comparison(hq: Path, ncog: Path, src_trim_sec: float = 0.0) -> None:
    print()
    _hr("═")
    print("  SPEED COMPARISON")
    _hr("═")
    result = _run_pipeline(ncog, hq, "Analysing HQ vs NCOG…",
                           src_trim_sec=src_trim_sec)
    _print_speed_result(result, hq, ncog)

    tr, pr = result.tempo_ratio, result.pitch_ratio
    hqnc: Optional[Path] = None
    if abs(tr - 1.0) < NEAR_UNITY and abs(pr - 1.0) < NEAR_UNITY:
        print("\n  Files appear to be at the same speed and pitch — "
              "possibly the same file.")
    elif abs(tr - 1.0) >= NEAR_UNITY:
        print()
        if tr < 1.0:
            print(f"  !! Speed factor is {tr:.6f}× — LESS THAN 1. Check file "
                  "order (NCOG first, then HQ).")
            ans = _prompt_choice("  Create this slower file anyway?", "yne", "n")
        else:
            ans = _prompt_choice("  Create HQNC (speed up HQ by the detected "
                                 "factor)?", "yne", "y")
        if ans == "y":
            hqnc = _hqnc_path(hq)
            speed = result.ibi_regression_ratio or result.ibi_ratio or tr
            create_speed_changed_file(hq, hqnc, speed)

    print()
    if _prompt_choice("  Run spectral analysis?", "yn") == "y":
        if hqnc and hqnc.is_file():
            run_spectral_analysis(hqnc, ncog, f"HQNC ({hqnc.name})",
                                  f"NCOG ({ncog.name})")
        else:
            run_spectral_analysis(hq, ncog, f"HQ ({hq.name})",
                                  f"NCOG ({ncog.name})")


# ── entry point ──────────────────────────────────────────────────────────────

def main() -> None:
    import argparse
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--src-trim-sec", type=float, default=0.0)
    p.add_argument("--classify-parity", action="store_true",
                   help="reference windowed classification (see cli.py)")
    known, rest = p.parse_known_args(sys.argv[1:])
    global CLASSIFY_PARITY
    CLASSIFY_PARITY = known.classify_parity

    ncog_arg = rest[0] if len(rest) > 0 else None
    hq_arg = rest[1] if len(rest) > 1 else None

    print()
    _hr("═")
    print("  NIGHTCORE ANALYZER (TPU) — WORKFLOW")
    _hr("═")
    print("  [f]  full pass: speed -> HQNC render -> verify -> pitch -> spectral -> loudness")
    print("  [s]  speed only (optionally render the HQNC and compare spectra)")
    print("  [p]  pitch only (chroma cross-correlation of two files)")
    print("  [a]  spectral report for any two files")
    print("  [l]  loudness: find clipping, fix with limiter or gain")
    print("  [e]  quit")
    print()

    mode = _prompt_choice("Choose mode", "fspale")
    if mode == "p":
        print()
        hq_p = _prompt_file("Source / HQ file")
        ncog_p = _prompt_file("Nightcore / NCOG file")
        run_pitch_analysis(hq_p, ncog_p, label="Pitch analysis")
        return
    if mode == "a":
        run_spectral_analysis()
        return
    if mode == "l":
        print()
        run_loudness_adjustment(_prompt_file("Audio file to adjust"))
        return

    print()
    ncog = _prompt_file("NCOG (nightcore edit)", ncog_arg)
    hq = _prompt_file("HQ source (original high-quality)", hq_arg)
    if mode == "f":
        run_full_suite(hq, ncog, src_trim_sec=known.src_trim_sec)
    else:
        run_speed_comparison(hq, ncog, src_trim_sec=known.src_trim_sec)


if __name__ == "__main__":
    main()
