"""AnalysisResult — the public result container.

Field-for-field compatible with the reference dataclass
(``consensus.py:66-232``) so exports, the GUI, and downstream tooling can
switch frameworks without changes.  The pretty-printer emits the same
labeled sections (warnings first, classification, ratios with CIs, speed
summary, median BPMs, Rubber Band commands).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

__all__ = ["AnalysisResult"]


@dataclass
class AnalysisResult:
    """Full output of the windowed consensus pipeline (TPU build)."""

    tempo_ratio: float                      # nc tempo / src tempo (>1 = faster)
    pitch_ratio: float                      # nc pitch / src pitch (>1 = higher)
    tempo_ci: Tuple[float, float]
    pitch_ci: Tuple[float, float]
    classification: str                     # pure_nightcore | independent_pitch_shift
    #                                       # | time_stretch_only | ambiguous
    n_source_pitch_windows: int
    n_nc_pitch_windows: int
    n_source_tempo_windows: int
    n_nc_tempo_windows: int
    rubberband: dict = field(default_factory=dict)
    # which tempo evidence produced the classification label: "ibi"
    # (beat-time estimators — the robust default) or "windowed"
    # (reference-parity grid-quantized windowed ratio; also the automatic
    # fallback whenever the IBI pass is invalid)
    classification_mode: str = "windowed"

    # raw per-window data for histograms (GUI)
    src_pitches_raw: Optional[List[Optional[float]]] = None
    nc_pitches_raw: Optional[List[Optional[float]]] = None
    src_tempos_raw: Optional[List[Optional[float]]] = None
    nc_tempos_raw: Optional[List[Optional[float]]] = None

    nc_duration: Optional[float] = None
    src_duration: Optional[float] = None
    nc_median_bpm: Optional[float] = None
    src_median_bpm: Optional[float] = None
    warnings: List[str] = field(default_factory=list)
    pitch_method: Optional[str] = None      # "chroma_xcorr" (| "chroma+melodia")
    # sub-semitone pitch refinement (first-party MELODIA replacement):
    # fine log-spectrum xcorr shift in semitones, accepted only within
    # ±1.5 st of the chroma estimate (None when the gate rejects it)
    pitch_refined_st: Optional[float] = None
    pitch_refined_ci: Optional[Tuple[float, float]] = None
    pitch_refined_quality: Optional[float] = None
    # True when the chroma bootstrap median landed on a 1/6-st grid
    # midpoint (even chunk-vote split) and pitch_ratio was snapped to the
    # grid point nearest the gate-accepted refined estimate
    pitch_grid_arbitrated: bool = False
    ibi_ratio: Optional[float] = None
    ibi_ci: Optional[Tuple[float, float]] = None
    ibi_refined_ratio: Optional[float] = None   # mean-IBI (sub-grid) estimate
    ibi_regression_ratio: Optional[float] = None  # beat-time LS-slope estimate
    # octave-rescue multiplier applied to the IBI estimators (0.5 or 2.0)
    # when a per-side half-/double-time beat lock was detected against the
    # beat-free duration ratio; None = no correction (see consensus.py)
    ibi_octave_corrected: Optional[float] = None
    xcorr_ratio: Optional[float] = None
    xcorr_quality: Optional[float] = None
    intro_offset_sec: Optional[float] = None

    def __str__(self) -> str:
        lines: List[str] = []
        for w in self.warnings:
            lines.append(f"WARNING  : {w}")
        if self.warnings:
            lines.append("")

        lines.append(f"Classification  : {self.classification}"
                     f"  (mode: {self.classification_mode})")

        dur_note = ""
        if self.nc_duration and self.src_duration:
            dr = self.src_duration / self.nc_duration
            dur_note = (f"  |  duration ratio {dr:.6f}×"
                        f" ({self.src_duration:.1f} s / {self.nc_duration:.1f} s)")
        t_lo, t_hi = self.tempo_ci
        lines.append(
            f"Tempo ratio     : {self.tempo_ratio:.6f}"
            f"  95% CI [{t_lo:.6f}, {t_hi:.6f}]"
            f"  (from {self.n_source_tempo_windows} src /"
            f" {self.n_nc_tempo_windows} nc windows)" + dur_note)

        if self.n_source_pitch_windows > 0 or self.n_nc_pitch_windows > 0:
            p_lo, p_hi = self.pitch_ci
            lines.append(
                f"Pitch ratio     : {self.pitch_ratio:.6f}"
                f"  95% CI [{p_lo:.6f}, {p_hi:.6f}]"
                f"  (from {self.n_source_pitch_windows} src /"
                f" {self.n_nc_pitch_windows} nc samples)")
            if self.pitch_method:
                lines.append(f"Pitch method    : {self.pitch_method}")
            if self.pitch_refined_st is not None:
                ci = ""
                if self.pitch_refined_ci is not None:
                    ci = (f"  95% CI [{self.pitch_refined_ci[0]:+.4f},"
                          f" {self.pitch_refined_ci[1]:+.4f}]")
                lines.append(
                    f"Pitch refined   : {self.pitch_refined_st:+.4f} st{ci}"
                    "  (log-spectrum xcorr — finest estimate)")
        else:
            lines.append("Pitch ratio     : not computed in this step")

        if self.ibi_ratio is not None and self.ibi_ci is not None:
            lines.append(
                f"IBI ratio       : {self.ibi_ratio:.6f}"
                f"  95% CI [{self.ibi_ci[0]:.6f}, {self.ibi_ci[1]:.6f}]"
                "  (hop-64 beat timestamps — highest precision)")
        if self.ibi_refined_ratio is not None:
            lines.append(
                f"IBI mean ratio  : {self.ibi_refined_ratio:.6f}"
                "  (grid-interpolating mean)")
        if self.ibi_regression_ratio is not None:
            lines.append(
                f"IBI regression  : {self.ibi_regression_ratio:.6f}"
                "  (beat-time least-squares slope — finest estimate)")

        tr = self.tempo_ratio
        if tr > 0:
            lines.append("")
            lines.append(f"Speed summary   : nightcore is {tr:.4f}× the source speed")
            lines.append(f"                  to hear original tempo → play nightcore at {1.0 / tr:.4f}× speed")
            lines.append(f"                  (source was sped up by {tr:.4f}× to create the nightcore)")

        if self.nc_median_bpm is not None and self.src_median_bpm is not None:
            lines.append(
                f"Median BPMs     : nightcore {self.nc_median_bpm:.2f}  |"
                f"  source {self.src_median_bpm:.2f}"
                f"  (raw detected; ratio = {self.nc_median_bpm / self.src_median_bpm:.6f})")

        rb = self.rubberband
        _src_label = {"ibi_regression": "IBI regression",
                      "ibi_median": "IBI median",
                      "windowed": "windowed BPM",
                      "refined": "refined pitch",
                      "chroma_grid": "chroma grid"}
        lines.append("")
        if "time_ratio" in rb:
            ts = _src_label.get(rb.get("time_source", "windowed"), "?")
            ps = _src_label.get(rb.get("pitch_source", "chroma_grid"), "?")
            lines.append(
                f"Rubber Band     : --time {rb['time_ratio']:.6f}"
                f"  --pitch {rb['pitch_semitones']:.4f} st"
                f"  (best estimate: {ts} + {ps})")
            lines.append(f"CLI (best)      : {rb.get('cli_command', '')}")
        if rb.get("windowed_cli_command") and \
                rb.get("time_source", "windowed") != "windowed":
            lines.append(
                f"Windowed        : --time {rb['windowed_time_ratio']:.6f}"
                f"  --pitch {rb['windowed_pitch_semitones']:.4f} st"
                "  (reference-parity grid-quantized estimators)")
            lines.append(f"CLI (windowed)  : {rb['windowed_cli_command']}")
        if rb.get("duration_time_ratio"):
            lines.append(
                f"Duration-based  : --time {rb['duration_time_ratio']:.6f}"
                f"  --pitch {rb['duration_pitch_semitones']:.4f} st"
                "  (uses file-length ratio — prefer this when CI is degenerate)")
            lines.append(f"CLI (duration)  : {rb.get('duration_cli_command', '')}")

        return "\n".join(lines)
