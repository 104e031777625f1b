"""Export AnalysisResult to JSON or CSV.

Same schema as the reference exporter (``export.py:20-98``) — the JSON
mirrors the CLI output (incl. durations / median BPMs / rubberband blocks),
the CSV flattens nested fields into one header + one data row — so existing
downstream consumers keep working unchanged.
"""

from __future__ import annotations

import csv
import json
from pathlib import Path
from typing import Union

from .analyze.result import AnalysisResult

PathLike = Union[str, Path]

__all__ = ["to_dict", "export_json", "export_csv"]


def to_dict(result: AnalysisResult) -> dict:
    """JSON-serializable dict in the reference CLI schema (``export.py:20-48``).

    Additive fields beyond the reference schema (existing consumers keep
    working; new consumers should prefer them): ``classification_mode``
    ("ibi" robust default / "windowed" parity), the IBI estimators
    (``ibi_ratio``/``ibi_mean_ratio``/``ibi_regression_ratio`` +
    ``ibi_octave_corrected``), the refined pitch
    (``pitch_refined_st``/``pitch_refined_ci_95`` +
    ``pitch_grid_arbitrated``), and inside ``rubberband`` the
    ``time_source``/``pitch_source`` labels plus the ``windowed_*``
    reference-parity command (the primary ``cli_command`` carries the
    best-estimate reconstruction)."""
    d = {
        "classification": result.classification,
        "classification_mode": result.classification_mode,
        "warnings": result.warnings,
        "tempo_ratio": round(result.tempo_ratio, 8),
        "pitch_ratio": round(result.pitch_ratio, 8),
        "tempo_ci_95": [round(result.tempo_ci[0], 8), round(result.tempo_ci[1], 8)],
        "pitch_ci_95": [round(result.pitch_ci[0], 8), round(result.pitch_ci[1], 8)],
        "windows_used": {
            "source_pitch": result.n_source_pitch_windows,
            "nightcore_pitch": result.n_nc_pitch_windows,
            "source_tempo": result.n_source_tempo_windows,
            "nightcore_tempo": result.n_nc_tempo_windows,
        },
        "rubberband": result.rubberband,
        "durations": {
            "nightcore_sec": round(result.nc_duration, 3) if result.nc_duration else None,
            "source_sec": round(result.src_duration, 3) if result.src_duration else None,
            "duration_ratio": (round(result.src_duration / result.nc_duration, 8)
                               if result.nc_duration and result.src_duration else None),
        },
        "median_bpms": {
            "nightcore": round(result.nc_median_bpm, 2) if result.nc_median_bpm else None,
            "source": round(result.src_median_bpm, 2) if result.src_median_bpm else None,
        },
    }
    if result.ibi_ratio is not None and result.ibi_ci is not None:
        d["ibi_ratio"] = round(result.ibi_ratio, 8)
        d["ibi_ci_95"] = [round(result.ibi_ci[0], 8), round(result.ibi_ci[1], 8)]
    if result.ibi_refined_ratio is not None:
        d["ibi_mean_ratio"] = round(result.ibi_refined_ratio, 8)
    if result.ibi_regression_ratio is not None:
        d["ibi_regression_ratio"] = round(result.ibi_regression_ratio, 8)
    if result.ibi_octave_corrected is not None:
        d["ibi_octave_corrected"] = result.ibi_octave_corrected
    if result.pitch_refined_st is not None:
        d["pitch_refined_st"] = round(result.pitch_refined_st, 6)
        if result.pitch_refined_ci is not None:
            d["pitch_refined_ci_95"] = [round(result.pitch_refined_ci[0], 6),
                                        round(result.pitch_refined_ci[1], 6)]
    if result.pitch_grid_arbitrated:
        d["pitch_grid_arbitrated"] = True
    return d


def export_json(result: AnalysisResult, path: PathLike) -> None:
    Path(path).write_text(json.dumps(to_dict(result), indent=2), encoding="utf-8")


def export_csv(result: AnalysisResult, path: PathLike) -> None:
    """Single-row flattened CSV (reference ``export.py:56-98``)."""
    rb = result.rubberband
    row = {
        "classification": result.classification,
        "classification_mode": result.classification_mode,
        "tempo_ratio": round(result.tempo_ratio, 8),
        "pitch_ratio": round(result.pitch_ratio, 8),
        "tempo_ci_95_lo": round(result.tempo_ci[0], 8),
        "tempo_ci_95_hi": round(result.tempo_ci[1], 8),
        "pitch_ci_95_lo": round(result.pitch_ci[0], 8),
        "pitch_ci_95_hi": round(result.pitch_ci[1], 8),
        "source_pitch_windows": result.n_source_pitch_windows,
        "nightcore_pitch_windows": result.n_nc_pitch_windows,
        "source_tempo_windows": result.n_source_tempo_windows,
        "nightcore_tempo_windows": result.n_nc_tempo_windows,
        "rb_time_ratio": rb.get("time_ratio", ""),
        "rb_pitch_semitones": rb.get("pitch_semitones", ""),
        "rb_nc_to_source_speed": rb.get("nc_to_source_speed", ""),
        "rb_cli_command": rb.get("cli_command", ""),
        "rb_time_source": rb.get("time_source", ""),
        "rb_pitch_source": rb.get("pitch_source", ""),
        "rb_windowed_time_ratio": rb.get("windowed_time_ratio", ""),
        "rb_windowed_pitch_semitones": rb.get("windowed_pitch_semitones", ""),
        "rb_windowed_cli_command": rb.get("windowed_cli_command", ""),
        "rb_dur_time_ratio": rb.get("duration_time_ratio", ""),
        "rb_dur_pitch_semitones": rb.get("duration_pitch_semitones", ""),
        "rb_dur_cli_command": rb.get("duration_cli_command", ""),
        "nc_median_bpm": round(result.nc_median_bpm, 2) if result.nc_median_bpm else "",
        "src_median_bpm": round(result.src_median_bpm, 2) if result.src_median_bpm else "",
        "nc_duration_sec": round(result.nc_duration, 3) if result.nc_duration else "",
        "src_duration_sec": round(result.src_duration, 3) if result.src_duration else "",
        "duration_ratio": (round(result.src_duration / result.nc_duration, 8)
                           if result.nc_duration and result.src_duration else ""),
        "ibi_ratio": round(result.ibi_ratio, 8) if result.ibi_ratio else "",
        "warnings": " | ".join(result.warnings),
    }
    with open(path, "w", newline="", encoding="utf-8") as fh:
        writer = csv.DictWriter(fh, fieldnames=list(row.keys()))
        writer.writeheader()
        writer.writerow(row)
