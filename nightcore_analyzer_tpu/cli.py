"""Command-line interface.

Flag-for-flag compatible with the reference CLI (``cli.py:37-126``; flag
table in the reference README): same required inputs, tunables, validation
rules (missing files / hop ≥ window → exit 2), JSON output schema
(``cli.py:171-196``), human summary, and exit codes (0 ok / 1 analysis
error / 2 bad invocation).

Usage
-----
python -m nightcore_analyzer_tpu.cli \\
    --nightcore /path/to/nightcore.flac \\
    --source    /path/to/original.flac \\
    --output    results.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from .signal.io import WINDOW_SEC, HOP_SEC, ENERGY_GATE_DB, SILENCE_STRIP_DB

__all__ = ["main", "build_parser"]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m nightcore_analyzer_tpu.cli",
        description=(
            "Extract the precise tempo ratio and pitch ratio between a "
            "nightcore track and its FLAC source (TPU-accelerated), then "
            "emit the Rubber Band parameters needed to reconstruct the "
            "original."),
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--nightcore", "-n", required=True, metavar="FILE",
                   help="Nightcore audio file (FLAC or WAV)")
    p.add_argument("--source", "-s", required=True, metavar="FILE",
                   help="Source FLAC (the original the nightcore was made from)")
    p.add_argument("--output", "-o", metavar="FILE",
                   help="Write JSON results here (default: stdout)")
    p.add_argument("--window", type=float, default=WINDOW_SEC, metavar="SEC",
                   help="Analysis window duration in seconds")
    p.add_argument("--hop", type=float, default=HOP_SEC, metavar="SEC",
                   help="Hop between windows in seconds (< --window)")
    p.add_argument("--energy-gate", type=float, default=ENERGY_GATE_DB,
                   metavar="DB",
                   help="Discard windows below peak + ENERGY_GATE dB "
                        "(more negative keeps quieter sections)")
    p.add_argument("--silence-strip-db", type=float, default=SILENCE_STRIP_DB,
                   metavar="DB",
                   help="Top-dB threshold for trimming leading/trailing "
                        "silence (ignored with --no-silence-strip)")
    p.add_argument("--no-silence-strip", action="store_true",
                   help="Disable leading/trailing silence stripping")
    p.add_argument("--src-trim-sec", type=float, default=0.0, metavar="SEC",
                   help="Manually trim this many seconds from the source "
                        "start (intro not present in the nightcore); "
                        "overrides --auto-align")
    p.add_argument("--auto-align", action="store_true", default=False,
                   help="Automatic intro-offset detection via RMS envelope "
                        "correlation (unreliable on repetitive material; "
                        "prefer --src-trim-sec)")
    # shared dest + store_true/false makes the pair genuinely exclusive
    # (combining them is an argparse error, not a silent parity win —
    # round-4 advisor finding)
    cgrp = p.add_mutually_exclusive_group()
    cgrp.add_argument("--classify-on-ibi", dest="classify_on_ibi",
                      action="store_true", default=True,
                      help=argparse.SUPPRESS)   # the default; kept for compat
    cgrp.add_argument("--classify-parity", dest="classify_on_ibi",
                      action="store_false",
                      help="Classify on the grid-quantized windowed tempo ratio "
                        "exactly like the reference (its BPM-grid snap is "
                        "2-5%% at 120-150 BPM, wider than the 2%% "
                        "classification tolerance, so constant-tempo "
                        "material often misclassifies).  Default is the "
                        "robust beat-time (IBI) classification.")
    p.add_argument("--quiet", "-q", action="store_true",
                   help="Suppress progress output (errors still go to stderr)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    nc_path = Path(args.nightcore)
    src_path = Path(args.source)

    errors = []
    if not nc_path.exists():
        errors.append(f"Nightcore file not found: {nc_path}")
    if not src_path.exists():
        errors.append(f"Source file not found:    {src_path}")
    if args.hop >= args.window:
        errors.append("--hop must be less than --window for overlapping windows")
    if errors:
        for e in errors:
            print(f"ERROR: {e}", file=sys.stderr)
        return 2

    from .analyze import pipeline

    log = None if args.quiet else print
    silence_db = None if args.no_silence_strip else args.silence_strip_db

    try:
        result = pipeline.run(
            str(nc_path), str(src_path),
            window_sec=args.window, hop_sec=args.hop,
            energy_gate_db=args.energy_gate, silence_strip_db=silence_db,
            src_trim_sec=args.src_trim_sec,
            auto_align=args.auto_align and args.src_trim_sec == 0.0,
            classify_on_ibi=args.classify_on_ibi,
            log=log)
    except Exception as exc:
        print(f"\nERROR: {exc}", file=sys.stderr)
        return 1

    output = {
        "classification": result.classification,
        "classification_mode": result.classification_mode,
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
    }
    json_text = json.dumps(output, indent=2)

    if args.output:
        Path(args.output).write_text(json_text, encoding="utf-8")
        if not args.quiet:
            print(f"\nResults written to: {args.output}")
    else:
        print()
        print(json_text)

    if not args.quiet:
        print()
        print(result)
    return 0


if __name__ == "__main__":
    sys.exit(main())
