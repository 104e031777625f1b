"""Corpus batch driver: analyze a manifest of file pairs at TPU scale.

The reference analyzes one pair per process invocation; this driver is the
production corpus path the TPU build exists for:

    python -m nightcore_analyzer_tpu.batch \\
        --manifest pairs.csv --output results.jsonl [--batch 32]

Manifest: CSV (or TSV) with two columns per row — nightcore path, source
path — optionally a third column with a per-pair ``src_trim_sec``.  Pairs
are decoded on the host (C++ codec), grouped into duration buckets (one XLA
compilation per bucket), packed into batches, and analyzed with the
mesh-sharded corpus program; one JSON object per pair is appended to the
output (the CLI schema plus a ``files`` block), with decode/compile/compute
progress on stderr.
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
import time
from collections import defaultdict
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from ..config import DEFAULT_CONFIG, bucket_for_duration
from .corpus import CorpusAnalyzer

__all__ = ["main", "analyze_manifest"]


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def read_manifest(path: Path) -> List[Tuple[str, str, float]]:
    rows: List[Tuple[str, str, float]] = []
    delim = "\t" if path.suffix.lower() in (".tsv", ".tab") else ","
    with open(path, newline="", encoding="utf-8") as fh:
        for row in csv.reader(fh, delimiter=delim):
            if not row or row[0].lstrip().startswith("#"):
                continue
            nc, src = row[0].strip(), row[1].strip()
            trim = float(row[2]) if len(row) > 2 and row[2].strip() else 0.0
            rows.append((nc, src, trim))
    return rows


def analyze_manifest(manifest: Path, output: Path, *, batch: int = 32,
                     compute_pitch: bool = True, resume: bool = False,
                     log=_log) -> Tuple[int, int]:
    """Returns (n_ok, n_failed).

    ``resume=True`` makes runs restartable (SURVEY §5 checkpoint/resume):
    pairs whose (nightcore, source) paths already have a non-error record in
    ``output`` are skipped and their records carried over.
    """
    from ..signal.io import load_audio
    from .. import export

    rows = read_manifest(manifest)
    log(f"manifest: {len(rows)} pairs")

    done: dict = {}
    if resume and output.exists():
        for line in output.read_text(encoding="utf-8").splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            files = rec.get("files", {})
            if "error" not in rec and files:
                done[(files.get("nightcore"), files.get("source"))] = rec
        log(f"resume: {len(done)} pairs already complete in {output}")

    # ── decode + bucket ──────────────────────────────────────────────────────
    buckets: dict = defaultdict(list)    # bucket_sec -> [(idx, nc, src, trim)]
    failed: dict = {}
    t0 = time.time()
    for idx, (nc_path, src_path, trim) in enumerate(rows):
        if (nc_path, src_path) in done:
            continue
        try:
            nc, sr = load_audio(nc_path)
            src, _ = load_audio(src_path)
        except Exception as exc:
            failed[idx] = f"decode failed: {exc}"
            log(f"  [{idx}] decode failed: {exc}")
            continue
        b = bucket_for_duration(max(len(nc), len(src)) / sr)
        buckets[b].append((idx, nc, src, trim))
    log(f"decoded {sum(len(v) for v in buckets.values())}/{len(rows)} pairs "
        f"in {time.time() - t0:.1f}s; buckets: "
        f"{ {k: len(v) for k, v in sorted(buckets.items())} }")

    results_by_idx: dict = {}
    for bucket_sec in sorted(buckets):
        entries = buckets[bucket_sec]
        cfg = DEFAULT_CONFIG.replace(max_duration_sec=bucket_sec)
        analyzer = CorpusAnalyzer(cfg, compute_pitch=compute_pitch)
        for lo in range(0, len(entries), batch):
            part = entries[lo:lo + batch]
            t0 = time.time()
            res, stats = analyzer.analyze_pairs(
                [(e[1], e[2]) for e in part],
                src_trim_sec=[e[3] for e in part])
            log(f"  bucket {bucket_sec:.0f}s: {len(part)} pairs in "
                f"{time.time() - t0:.1f}s "
                f"(mean tempo {float(np.asarray(stats.mean_tempo_ratio)):.4f})")
            for (idx, *_), r in zip(part, res):
                results_by_idx[idx] = r

    # ── emit JSONL in manifest order ─────────────────────────────────────────
    n_ok = n_fail = 0
    with open(output, "w", encoding="utf-8") as fh:
        for idx, (nc_path, src_path, trim) in enumerate(rows):
            prev = done.get((nc_path, src_path))
            if prev is not None:
                fh.write(json.dumps(prev) + "\n")
                n_ok += 1
                continue
            rec = {"files": {"nightcore": nc_path, "source": src_path}}
            r = results_by_idx.get(idx)
            if idx in failed:
                rec["error"] = failed[idx]
                n_fail += 1
            elif isinstance(r, str) or r is None:
                rec["error"] = r or "not analyzed"
                n_fail += 1
            else:
                rec.update(export.to_dict(r))
                n_ok += 1
            fh.write(json.dumps(rec) + "\n")
    log(f"wrote {output} ({n_ok} ok, {n_fail} failed)")
    return n_ok, n_fail


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m nightcore_analyzer_tpu.batch",
        description="Batch-analyze a manifest of (nightcore, source) pairs "
                    "on TPU.")
    ap.add_argument("--manifest", required=True, type=Path,
                    help="CSV/TSV: nightcore_path, source_path[, src_trim_sec]")
    ap.add_argument("--output", required=True, type=Path,
                    help="JSONL output (one result object per pair)")
    ap.add_argument("--batch", type=int, default=32,
                    help="pairs per device batch")
    ap.add_argument("--no-pitch", action="store_true",
                    help="skip the chroma pitch stage")
    ap.add_argument("--resume", action="store_true",
                    help="skip pairs already completed in --output")
    args = ap.parse_args(argv)

    if not args.manifest.is_file():
        print(f"ERROR: manifest not found: {args.manifest}", file=sys.stderr)
        return 2
    n_ok, n_fail = analyze_manifest(args.manifest, args.output,
                                    batch=args.batch,
                                    compute_pitch=not args.no_pitch,
                                    resume=args.resume)
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
