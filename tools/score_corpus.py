#!/usr/bin/env python
"""Score a corpus driver run against its ground-truth factors.

Usage:  python tools/score_corpus.py --results results.jsonl \\
            --truth /root/corpus1k_full/truth.csv
Prints the CORPUS_1K.md summary table numbers (analyzable %, per-estimator
error percentiles vs the known speed factors).
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", type=Path, required=True)
    ap.add_argument("--truth", type=Path, required=True)
    args = ap.parse_args()

    truth = {}
    with open(args.truth, newline="") as fh:
        for row in csv.DictReader(fh):
            truth[row["nc"]] = float(row["factor"])

    n_ok = n_err = 0
    errors = {}
    est_errs = {"ibi_ratio": [], "ibi_mean_ratio": [],
                "ibi_regression_ratio": [], "tempo_ratio": []}
    pitch_exact = pitch_total = 0
    cls_counts = {}
    cls2_counts = {}
    cls_modes = set()
    warn_counts = {}
    for line in args.results.read_text().splitlines():
        rec = json.loads(line)
        nc = rec.get("files", {}).get("nightcore")
        if "error" in rec:
            n_err += 1
            errors[nc] = rec["error"]
            continue
        n_ok += 1
        f = truth[nc]
        for k in est_errs:
            v = rec.get(k)
            if v:
                est_errs[k].append(abs(v / f - 1.0) * 100)
        pr = rec.get("pitch_ratio")
        if pr and pr > 0:
            pitch_total += 1
            st = 12.0 * np.log2(pr)   # export rounds ratios to 8 dp
            expect = round(12.0 * np.log2(f) * 3.0) / 3.0
            if abs(st - expect) < 1e-3:
                pitch_exact += 1
        c = rec.get("classification", "?")
        cls_counts[c] = cls_counts.get(c, 0) + 1
        cls_modes.add(rec.get("classification_mode", "windowed"))
        # classify_on_ibi (v2) replicated from the record fields
        from nightcore_analyzer_tpu.analyze.consensus import classify
        best = rec.get("ibi_regression_ratio") or rec.get("ibi_ratio")
        ci = rec.get("ibi_ci_95")
        if best and pr and ci:
            half = max(ci[1] - ci[0], 1e-6) / 2
            c2 = classify(best, pr, (best - half, best + half),
                          tuple(rec.get("pitch_ci_95", (pr, pr))))
            cls2_counts[c2] = cls2_counts.get(c2, 0) + 1
        for w in rec.get("warnings", []):
            key = w.split(".")[0][:60]
            warn_counts[key] = warn_counts.get(key, 0) + 1

    print(f"pairs ok: {n_ok}   errors: {n_err} "
          f"({100.0 * n_ok / max(n_ok + n_err, 1):.1f}% analyzable)")
    for k, v in est_errs.items():
        if not v:
            continue
        a = np.asarray(v)
        print(f"{k:24s} n={len(a):4d}  median {np.median(a):.5f}%  "
              f"p95 {np.percentile(a, 95):.5f}%  max {a.max():.5f}%")
    print(f"pitch exact grid point: {pitch_exact}/{pitch_total}")
    print(f"classifications (as recorded, mode={'/'.join(sorted(cls_modes)) or '?'}): "
          f"{cls_counts}")
    print(f"classifications (v2 classify_on_ibi, replicated): {cls2_counts}")
    if warn_counts:
        print("warnings (first clause):")
        for k, v in sorted(warn_counts.items(), key=lambda kv: -kv[1]):
            print(f"  {v:4d}  {k}")
    if errors:
        print("first 5 errors:")
        for nc, e in list(errors.items())[:5]:
            print(f"  {nc}: {e}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
