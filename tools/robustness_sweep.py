#!/usr/bin/env python
"""Robustness sweep: estimator degradation curves off the bench's happy path.

The bench corpus (bench.py::make_corpus) carries ±0.8 % tempo drift — the
round-2 review asked where the 0.0002 % regression-estimator claim actually
holds (reference README.md:39 claims ~0.01 % without qualifying material).
This sweep measures all three IBI estimators + the chroma pitch grid under:

* stronger sinusoidal tempo drift (±2 %, ±3 %),
* swing (odd beats delayed 8 % / 16 % of a period — alternating IBIs),
* broadband noise (17 dB and 11 dB SNR),
* quiet/loud macro structure (±50 % section gains).

Every condition is a (source, speed_shift(source)) pure-nightcore pair, so
the ground-truth ratio is exact and shared beat structure means an ideal
estimator still recovers the factor exactly; what degrades is beat-tracker
stability and frame/lag quantization interplay.  One corpus program is
compiled (B pairs, one bucket) and reused across conditions.

Results go to stdout as a markdown table (pasted into BENCH_NOTES.md).

Usage:  python tools/robustness_sweep.py [--pairs 16] [--duration 55]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"))

CONDITIONS = [
    # (label, music_like kwargs)
    ("drift ±0.8% (bench baseline)", dict(tempo_drift=0.008)),
    ("drift ±2%", dict(tempo_drift=0.02)),
    ("drift ±3%", dict(tempo_drift=0.03)),
    ("swing 8%", dict(tempo_drift=0.008, swing=0.08)),
    ("swing 16%", dict(tempo_drift=0.008, swing=0.16)),
    ("noise 17 dB SNR", dict(tempo_drift=0.008, noise_level=0.1)),
    ("noise 11 dB SNR", dict(tempo_drift=0.008, noise_level=0.2)),
    ("section gains ±50%", dict(tempo_drift=0.008, section_gains=0.5)),
    # compound stress: the octave rescue must keep firing when the noise
    # floor is active and the material is both swung AND noisy (round 4)
    ("swing 8% + 17 dB", dict(tempo_drift=0.008, swing=0.08,
                              noise_level=0.1)),
    # the onset-floor gate fires at 11 dB (med/mean > 0.95) even with
    # swing present — this row pins that the conditioning helps (or at
    # least never converts a rescuable octave lock into unrescuable
    # corruption) on the compound worst case
    ("swing 8% + 11 dB", dict(tempo_drift=0.008, swing=0.08,
                              noise_level=0.2)),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=16)
    ap.add_argument("--duration", type=float, default=55.0)
    args = ap.parse_args()

    from nightcore_analyzer_tpu.config import DEFAULT_CONFIG, bucket_for_duration
    from nightcore_analyzer_tpu.batch.corpus import CorpusAnalyzer, PairBuffers
    from nightcore_analyzer_tpu.utils import synth

    B, dur = args.pairs, args.duration
    cfg = DEFAULT_CONFIG.replace(
        max_duration_sec=bucket_for_duration(dur + 1.0))
    analyzer = CorpusAnalyzer(cfg)

    rows = []
    for label, kw in CONDITIONS:
        t0 = time.time()
        bufs = PairBuffers(
            nc=np.zeros((B, cfg.max_samples), np.float32),
            n_nc=np.zeros(B, np.int32),
            src=np.zeros((B, cfg.max_samples), np.float32),
            n_src=np.zeros(B, np.int32),
            src_trim=np.zeros(B, np.int32),
            mask=np.ones(B, bool))
        factors = np.empty(B)
        for i in range(B):
            bpm = [122.0, 128.0, 140.0, 150.0][i % 4]
            factor = [1.18, 1.22, 1.25, 1.30][(i // 4) % 4]
            src = synth.music_like(dur, cfg.sample_rate, bpm=bpm, seed=i, **kw)
            nc = synth.speed_shift(src, factor)
            bufs.src[i, :len(src)] = src
            bufs.n_src[i] = len(src)
            bufs.nc[i, :len(nc)] = nc
            bufs.n_nc[i] = len(nc)
            factors[i] = factor
        print(f"[{label}] corpus built in {time.time() - t0:.0f}s; analyzing…",
              file=sys.stderr, flush=True)
        t0 = time.time()
        out = analyzer.run_device(analyzer.put_buffers(bufs))
        pa, _ = analyzer._unpack(np.asarray(out[0]), np.asarray(out[1]))
        print(f"  analyzed in {time.time() - t0:.1f}s", file=sys.stderr,
              flush=True)

        err = lambda v: np.abs(  # noqa: E731
            np.asarray(v, np.float64) / factors - 1.0) * 100
        ibi, mean_, reg = (err(pa.ibi_ratio), err(pa.ibi_refined_ratio),
                           err(pa.ibi_regression_ratio))
        st = np.asarray(pa.pitch_point_st, np.float64)
        expect = np.round(12.0 * np.log2(factors) * 3.0) / 3.0
        hits = int(np.sum(np.abs(st - expect) < 1e-6))
        # sub-semitone refined estimator (ops/f0.py log-spectrum xcorr):
        # cents error where its agreement gate accepted
        ref_ok = np.asarray(pa.pitch_refined_ok, bool)
        ref_err_c = np.abs(np.asarray(pa.pitch_refined_st, np.float64)
                           - 12.0 * np.log2(factors))[ref_ok] * 100.0
        ref_med = float(np.median(ref_err_c)) if ref_ok.any() else float("nan")
        ref_n = f"{int(ref_ok.sum())}/{B}"
        # decision-level: through results_from_pa, i.e. including the
        # host-side IBI octave rescue (consensus.py) — what a user sees
        # audio providers arm the rescue's envelope third leg (round 5) —
        # the decision level under measurement is the full production one
        providers = [
            lambda i=i: (bufs.nc[i, :bufs.n_nc[i]],
                         bufs.src[i, :bufs.n_src[i]])
            for i in range(B)]
        results = analyzer.results_from_pa(pa, B, audio_providers=providers)
        final = np.array([
            (r.ibi_regression_ratio or np.nan)
            if not isinstance(r, str) else np.nan
            for r in results])
        fin = err(final)
        n_rescued = int(sum(
            0 if isinstance(r, str) else (r.ibi_octave_corrected is not None)
            for r in results))
        # decision-level pitch: result.pitch_ratio includes the host-side
        # grid-midpoint arbitration (round 5) — what a user actually gets
        fhits = n_arb = 0
        for r, f in zip(results, factors):
            if isinstance(r, str) or r.pitch_ratio <= 0:
                continue
            got_st = 12.0 * np.log2(r.pitch_ratio)
            want_st = np.round(12.0 * np.log2(f) * 3.0) / 3.0
            fhits += int(abs(got_st - want_st) < 1e-3)
            n_arb += int(r.pitch_grid_arbitrated)
        rows.append((label,
                     np.median(ibi), np.max(ibi),
                     np.median(mean_), np.max(mean_),
                     np.median(reg), np.max(reg),
                     np.nanmedian(fin), np.nanmax(fin),
                     f"{hits}/{B}", f"{fhits}/{B}({n_arb})",
                     n_rescued, ref_med, ref_n))

    print(f"\n### Robustness sweep ({B} pairs × {dur:.0f} s per condition, "
          "pure-nightcore pairs, errors in % of true factor; 'final' = "
          "decision-level regression estimator incl. octave rescue)\n")
    print("| condition | IBI med | IBI max | mean med | mean max "
          "| regr med | regr max | final med | final max | pitch grid "
          "| final pitch(arb) | rescued | refined med (cents) "
          "| refined ok |")
    print("|---|---|---|---|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r[0]} | " + " | ".join(f"{v:.5f}" for v in r[1:9])
              + f" | {r[9]} | {r[10]} | {r[11]} | {r[12]:.2f} | {r[13]} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
