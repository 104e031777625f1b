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
import gc
import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from ..config import DEFAULT_CONFIG, bucket_for_duration, \
    config_for_bucket, truncation_warning
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


def _decode_workers() -> int:
    """Decode thread count: ``NCFA_DECODE_THREADS`` env or one per core
    (capped at 8 — decode is the streaming driver's bottleneck on real
    files, 16-36 s/batch vs ~2 s device compute in CORPUS_1K; the ctypes
    codec calls release the GIL and the native error state is
    thread_local, so threads scale on multi-core production hosts)."""
    env = os.environ.get("NCFA_DECODE_THREADS", "")
    if env.strip():
        return max(1, int(env))
    return min(8, os.cpu_count() or 1)


def _decode_batch(entries, cfg, load_audio, log, workers: int | None = None):
    """Decode (thread pool) + pack one batch of manifest entries.

    Returns (PairBuffers, metas) where ``metas`` is a list of
    ``(idx, nc_path, src_path, error_or_None, truncated_sec)`` aligned with
    buffer rows.  Decode failures zero their row and clear its mask bit so
    the device program skips it (per-pair error records, SURVEY §5 failure
    handling).
    """
    from concurrent.futures import ThreadPoolExecutor
    from .corpus import PairBuffers, pack_pair
    B = len(entries)
    bufs = PairBuffers(
        nc=np.zeros((B, cfg.max_samples), np.float32),
        n_nc=np.zeros(B, np.int32),
        src=np.zeros((B, cfg.max_samples), np.float32),
        n_src=np.zeros(B, np.int32),
        src_trim=np.zeros(B, np.int32),
        mask=np.ones(B, bool))

    def decode_one(entry):
        _idx, nc_path, src_path, _trim = entry
        try:
            nc, _sr = load_audio(nc_path)
            src, _ = load_audio(src_path)
            return np.asarray(nc), np.asarray(src), None
        except Exception as exc:                       # noqa: BLE001
            return None, None, f"decode failed: {exc}"

    n_workers = workers if workers is not None else _decode_workers()
    if n_workers > 1 and B > 1:
        with ThreadPoolExecutor(max_workers=n_workers) as ex:
            decoded = list(ex.map(decode_one, entries))
    else:
        decoded = [decode_one(e) for e in entries]

    metas = []
    for i, ((idx, nc_path, src_path, trim), (nc, src, err)) in enumerate(
            zip(entries, decoded)):
        if err is not None:
            bufs.mask[i] = False
            metas.append((idx, nc_path, src_path, err, 0.0))
            log(f"  [{idx}] {err}")
            continue
        bnc, n_nc, bsrc, n_src, trunc = pack_pair(nc, src, cfg)
        bufs.nc[i], bufs.n_nc[i] = bnc, n_nc
        bufs.src[i], bufs.n_src[i] = bsrc, n_src
        bufs.src_trim[i] = int(trim * cfg.sample_rate)
        if trunc > 0:
            log(f"  [{idx}] WARNING: input exceeds the "
                f"{cfg.max_duration_sec:.0f}s bucket by {trunc:.1f}s — "
                "tail not analyzed")
        metas.append((idx, nc_path, src_path, None, trunc))
    return bufs, metas


def analyze_manifest(manifest: Path, output: Path, *, batch: int = 32,
                     compute_pitch: bool = True, resume: bool = False,
                     classify_on_ibi: bool = True,
                     log=_log) -> Tuple[int, int]:
    """Returns (n_ok, n_failed).

    Streaming design (round 2): the manifest is bucketed by *header-probed*
    duration (no decode), then each batch is decoded just-in-time and the
    NEXT batch's decode + host→device transfer overlaps the device's compute
    on the current one — host RSS stays bounded at ~2 batches of audio
    regardless of manifest size (the round-1 driver decoded everything up
    front: tens of GB at the 1000-pair scale).  Records are appended to the
    JSONL as each batch completes, so a killed run loses at most one batch
    (``--resume`` picks up from the file).

    ``resume=True`` makes runs restartable (SURVEY §5 checkpoint/resume):
    pairs whose (nightcore, source) paths already have a non-error record in
    ``output`` are skipped and their records carried over.
    """
    from ..signal.io import load_audio
    from .. import export
    from .. import native

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

    # ── bucket by header-probed duration (no decode) ─────────────────────────
    buckets: dict = defaultdict(list)  # bucket_sec -> [(idx, nc, src, trim)]
    failed: dict = {}
    t0 = time.time()
    for idx, (nc_path, src_path, trim) in enumerate(rows):
        if (nc_path, src_path) in done:
            continue
        try:
            dur = max(native.probe_duration(nc_path),
                      native.probe_duration(src_path))
        except Exception as exc:                       # noqa: BLE001
            failed[idx] = f"probe failed: {exc}"
            log(f"  [{idx}] probe failed: {exc}")
            continue
        buckets[bucket_for_duration(dur)].append((idx, nc_path, src_path, trim))
    log(f"probed {sum(len(v) for v in buckets.values())}/{len(rows)} pairs "
        f"in {time.time() - t0:.1f}s; buckets: "
        f"{ {k: len(v) for k, v in sorted(buckets.items())} }")

    n_ok = n_fail = 0
    with open(output, "w", encoding="utf-8") as fh:
        def emit(rec):
            fh.write(json.dumps(rec) + "\n")
            fh.flush()

        # carried-over + probe-failure records first
        for (nc_path, src_path), rec in done.items():
            emit(rec)
            n_ok += 1
        for idx, err in failed.items():
            nc_path, src_path, _ = rows[idx]
            emit({"files": {"nightcore": nc_path, "source": src_path},
                  "error": err})
            n_fail += 1

        # ── streamed batches: decode N+1 while the device runs N ────────────
        for bucket_sec in sorted(buckets):
            entries = buckets[bucket_sec]
            cfg = config_for_bucket(DEFAULT_CONFIG, bucket_sec)
            analyzer = CorpusAnalyzer(cfg, compute_pitch=compute_pitch,
                                      donate=True)
            # host-side consensus override (device program unchanged)
            cons_cfg = cfg.replace(classify_on_ibi=classify_on_ibi)
            parts = [entries[lo:lo + batch]
                     for lo in range(0, len(entries), batch)]

            bufs, metas = _decode_batch(parts[0], cfg, load_audio, log)
            dev_args = analyzer.put_buffers(analyzer.pad_batch(bufs))
            for bi in range(len(parts)):
                t0 = time.time()
                out = analyzer.run_device(dev_args)    # async dispatch
                cur_metas = metas
                # drop host+device refs to the dispatched batch NOW — without
                # this, transfer buffers survive one extra iteration and host
                # RSS climbs by a full batch of audio per step (measured on
                # the 1000-pair demo: ~0.5 GB/batch, 3.4 → 7.4 GB)
                del dev_args
                bufs = None
                gc.collect()
                if bi + 1 < len(parts):                # overlap: decode next
                    bufs, metas = _decode_batch(parts[bi + 1], cfg,
                                                load_audio, log)
                    dev_args = analyzer.put_buffers(analyzer.pad_batch(bufs))
                pa, stats = analyzer._unpack(np.asarray(out[0]),
                                             np.asarray(out[1]))
                # third-leg providers re-decode from disk — the batch's
                # audio is already freed by the time consensus runs, and
                # the rescue consults audio for at most a handful of
                # ambiguous pairs per corpus
                providers = [
                    (None if m[3] is not None else
                     (lambda p=m[1], q=m[2]:
                      (np.asarray(load_audio(p)[0]),
                       np.asarray(load_audio(q)[0]))))
                    for m in cur_metas]
                results = analyzer.results_from_pa(pa, len(cur_metas),
                                                   cfg=cons_cfg,
                                                   audio_providers=providers)
                log(f"  bucket {bucket_sec:.0f}s: batch {bi + 1}/{len(parts)}"
                    f" ({len(cur_metas)} pairs) in {time.time() - t0:.1f}s "
                    f"(mean tempo "
                    f"{float(np.asarray(stats.mean_tempo_ratio)):.4f})")
                for (idx, nc_path, src_path, err, trunc), r in zip(
                        cur_metas, results):
                    rec = {"files": {"nightcore": nc_path,
                                     "source": src_path}}
                    if err is not None:
                        rec["error"] = err
                        n_fail += 1
                    elif isinstance(r, str):
                        rec["error"] = r
                        n_fail += 1
                    else:
                        if trunc > 0:
                            r.warnings.insert(0, truncation_warning(
                                cfg.max_duration_sec + trunc,
                                cfg.max_duration_sec))
                        rec.update(export.to_dict(r))
                        n_ok += 1
                    emit(rec)

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
    # shared dest + store_true/false: the pair is genuinely exclusive
    # (combining them is an argparse error — round-4 advisor finding)
    cgrp = ap.add_mutually_exclusive_group()
    cgrp.add_argument("--classify-on-ibi", dest="classify_on_ibi",
                      action="store_true", default=True,
                      help=argparse.SUPPRESS)  # the default; kept for compat
    cgrp.add_argument("--classify-parity", dest="classify_on_ibi",
                      action="store_false",
                      help="classify on the grid-quantized windowed tempo "
                           "ratio exactly like the reference (fragile on "
                           "constant-tempo material); default is the robust "
                           "beat-time (IBI) classification")
    args = ap.parse_args(argv)

    if not args.manifest.is_file():
        print(f"ERROR: manifest not found: {args.manifest}", file=sys.stderr)
        return 2
    n_ok, n_fail = analyze_manifest(args.manifest, args.output,
                                    batch=args.batch,
                                    compute_pitch=not args.no_pitch,
                                    resume=args.resume,
                                    classify_on_ibi=args.classify_on_ibi)
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
