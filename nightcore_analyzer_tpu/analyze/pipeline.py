"""Host orchestration of the full analysis (reference ``pipeline.py:23-216``).

``run(nightcore_path, source_path, ...)`` keeps the reference's exact public
signature, log-callback behavior, and error surface, but the actual work is
one jit-compiled device program per (config, flags) combination
(:func:`..models.analyzer.build_analyze_fn`):

    host: decode (native C++) → pick duration bucket → pad into fixed buffers
    device: trim → align → gate → pitch → tempo → bootstraps → IBI
    host: consensus prose (classification, Rubber Band params, warnings)

Duration buckets quantize track lengths into a handful of static shapes so
XLA compiles once per bucket and every subsequent pair reuses the executable.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from ..config import AnalyzerConfig, DEFAULT_CONFIG, bucket_for_duration, \
    config_for_bucket, truncation_warning
from ..signal.io import load_audio, WINDOW_SEC, HOP_SEC, \
    ENERGY_GATE_DB, SILENCE_STRIP_DB
from .consensus import result_from_pair_analysis
from .result import AnalysisResult

__all__ = ["run", "analyze_arrays"]


def analyze_arrays(nc_audio: np.ndarray, src_audio: np.ndarray,
                   cfg: AnalyzerConfig, *, src_trim_sec: float = 0.0,
                   auto_align: bool = False, compute_pitch: bool = True,
                   log: Optional[Callable[[str], None]] = None):
    """Analyze two in-memory mono 22.05 kHz arrays; returns
    ``(AnalysisResult, PairAnalysis)``."""
    import jax.numpy as jnp
    from ..models.analyzer import build_analyze_fn
    from ..utils.tracing import StageTimer, device_trace

    def _log(msg):
        if log is not None:
            log(msg)

    timer = StageTimer(log=_log)

    sr = cfg.sample_rate
    max_dur = max(len(nc_audio), len(src_audio)) / sr
    bucket = bucket_for_duration(max_dur)
    cfg = config_for_bucket(cfg, bucket)
    trunc_warn = truncation_warning(max_dur, bucket)
    if trunc_warn:
        _log(f"WARNING: {trunc_warn}")

    def pad(y):
        buf = np.zeros(cfg.max_samples, np.float32)
        n = min(len(y), cfg.max_samples)
        buf[:n] = y[:n]
        return buf, n

    nc_buf, n_nc = pad(nc_audio)
    src_buf, n_src = pad(src_audio)

    _log(f"Device program: {bucket:.0f} s bucket"
         f" ({cfg.n_window_slots} window slots, {cfg.max_chunks} pitch chunks)")
    with timer.stage("compile/load"):
        # classify_on_ibi is consumed host-side only (consensus stage);
        # strip it from the device config so toggling it reuses the same
        # compiled executable
        fn = build_analyze_fn(cfg.replace(classify_on_ibi=False),
                              auto_align=auto_align and src_trim_sec == 0.0,
                              compute_pitch=compute_pitch)
    with timer.stage("device analysis"), device_trace():
        pa = fn(jnp.asarray(nc_buf), jnp.asarray(n_nc),
                jnp.asarray(src_buf), jnp.asarray(n_src),
                jnp.asarray(int(src_trim_sec * sr), jnp.int32))
        import numpy as _np
        _np.asarray(pa.tempo_ratio)          # materialize = wait for device
    with timer.stage("consensus"):
        result = result_from_pair_analysis(
            pa, cfg, compute_pitch=compute_pitch,
            audio_provider=lambda: (nc_audio, src_audio))
    if trunc_warn:
        result.warnings.insert(0, trunc_warn)
    timer.report()
    return result, pa


def run(
    nightcore_path: str,
    source_path: str,
    *,
    window_sec: float = WINDOW_SEC,
    hop_sec: float = HOP_SEC,
    energy_gate_db: float = ENERGY_GATE_DB,
    silence_strip_db: Optional[float] = SILENCE_STRIP_DB,
    src_trim_sec: float = 0.0,
    auto_align: bool = False,
    compute_pitch: bool = True,
    classify_on_ibi: bool = True,
    log: Optional[Callable[[str], None]] = print,
) -> AnalysisResult:
    """Analyse the tempo and pitch relationship between a nightcore track and
    its source.  Same parameters, defaults, and error behavior as the
    reference entry point (``pipeline.py:23-216``); see the module docstring
    for the host/device split.  ``classify_on_ibi`` (beyond-reference,
    default True) classifies on the beat-time estimators instead of the
    grid-quantized windowed ratio (``config.py`` ``classify_on_ibi``); pass
    False (CLI ``--classify-parity``) for the reference's exact
    classification behavior."""
    def _log(msg: str) -> None:
        if log is not None:
            log(msg)

    _log("Loading nightcore audio…")
    nc_audio, sr = load_audio(nightcore_path)
    _log(f"  {len(nc_audio) / sr:.1f} s  ({len(nc_audio):,} samples @ {sr} Hz)")

    _log("Loading source audio…")
    src_audio, _ = load_audio(source_path, sr=sr)
    _log(f"  {len(src_audio) / sr:.1f} s  ({len(src_audio):,} samples @ {sr} Hz)")

    cfg = DEFAULT_CONFIG.replace(
        window_sec=window_sec, hop_sec=hop_sec,
        energy_gate_db=energy_gate_db,
        silence_strip_db=(silence_strip_db if silence_strip_db is not None
                          else DEFAULT_CONFIG.silence_strip_db),
        strip_silence=silence_strip_db is not None,
        classify_on_ibi=classify_on_ibi,
    )

    if silence_strip_db is not None:
        _log(f"Stripping silence (top_db={silence_strip_db} dB)…")
    if src_trim_sec > 0:
        _log(f"Manual source trim: skipping {src_trim_sec:.2f}s from source start")
    elif auto_align:
        _log("Detecting intro offset (RMS envelope alignment)…")
    _log(f"Slicing into {window_sec:.0f} s windows (hop {hop_sec:.0f} s)…")
    _log("Analyzing on device (gate → pitch → tempo → consensus → IBI)…")

    result, pa = analyze_arrays(
        nc_audio, src_audio, cfg, src_trim_sec=src_trim_sec,
        auto_align=auto_align, compute_pitch=compute_pitch, log=log)

    _log(f"  nightcore: {result.n_nc_tempo_windows} tempo windows"
         f"  |  source: {result.n_source_tempo_windows}")
    if compute_pitch:
        _log(f"  Pitch method: {result.pitch_method}")
    if result.intro_offset_sec:
        _log(f"  Source intro offset applied: {result.intro_offset_sec:.2f}s")
    if result.ibi_ratio is not None:
        _log(f"  IBI ratio: {result.ibi_ratio:.6f}×  95% CI"
             f" [{result.ibi_ci[0]:.6f}, {result.ibi_ci[1]:.6f}]")
    else:
        _log("  IBI ratio: insufficient beats — skipped")
    _log("Done.")
    return result
