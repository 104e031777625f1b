"""Spectral comparison between two audio files (reference ``spectral.py``).

``analyze(path)`` decodes at native rate (C++ codec) and runs the fused TPU
statistics program (:mod:`.ops.spectral`); ``compare_and_print`` renders the
same plain-English report sections as the reference (brightness, rolloff,
dynamic range, band breakdown, reverb, duration, summary, format/quality
note with the MP3-bitrate bandwidth grading, ``spectral.py:113-359``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

__all__ = ["SpectralStats", "analyze", "compare_and_print", "transcode_grade"]


@dataclass
class SpectralStats:
    centroid: float
    rolloff: float
    rms_mean: float
    rms_variance: float
    sub_bass: float
    bass: float
    midrange: float
    presence: float
    brilliance: float
    decay_rate: float
    duration: float
    effective_bandwidth_hz: float


_BUCKETS = (2 ** 21, 2 ** 22, 2 ** 23, 2 ** 24, 2 ** 25)   # samples at native sr


def analyze(path: str, label: Optional[str] = None) -> SpectralStats:
    """Decode *path* at native rate and compute its spectral statistics."""
    import jax.numpy as jnp
    from .native import decode_native
    from .ops.spectral import build_spectral_fn

    if label:
        print(f"  Loading {label}…")
    y, sr = decode_native(str(path))
    n = len(y)
    bucket = next((b for b in _BUCKETS if n <= b), _BUCKETS[-1])
    buf = np.zeros(bucket, np.float32)
    buf[:min(n, bucket)] = y[:bucket]

    fn = build_spectral_fn(bucket)
    out = fn(jnp.asarray(buf), jnp.asarray(min(n, bucket)),
             jnp.asarray(float(sr)))
    g = lambda x: float(np.asarray(x))  # noqa: E731
    bands = np.asarray(out.bands)
    return SpectralStats(
        centroid=g(out.centroid), rolloff=g(out.rolloff),
        rms_mean=g(out.rms_mean), rms_variance=g(out.rms_variance),
        sub_bass=float(bands[0]), bass=float(bands[1]),
        midrange=float(bands[2]), presence=float(bands[3]),
        brilliance=float(bands[4]), decay_rate=g(out.decay_rate),
        duration=g(out.duration), effective_bandwidth_hz=g(out.effective_bandwidth_hz))


def _pct(a: float, b: float) -> float:
    return ((b - a) / a) * 100 if a != 0 else 0.0


def transcode_grade(bw: Optional[float]) -> Optional[str]:
    """Lossy-source bitrate guess from the spectral cutoff
    (reference ``spectral.py:288-298``: 16.5/18.5/20 kHz break points)."""
    if bw is None:
        return None
    if bw < 16_500:
        return "MP3 ~128 kbps"
    if bw < 18_500:
        return "MP3 ~192 kbps"
    if bw < 20_000:
        return "MP3 ~320 kbps"
    return None


_LOSSLESS_EXT = {"flac", "wav", "aiff", "aif", "pcm"}


def compare_and_print(ref: SpectralStats, other: SpectralStats,
                      label_ref: str = "REFERENCE", label_other: str = "OTHER",
                      ref_path: Optional[str] = None,
                      other_path: Optional[str] = None) -> None:
    """Plain-English comparison report (reference ``spectral.py:113-249``)."""
    W = 57
    print()
    print("=" * W)
    print("SPECTRAL COMPARISON RESULTS")
    print(f"  Reference : {label_ref}")
    print(f"  Other     : {label_other}")
    print("=" * W)

    bd = _pct(ref.centroid, other.centroid)
    print("\nBRIGHTNESS (Spectral Centroid)")
    print(f"  {label_ref}: {ref.centroid:.1f} Hz  |  {label_other}: {other.centroid:.1f} Hz")
    if bd < -10:
        print(f"  ! {label_other} is {abs(bd):.1f}% DARKER  -> likely low-pass filter applied")
    elif bd > 10:
        print(f"  ! {label_other} is {bd:.1f}% BRIGHTER  -> likely high-pass or treble boost")
    else:
        print(f"  OK  Similar brightness ({bd:+.1f}%)")

    rd = _pct(ref.rolloff, other.rolloff)
    print("\nHIGH FREQUENCY ROLLOFF")
    print(f"  {label_ref}: {ref.rolloff:.1f} Hz  |  {label_other}: {other.rolloff:.1f} Hz")
    if rd < -10:
        print(f"  ! {label_other} has {abs(rd):.1f}% less high-frequency energy  -> treble cut confirmed")
    elif rd > 10:
        print(f"  ! {label_other} has {rd:.1f}% more high-frequency energy  -> treble boost")
    else:
        print(f"  OK  Similar high-frequency content ({rd:+.1f}%)")

    vd = _pct(ref.rms_variance, other.rms_variance)
    print("\nDYNAMIC RANGE (Compression)")
    print(f"  {label_ref} variance: {ref.rms_variance:.6f}  |  {label_other}: {other.rms_variance:.6f}")
    if vd < -30:
        print(f"  ! {label_other} is {abs(vd):.1f}% more compressed  -> heavy limiting/compression")
    elif vd < -10:
        print(f"  ! {label_other} is {abs(vd):.1f}% more compressed  -> moderate compression")
    elif vd > 30:
        print(f"  ! {label_other} has {vd:.1f}% MORE dynamic range  -> less compressed than reference")
    else:
        print(f"  OK  Similar dynamic range ({vd:+.1f}%)")

    print("\nFREQUENCY BAND BREAKDOWN")
    for name, rv, ov in [
            ("Sub-bass  (20–80 Hz)", ref.sub_bass, other.sub_bass),
            ("Bass      (80–250 Hz)", ref.bass, other.bass),
            ("Midrange  (250–2 kHz)", ref.midrange, other.midrange),
            ("Presence  (2–6 kHz)", ref.presence, other.presence),
            ("Brilliance (6–20 kHz)", ref.brilliance, other.brilliance)]:
        diff = _pct(rv, ov)
        tag = "OK" if abs(diff) < 10 else "! "
        more = "more" if diff > 0 else "less"
        print(f"  {tag}  {name}: {diff:+.1f}% ({more} in {label_other})")

    dd = _pct(ref.decay_rate, other.decay_rate)
    print("\nREVERB / DECAY")
    if other.decay_rate > ref.decay_rate * 0.8 and abs(dd) > 20:
        print(f"  ! {label_other} decays more slowly ({dd:+.1f}%)  -> possible reverb added")
    else:
        print(f"  OK  Similar decay characteristics ({dd:+.1f}%)")

    dur_diff = abs(other.duration - ref.duration)
    if dur_diff > 1.0:
        print("\nDURATION NOTE")
        print(f"  {label_ref}: {ref.duration:.1f} s  |  {label_other}: {other.duration:.1f} s")
        print(f"  ! Files differ by {dur_diff:.1f} s  -> different edits, fade-in/out, or intro/outro")

    print()
    print("=" * W)
    print("SUMMARY")
    print("=" * W)
    issues = []
    if bd < -10:
        issues.append(f"low-pass filter ({abs(bd):.0f}% darker)")
    elif bd > 10:
        issues.append(f"treble boost ({bd:.0f}% brighter)")
    if rd < -10:
        issues.append(f"treble cut ({abs(rd):.0f}% rolloff reduction)")
    if vd < -30:
        issues.append(f"heavy compression ({abs(vd):.0f}% less dynamic range)")
    elif vd < -10:
        issues.append(f"moderate compression ({abs(vd):.0f}% less dynamic range)")
    brill_diff = _pct(ref.brilliance, other.brilliance)
    if brill_diff < -20:
        issues.append(f"reduced high-frequency content ({abs(brill_diff):.0f}% "
                      "less brilliance — consistent with MP3 compression)")
    if other.decay_rate > ref.decay_rate * 0.8 and abs(dd) > 20:
        issues.append("slower decay (possible reverb)")
    if dur_diff > 1.0:
        issues.append(f"duration mismatch ({dur_diff:.1f} s — different edits)")
    if issues:
        print(f"Detected differences in {label_other}:")
        for item in issues:
            print(f"  - {item}")
    else:
        print("No significant spectral differences detected.")

    _quality_note(ref_path, other_path, ref, other, label_ref, label_other)


def _quality_note(ref_path, other_path, ref: SpectralStats,
                  other: SpectralStats, label_ref: str, label_other: str):
    """Format/quality verdict from measured effective bandwidth
    (reference ``spectral.py:252-359``)."""
    if not ref_path or not other_path:
        return

    def fmt(p):
        return str(p).rsplit(".", 1)[-1].lower() if "." in str(p) else "?"

    fmt_ref, fmt_other = fmt(ref_path), fmt(other_path)
    ref_cl = fmt_ref in _LOSSLESS_EXT
    other_cl = fmt_other in _LOSSLESS_EXT
    ref_tc = transcode_grade(ref.effective_bandwidth_hz) if ref_cl else None
    other_tc = transcode_grade(other.effective_bandwidth_hz) if other_cl else None
    ref_true = ref_cl and ref_tc is None
    other_true = other_cl and other_tc is None

    print()
    print("FORMAT / QUALITY NOTE")
    print(f"  Container: {label_ref} → {fmt_ref.upper()}   |   "
          f"{label_other} → {fmt_other.upper()}")
    print(f"  Effective bandwidth: {label_ref} → "
          f"{ref.effective_bandwidth_hz / 1000:.1f} kHz   |   "
          f"{label_other} → {other.effective_bandwidth_hz / 1000:.1f} kHz")

    for label, cl, tc, bw, f in [
            (label_ref, ref_cl, ref_tc, ref.effective_bandwidth_hz, fmt_ref),
            (label_other, other_cl, other_tc, other.effective_bandwidth_hz, fmt_other)]:
        if cl and tc and bw:
            print(f"  ! {label} ({f.upper()}) — spectral content cuts off at "
                  f"~{bw / 1000:.1f} kHz, consistent with {tc} encoding. The "
                  "file looks like a lossy-to-lossless transcode; a lossless "
                  "container does NOT guarantee lossless audio.")

    if ref_true and not other_true:
        print(f"  Verdict: {label_ref} is genuinely lossless — "
              f"{label_other} is lower quality.")
    elif other_true and not ref_true:
        print(f"  Verdict: {label_other} is genuinely lossless but {label_ref} "
              "is not — check that files are in the correct order.")
    elif not ref_true and not other_true:
        print("  Verdict: Neither file appears to be a genuine lossless master.")
    else:
        print("  Verdict: Both files appear to be genuinely lossless.")

    if ref_true and not other_true and _pct(ref.brilliance, other.brilliance) > 20:
        print(f"  Warning: {label_other} (lower quality by format) has more "
              f"high-frequency content than {label_ref}. The files may be in "
              "the wrong order.")
