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
    """Human-readable comparison report.

    Decision thresholds mirror the reference (``spectral.py:113-249``):
    ±10 % for brightness/rolloff/band flags, −30/−10 % for compression
    severity, −20 % brilliance for the MP3 hint, decay > 0.8× with > 20 %
    drift for the reverb hint, > 1 s for the duration note.  The wording
    and layout are this implementation's own.
    """
    W = 57
    bar = "=" * W
    print(f"\n{bar}\nSPECTRAL COMPARISON RESULTS\n"
          f"  Reference : {label_ref}\n  Other     : {label_other}\n{bar}")

    findings = []

    def section(title, left, right, unit="Hz"):
        print(f"\n{title}")
        print(f"  {label_ref}: {left:.1f} {unit}  |  {label_other}: "
              f"{right:.1f} {unit}")

    # brightness (centroid)
    bd = _pct(ref.centroid, other.centroid)
    section("BRIGHTNESS (Spectral Centroid)", ref.centroid, other.centroid)
    if bd < -10:
        print(f"  ! centroid sits {abs(bd):.1f}% lower in {label_other} — "
              "a low-pass filter (or darker master) is the usual cause")
        findings.append(f"low-pass filter ({abs(bd):.0f}% darker)")
    elif bd > 10:
        print(f"  ! centroid sits {bd:.1f}% higher in {label_other} — "
              "treble lift or high-pass filtering")
        findings.append(f"treble boost ({bd:.0f}% brighter)")
    else:
        print(f"  OK  brightness matches to within the 10% band ({bd:+.1f}%)")

    # rolloff
    rd = _pct(ref.rolloff, other.rolloff)
    section("HIGH FREQUENCY ROLLOFF", ref.rolloff, other.rolloff)
    if rd < -10:
        print(f"  ! the 85% energy point falls {abs(rd):.1f}% earlier in "
              f"{label_other}: the top end has been cut")
        findings.append(f"treble cut ({abs(rd):.0f}% rolloff reduction)")
    elif rd > 10:
        print(f"  ! the 85% energy point sits {rd:.1f}% higher in "
              f"{label_other}: extra top-end energy")
    else:
        print(f"  OK  rolloff points agree ({rd:+.1f}%)")

    # dynamics (RMS variance)
    vd = _pct(ref.rms_variance, other.rms_variance)
    print("\nDYNAMIC RANGE (Compression)")
    print(f"  RMS variance — {label_ref}: {ref.rms_variance:.6f}  |  "
          f"{label_other}: {other.rms_variance:.6f}")
    if vd < -30:
        print(f"  ! loudness variance down {abs(vd):.1f}% in {label_other}: "
              "hard limiting / heavy compression")
        findings.append(f"heavy compression ({abs(vd):.0f}% less dynamic range)")
    elif vd < -10:
        print(f"  ! loudness variance down {abs(vd):.1f}% in {label_other}: "
              "some compression applied")
        findings.append(f"moderate compression ({abs(vd):.0f}% less dynamic range)")
    elif vd > 30:
        print(f"  ! {label_other} actually swings {vd:.1f}% wider — the "
              "reference is the more compressed file")
    else:
        print(f"  OK  comparable dynamics ({vd:+.1f}%)")

    # five-band energy split
    print("\nFREQUENCY BAND BREAKDOWN")
    for name, rv, ov in [
            ("Sub-bass  (20–80 Hz)", ref.sub_bass, other.sub_bass),
            ("Bass      (80–250 Hz)", ref.bass, other.bass),
            ("Midrange  (250–2 kHz)", ref.midrange, other.midrange),
            ("Presence  (2–6 kHz)", ref.presence, other.presence),
            ("Brilliance (6–20 kHz)", ref.brilliance, other.brilliance)]:
        diff = _pct(rv, ov)
        mark = "OK" if abs(diff) < 10 else "! "
        rel = "above" if diff > 0 else "below"
        print(f"  {mark}  {name}: {label_other} {diff:+.1f}% ({rel} reference)")
    brill_diff = _pct(ref.brilliance, other.brilliance)
    if brill_diff < -20:
        findings.append(f"reduced high-frequency content ({abs(brill_diff):.0f}% "
                        "less brilliance — consistent with MP3 compression)")

    # decay (reverb proxy)
    dd = _pct(ref.decay_rate, other.decay_rate)
    print("\nREVERB / DECAY")
    reverb_hit = other.decay_rate > ref.decay_rate * 0.8 and abs(dd) > 20
    if reverb_hit:
        print(f"  ! energy after loud frames dies away {dd:+.1f}% slower in "
              f"{label_other} — added reverb would do this")
        findings.append("slower decay (possible reverb)")
    else:
        print(f"  OK  decay envelopes agree ({dd:+.1f}%)")

    # duration
    dur_diff = abs(other.duration - ref.duration)
    if dur_diff > 1.0:
        print("\nDURATION NOTE")
        print(f"  {label_ref}: {ref.duration:.1f} s  |  "
              f"{label_other}: {other.duration:.1f} s")
        print(f"  ! lengths disagree by {dur_diff:.1f} s — expect different "
              "edits or added/removed intro/outro/fades")
        findings.append(f"duration mismatch ({dur_diff:.1f} s — different edits)")

    print(f"\n{bar}\nSUMMARY\n{bar}")
    if findings:
        print(f"Detected differences in {label_other}:")
        for item in findings:
            print(f"  - {item}")
    else:
        print("No significant spectral differences detected.")

    _quality_note(ref_path, other_path, ref, other, label_ref, label_other)


def _quality_note(ref_path, other_path, ref: SpectralStats,
                  other: SpectralStats, label_ref: str, label_other: str):
    """Transcode detection from measured effective bandwidth.

    A lossless container whose spectrum stops at an MP3-typical cutoff
    (grading table in :func:`transcode_grade`, reference
    ``spectral.py:288-298``) was almost certainly re-encoded from a lossy
    original; the verdict lines report which side, if either, survives
    that test.
    """
    if not ref_path or not other_path:
        return

    def ext(p):
        return str(p).rsplit(".", 1)[-1].lower() if "." in str(p) else "?"

    sides = []
    for label, path, st in ((label_ref, ref_path, ref),
                            (label_other, other_path, other)):
        e = ext(path)
        claims_lossless = e in _LOSSLESS_EXT
        grade = (transcode_grade(st.effective_bandwidth_hz)
                 if claims_lossless else None)
        sides.append((label, e, claims_lossless, grade,
                      st.effective_bandwidth_hz))

    print("\nFORMAT / QUALITY NOTE")
    print(f"  Container: {label_ref} → {sides[0][1].upper()}   |   "
          f"{label_other} → {sides[1][1].upper()}")
    print(f"  Effective bandwidth: {label_ref} → {sides[0][4] / 1000:.1f} kHz"
          f"   |   {label_other} → {sides[1][4] / 1000:.1f} kHz")

    for label, e, claims, grade, bw in sides:
        if claims and grade and bw:
            print(f"  ! {label} ({e.upper()}) stops at ~{bw / 1000:.1f} kHz — "
                  f"the cutoff signature of {grade}. Expect a lossy rip "
                  "repackaged in a lossless container (the container proves "
                  "nothing about the audio inside).")

    ref_true = sides[0][2] and sides[0][3] is None
    other_true = sides[1][2] and sides[1][3] is None
    if ref_true and not other_true:
        print(f"  Verdict: only {label_ref} holds up as true lossless; "
              f"{label_other} is the lower-quality side.")
    elif other_true and not ref_true:
        print(f"  Verdict: {label_other} tests as true lossless while "
              f"{label_ref} does not — the two files may have been swapped.")
    elif not ref_true and not other_true:
        print("  Verdict: neither file passes the lossless test.")
    else:
        print("  Verdict: both files pass the lossless test.")

    if ref_true and not other_true and _pct(ref.brilliance, other.brilliance) > 20:
        print(f"  Warning: the nominally lower-quality {label_other} carries "
              f"MORE top-end than {label_ref} — double-check the argument "
              "order.")
