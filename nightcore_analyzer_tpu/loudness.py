"""Loudness / clipping detection and adjustment (reference ``loudness.py``).

* :func:`detect_peak` — peak dBFS + clipping flag via the C++ codec's peak
  scan (replacing the soundfile read, reference ``loudness.py:40-65``).
* :func:`apply_true_peak_limiter` — ffmpeg ``alimiter`` when the binary
  exists, else the first-party TPU lookahead limiter
  (:mod:`.effects.dynamics`), same ceiling/attack/release defaults.
* :func:`apply_gain_reduction` — sox/ffmpeg when present, else native gain.
* :func:`make_adj_path` — versioned ``ADJn`` artefact paths
  (``loudness.py:70-81``).
"""

from __future__ import annotations

import math
import shutil
import subprocess
from pathlib import Path

__all__ = ["detect_peak", "make_adj_path", "apply_true_peak_limiter",
           "apply_gain_reduction"]


def detect_peak(path: str | Path) -> tuple[float, bool]:
    """(peak_dbfs, is_clipping) — clipping when peak ≥ 0 dBFS.

    The peak is the *pre-mixdown per-channel* maximum, matching the
    reference's soundfile ``always_2d`` read maxed over all channels
    (loudness.py:40-65): a clipped left channel must trip the detector
    even when the stereo mixdown stays below full scale.
    """
    from . import native
    y, _sr, peak_lin = native.decode_native_peak(str(path))
    if len(y) == 0 or peak_lin <= 0.0:
        return (-math.inf, False)
    peak = 20.0 * math.log10(peak_lin)
    return (peak, peak >= 0.0)


def make_adj_path(src: Path, version: int) -> Path:
    """``Song.flac`` → ``Song ADJ<n>.flac`` (reference loudness.py:70-81)."""
    src = Path(src)
    return src.with_name(src.stem + f" ADJ{version}" + src.suffix)


def _write(path: Path, y, sr) -> None:
    from . import native
    if path.suffix.lower() == ".wav":
        native.encode_wav(str(path), y, sr)
    else:
        native.encode_flac(str(path), y, sr)


def apply_true_peak_limiter(src: Path, dst: Path,
                            limit_db: float = -0.1) -> None:
    """Shave only the samples above ``limit_db`` (attack 5 ms / release
    50 ms); everything below the ceiling is untouched."""
    src, dst = Path(src), Path(dst)
    if shutil.which("ffmpeg"):
        limit_linear = 10 ** (limit_db / 20.0)
        cmd = ["ffmpeg", "-y", "-i", str(src), "-af",
               f"alimiter=limit={limit_linear:.6f}:attack=5:release=50:"
               "level=disabled", str(dst)]
        print(f"\n  Running: {' '.join(cmd)}")
        subprocess.run(cmd, check=True)
        print(f"  Created: {dst}")
        return
    from . import native
    from .effects.dynamics import true_peak_limit
    y, sr = native.decode_native(str(src))
    out = true_peak_limit(y, sr, limit_db)
    _write(dst, out, sr)
    print(f"  Created: {dst}  (native true-peak limiter @ {limit_db:.1f} dBFS)")


def apply_gain_reduction(src: Path, dst: Path, gain_db: float) -> None:
    """Uniform gain change (negative = quieter)."""
    src, dst = Path(src), Path(dst)
    if shutil.which("sox"):
        cmd = ["sox", str(src), str(dst), "gain", f"{gain_db:.2f}"]
        print(f"\n  Running: {' '.join(cmd)}")
        subprocess.run(cmd, check=True)
        print(f"  Created: {dst}")
        return
    if shutil.which("ffmpeg"):
        cmd = ["ffmpeg", "-y", "-i", str(src), "-af",
               f"volume={gain_db:.2f}dB", str(dst)]
        print(f"\n  Running (ffmpeg fallback): {' '.join(cmd)}")
        subprocess.run(cmd, check=True)
        print(f"  Created: {dst}")
        return
    from . import native
    from .effects.dynamics import apply_gain
    y, sr = native.decode_native(str(src))
    _write(dst, apply_gain(y, gain_db), sr)
    print(f"  Created: {dst}  (native gain {gain_db:+.2f} dB)")
