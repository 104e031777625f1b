"""Speed change (tempo + pitch co-shift) — the ``sox speed`` equivalent.

The reference creates its HQNC artefact with ``sox in.flac out.flac speed
X.XXXXXX`` (``workflow.py:108-118``).  A speed change is exactly a resample
played back at the original rate; the C++ polyphase resampler implements it
with 6-decimal rational precision.
"""

from __future__ import annotations

from fractions import Fraction
from pathlib import Path

import numpy as np

__all__ = ["change_speed", "create_speed_changed_file"]


def change_speed(y: np.ndarray, sr: int, factor: float) -> np.ndarray:
    """Return ``y`` played ``factor``× faster (shorter, pitch up) at the
    same sample rate."""
    from .. import native
    frac = Fraction(factor).limit_denominator(1_000_000)
    sr_in = sr * frac.numerator
    sr_out = sr * frac.denominator
    # reduce magnitude to keep the polyphase table reasonable
    g = np.gcd(sr_in, sr_out)
    return native.resample(y, sr_in // g, sr_out // g)


def create_speed_changed_file(src_path: str | Path, dst_path: str | Path,
                              factor: float, *, prefer_sox: bool = True) -> Path:
    """HQNC creation (reference ``workflow.py:90-118``): write ``dst_path``
    as ``src_path`` sped up by ``factor``.  Uses the ``sox`` binary when
    available (artefact-compatible with the reference), otherwise the
    first-party C++ path (FLAC/WAV in, FLAC/WAV out)."""
    import shutil
    import subprocess
    src_path, dst_path = Path(src_path), Path(dst_path)

    if prefer_sox and shutil.which("sox"):
        cmd = ["sox", str(src_path), str(dst_path), "speed", f"{factor:.6f}"]
        print(f"  Running: {' '.join(cmd)}")
        subprocess.run(cmd, check=True)
        return dst_path

    from .. import native
    y, sr = native.decode_native(str(src_path))
    out = change_speed(y, sr, factor)
    if dst_path.suffix.lower() == ".wav":
        native.encode_wav(str(dst_path), out, sr)
    else:
        native.encode_flac(str(dst_path), out, sr)
    print(f"  Created: {dst_path}  (native speed {factor:.6f}×)")
    return dst_path
