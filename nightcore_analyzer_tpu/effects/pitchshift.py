"""Phase-vocoder time-stretch / pitch-shift — the ``rubberband`` equivalent.

The reference's whole purpose is emitting ``rubberband --time T --pitch P``
parameters, and its workflow shells out to the rubberband binary to apply
them (``workflow.py:121-131``).  That binary does not exist in this image,
so the transform itself is provided first-party:

* time-stretch: classic phase vocoder — magnitudes resampled at fractional
  frame positions, phases advanced by accumulated (wrapped) instantaneous
  frequency.  The frame-position grid is *static-shape with a traced rate*:
  one XLA compile per duration bucket serves every stretch factor.
* pitch-shift: stretch by ``2^(st/12)`` then polyphase-resample back to the
  original duration (C++ resampler).

On TPU the heavy parts (batched rfft/irfft, overlap-add) are one fused jit.
"""

from __future__ import annotations

from fractions import Fraction
from functools import lru_cache
from pathlib import Path

import numpy as np

from ..ops import filters

__all__ = ["time_stretch", "pitch_shift", "rubberband_transform",
           "create_pitch_shifted_file"]

N_FFT = 2048
HOP = 512


@lru_cache(maxsize=16)
def _pv_fn(f_in_max: int, f_out_max: int):
    import jax
    import jax.numpy as jnp
    from ..ops.spectrum import frame_indices

    window = filters.hann(N_FFT)
    n_in_max = (f_in_max - 1) * HOP + N_FFT
    n_out_max = (f_out_max - 1) * HOP + N_FFT

    # OLA window-squared normalizer (periodic hann at 75 % overlap)
    wsum = np.zeros(n_out_max + N_FFT, np.float64)
    w2 = (window.astype(np.float64)) ** 2
    for t in range(f_out_max):
        wsum[t * HOP:t * HOP + N_FFT] += w2
    wsum = np.maximum(wsum[:n_out_max], 1e-8).astype(np.float32)

    idx_in = frame_indices(f_in_max, N_FFT, HOP)

    @jax.jit
    def run(y, n_samples, rate):
        """y: (n_in_max,) padded; rate = input frames per output frame
        (>1 = faster/shorter).  Returns (out (n_out_max,), n_out_samples)."""
        win = jnp.asarray(window)
        pad = N_FFT // 2
        ypad = jnp.pad(y, (pad, pad + N_FFT))
        frames = jnp.take(ypad, jnp.asarray(idx_in), axis=0)
        D = jnp.fft.rfft(frames * win, axis=-1)            # (f_in, bins)
        mag = jnp.abs(D)
        ph = jnp.angle(D)

        n_f_in = 1 + n_samples // HOP
        adv = 2.0 * jnp.pi * HOP * jnp.arange(N_FFT // 2 + 1) / N_FFT

        steps = jnp.arange(f_out_max) * rate
        t0 = jnp.floor(steps)
        alpha = (steps - t0)[:, None]
        valid = (t0 < jnp.maximum(n_f_in - 1, 1)).astype(jnp.float32)[:, None]
        t0c = jnp.clip(t0.astype(jnp.int32), 0, f_in_max - 2)

        m = (1 - alpha) * mag[t0c] + alpha * mag[t0c + 1]
        dph = ph[t0c + 1] - ph[t0c] - adv[None, :]
        dph = dph - 2.0 * jnp.pi * jnp.round(dph / (2.0 * jnp.pi))
        inc = (dph + adv[None, :]) * valid
        phase = ph[0][None, :] + jnp.concatenate(
            [jnp.zeros((1, inc.shape[1])), jnp.cumsum(inc[:-1], axis=0)], axis=0)

        S = m * valid * jnp.exp(1j * phase)
        out_frames = jnp.fft.irfft(S, n=N_FFT, axis=-1) * win   # (f_out, N_FFT)

        # overlap-add: hop = N_FFT/4 → 4 non-overlapping phases
        buf = jnp.zeros(n_out_max + N_FFT)
        for p in range(4):
            fr = out_frames[p::4]
            flat = fr.reshape(-1)
            npos = fr.shape[0] * N_FFT
            buf = buf.at[p * HOP:p * HOP + npos].add(flat[:npos])
        out = buf[:n_out_max] / jnp.asarray(wsum)

        n_f_out = jnp.ceil(
            jnp.maximum(n_f_in - 1, 1).astype(jnp.float32) / rate
        ).astype(jnp.int32)
        n_out = jnp.minimum(n_f_out * HOP, n_out_max)
        return out, n_out

    return run, n_in_max, n_out_max


def _buckets(n_frames: int) -> int:
    b = 256
    while b < n_frames:
        b *= 2
    return b


def time_stretch(y: np.ndarray, sr: int, stretch: float) -> np.ndarray:
    """Return ``y`` lasting ``stretch``× as long at the same pitch
    (``rubberband --time stretch``)."""
    y = np.asarray(y, np.float32)
    rate = 1.0 / stretch
    f_in = 1 + len(y) // HOP
    f_out_needed = int(np.ceil(f_in / rate)) + 2
    run, n_in_max, _ = _pv_fn(_buckets(f_in), _buckets(f_out_needed))
    import jax.numpy as jnp
    buf = np.zeros(n_in_max, np.float32)
    buf[:len(y)] = y
    out, n_out = run(jnp.asarray(buf), jnp.asarray(len(y)), jnp.asarray(rate))
    target = int(round(len(y) * stretch))
    out = np.asarray(out)
    return out[:min(target, len(out))].astype(np.float32)


def pitch_shift(y: np.ndarray, sr: int, semitones: float) -> np.ndarray:
    """Shift pitch by ``semitones`` preserving duration
    (``rubberband --pitch``)."""
    from .. import native
    factor = 2.0 ** (semitones / 12.0)
    stretched = time_stretch(y, sr, factor)
    frac = Fraction(factor).limit_denominator(100_000)
    out = native.resample(stretched, int(frac.numerator * 1000),
                          int(frac.denominator * 1000))
    if len(out) >= len(y):
        return out[:len(y)]
    return np.pad(out, (0, len(y) - len(out)))


def rubberband_transform(y: np.ndarray, sr: int, time_ratio: float,
                         pitch_semitones: float) -> np.ndarray:
    """Apply ``rubberband --time time_ratio --pitch pitch_semitones``
    semantics: lengthen by ``time_ratio`` and shift pitch independently."""
    factor = 2.0 ** (pitch_semitones / 12.0)
    stretched = time_stretch(y, sr, time_ratio * factor)
    from .. import native
    frac = Fraction(factor).limit_denominator(100_000)
    return native.resample(stretched, int(frac.numerator * 1000),
                           int(frac.denominator * 1000))


def create_pitch_shifted_file(src_path: str | Path, dst_path: str | Path,
                              semitones: float, *,
                              prefer_rubberband: bool = True) -> Path:
    """PSn-file creation (reference ``workflow.py:121-131``): uses the
    ``rubberband`` binary when present, else the first-party phase vocoder."""
    import shutil
    import subprocess
    src_path, dst_path = Path(src_path), Path(dst_path)

    if prefer_rubberband and shutil.which("rubberband"):
        cmd = ["rubberband", "--pitch", f"{semitones:.4f}",
               str(src_path), str(dst_path)]
        print(f"  Running: {' '.join(cmd)}")
        subprocess.run(cmd, check=True)
        return dst_path

    from .. import native
    y, sr = native.decode_native(str(src_path))
    out = pitch_shift(y, sr, semitones)
    if dst_path.suffix.lower() == ".wav":
        native.encode_wav(str(dst_path), out, sr)
    else:
        native.encode_flac(str(dst_path), out, sr)
    print(f"  Created: {dst_path}  (native pitch shift {semitones:+.4f} st)")
    return dst_path
