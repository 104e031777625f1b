"""Host-side envelope speed-candidate discriminator — the octave-rescue
arbiter's third leg.

When the IBI regression estimator and the beat-free duration ratio disagree
by an exact octave multiple, two hypotheses remain: the DP beat tracker
halved/doubled one side (rescue: true speed = duration ratio), or the two
files are different edits whose lengths happen to sit at an octave multiple
of the true speed (veto: true speed = regression).  The reference's
discipline for exactly this kind of tie is an *independent waveform-level
verifier* (``/root/reference/nightcore_analyzer/xcorr.py:54-162``); this
module is that verifier's beat-free cousin, usable at nightcore speed
ratios: stretch the nightcore's RMS envelope by each candidate speed and
measure how well it aligns anywhere inside the source's envelope
(zero-mean normalized cross-correlation, best lag).  The true speed
aligns section boundaries and beat-scale energy detail (NCC ≈ 0.5–0.9);
a 2×-wrong candidate stretches the envelope to twice/half the source's
timescale and decorrelates (NCC ≈ 0.1–0.3).

Pure numpy on the host, invoked lazily ONLY when a rescue deliberation is
ambiguous (a per-corpus handful of pairs), so it adds nothing to the
compiled device programs or their committed caches.  The same math runs on
device inside auto-align (``ops/align.py``) where it is a per-pair cost.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["envelope_speed_scores", "envelope_prefers"]

#: Envelope geometry: 4096/1024 at 22 050 Hz ≈ the reference align path's
#: 2048/512 at 11 025 Hz (46 ms frames) without the decimation pass.
_FRAME = 4096
_HOP = 1024
#: Seconds of stretched nightcore envelope matched against the source.
#: Long enough to span several musical sections (speed-candidate
#: discrimination needs structure, not just beats), short enough that the
#: candidate's residual speed error (≤ the IBI estimators' ~0.1 %) cannot
#: decorrelate the tail.
_HEAD_SEC = 60.0


def _rms_envelope(y: np.ndarray, sr: int) -> np.ndarray:
    y = np.asarray(y, np.float32)
    if len(y) < _FRAME:
        return np.zeros(0, np.float32)
    cs = np.concatenate([[0.0], np.cumsum(y.astype(np.float64) ** 2)])
    n = 1 + (len(y) - _FRAME) // _HOP
    starts = np.arange(n) * _HOP
    power = (cs[starts + _FRAME] - cs[starts]) / _FRAME
    return np.sqrt(np.maximum(power, 0.0)).astype(np.float32)


def _ncc_best(q: np.ndarray, s: np.ndarray) -> float:
    """Max over lags of the zero-mean NCC of ``q`` against windows of ``s``
    (per-lag Pearson from prefix sums; 10 %-of-peak variance floor so
    near-silent source spans cannot inflate — same normalization as
    ``ops/align.py``)."""
    H, S = len(q), len(s)
    if H < 4 or S < H:
        return 0.0
    nfft = 1 << (S + H - 1).bit_length()
    corr = np.fft.irfft(np.fft.rfft(s, nfft) *
                        np.conj(np.fft.rfft(q, nfft)), nfft)[:S - H + 1]
    cs1 = np.concatenate([[0.0], np.cumsum(s, dtype=np.float64)])
    cs2 = np.concatenate([[0.0], np.cumsum(s.astype(np.float64) ** 2)])
    S1 = cs1[H:S + 1] - cs1[:S - H + 1]
    S2 = cs2[H:S + 1] - cs2[:S - H + 1]
    q1 = float(q.sum())
    q2 = float((q.astype(np.float64) ** 2).sum())
    num = corr - (q1 / H) * S1
    var_s = S2 - S1 * S1 / H
    var_q = max(q2 - q1 * q1 / H, 1e-12)
    floor = 0.1 * float(var_s.max(initial=0.0))
    denom = np.sqrt(np.maximum(var_s, max(floor, 1e-12)) * var_q)
    r = np.where(denom > 1e-12, num / denom, -np.inf)
    best = float(r.max(initial=-np.inf))
    return best if np.isfinite(best) else 0.0


def envelope_speed_scores(nc: np.ndarray, src: np.ndarray,
                          speeds: Sequence[float], sr: int = 22050
                          ) -> Tuple[float, ...]:
    """NCC alignment score ∈ [-1, 1] of each candidate speed: stretch the
    nightcore envelope by ``speed`` onto the source timescale, head-limit to
    ``_HEAD_SEC``, and take the best lag anywhere in the source."""
    nc_env = _rms_envelope(nc, sr)
    src_env = _rms_envelope(src, sr)
    h_max = int(_HEAD_SEC * sr / _HOP)
    out = []
    for speed in speeds:
        if speed <= 0 or len(nc_env) < 2:
            out.append(0.0)
            continue
        n_str = int(round(len(nc_env) * speed))
        if n_str < 4:
            out.append(0.0)
            continue
        x = np.arange(n_str) * (len(nc_env) - 1) / max(n_str - 1, 1)
        stretched = np.interp(x, np.arange(len(nc_env)), nc_env
                              ).astype(np.float32)
        out.append(_ncc_best(stretched[:h_max], src_env))
    return tuple(out)


def envelope_prefers(nc: np.ndarray, src: np.ndarray,
                     speed_a: float, speed_b: float, *, sr: int = 22050,
                     min_score: float = 0.4, margin: float = 0.1
                     ) -> Optional[bool]:
    """Which of two candidate speeds the envelopes support.

    Returns ``True`` for ``speed_a``, ``False`` for ``speed_b``, ``None``
    when inconclusive (neither clears ``min_score``, or the scores are
    within ``margin`` of each other) — callers keep their prior behavior on
    ``None``."""
    score_a, score_b = envelope_speed_scores(nc, src, (speed_a, speed_b), sr)
    if score_a >= min_score and score_a - score_b >= margin:
        return True
    if score_b >= min_score and score_b - score_a >= margin:
        return False
    return None
