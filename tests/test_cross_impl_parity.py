"""Cross-implementation parity: the serial numpy baseline (cpu_baseline/)
and the JAX device path are independent implementations of the same
algorithms — they must agree on the same input.

This is the closest available stand-in for the librosa golden-value parity
bar (librosa itself is not installable in this image): two codebases, two
FFT stacks, one answer.
"""

import numpy as np
import pytest

from nightcore_analyzer_tpu.utils import synth


@pytest.fixture(scope="module")
def pair():
    src = synth.music_like(28.0, 22050, bpm=140.0, seed=31, chord_bars=0.5,
                           tempo_drift=0.004)
    nc = synth.speed_shift(src, 1.25)
    return nc, src


def test_ibi_medians_agree(pair):
    from cpu_baseline.reference import onset_strength, tempo_acf, beat_track
    from nightcore_analyzer_tpu import tempo as jt

    nc, src = pair
    for y, start_bpm in ((src, 120.0), (nc, 140.0 * 1.25)):
        env = onset_strength(y, 22050, 64)
        bpm = tempo_acf(env, 22050, 64, start_bpm, stride=16)
        beats = beat_track(env, bpm, 22050, 64)
        ib = np.diff(beats * 64.0 / 22050.0)
        ib_np = ib[ib > 0.05]

        ib_jax = jt.estimate_ibis_global(y, 22050, start_bpm=start_bpm)
        assert ib_jax is not None
        # medians of the two implementations' IBI distributions agree tightly
        assert np.median(ib_jax) == pytest.approx(np.median(ib_np), rel=0.003)
        # and counts are in the same ballpark (same tracker semantics)
        assert abs(len(ib_jax) - len(ib_np)) <= max(3, 0.1 * len(ib_np))


def test_windowed_tempo_agrees(pair):
    from cpu_baseline.reference import onset_strength, tempo_acf
    from nightcore_analyzer_tpu import io as jio, tempo as jt

    nc, src = pair
    wins = jio.slice_windows(src, 22050, 10.0, 5.0)[:2]
    for w in wins:
        env = onset_strength(w.audio, 22050, 512)
        bpm_np = tempo_acf(env, 22050, 512, 120.0)
        bpm_jax = jt.estimate_tempo(w, start_bpm=120.0)
        assert bpm_jax is not None
        # both snap to the same ACF lag grid point
        assert bpm_jax == pytest.approx(bpm_np, rel=1e-4)


def test_pitch_shift_agrees(pair):
    from cpu_baseline.reference import chroma_shift_st
    from nightcore_analyzer_tpu import pitch as jp

    nc, src = pair
    chunk = int(20.0 * 22050)
    st_np = chroma_shift_st(src[:chunk], nc[:chunk], 22050)
    _, nc_hz, st_jax, _, _ = jp.estimate_pitch_chroma(src, nc, 22050)
    # both land on the same 1/3-semitone grid point
    assert st_jax == pytest.approx(st_np, abs=1e-6)
