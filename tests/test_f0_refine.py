"""Sub-semitone pitch refinement (``ops/f0.py``) — op and pipeline level.

The reference's only sub-semitone path is optional essentia MELODIA
(``pitch.py:187-241``); without it, pitch is quantized to the 1/3-semitone
chroma grid.  These tests cover the first-party replacement: the
harmonic-summation F0 tracker and the fine log-spectrum xcorr estimator,
whose error should be *cents*, not thirds of semitones.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nightcore_analyzer_tpu.config import AnalyzerConfig
from nightcore_analyzer_tpu.analyze.pipeline import analyze_arrays
from nightcore_analyzer_tpu.ops import f0, resample
from nightcore_analyzer_tpu.utils import synth

SR = 22050
# deliberately NOT on the 1/3-semitone grid: 12·log2(1.21) = 3.3 st
FACTOR = 1.21
TRUE_ST = 12.0 * np.log2(FACTOR)

CFG = AnalyzerConfig(
    max_duration_sec=30.0, window_sec=3.0, hop_sec=1.5,
    chunk_sec=5.0, n_bootstrap=128,
    max_beats=512, max_beats_window=32,
    frame_chunk=256, window_chunk=4,
    min_beats=3, ibi_min_ibis=3,
)


@pytest.fixture(scope="module")
def pair():
    src = synth.music_like(26.0, SR, bpm=150.0, seed=11, chord_bars=0.5)
    nc = synth.speed_shift(src, FACTOR)
    return nc, src


@pytest.fixture(scope="module")
def features(pair):
    nc, src = pair

    @jax.jit
    def feats(y, n):
        y4 = resample.decimate_pow2(y, 4)
        return f0.f0_features(y, y4, n, CFG)

    def pad(y):
        buf = np.zeros(CFG.max_samples, np.float32)
        n = min(len(y), CFG.max_samples)
        buf[:n] = y[:n]
        return jnp.asarray(buf), jnp.asarray(n, np.int32)

    return feats(*pad(src)), feats(*pad(nc))


def test_spectral_shift_recovers_fractional_semitones(features):
    (s_spec, _, _, _, _), (n_spec, _, _, _, _) = features
    st, q = jax.jit(lambda a, b: f0.spectral_shift_st(a, b, CFG))(
        jnp.sum(s_spec, axis=0), jnp.sum(n_spec, axis=0))
    assert float(q) > 0.5
    # within 3 cents — an order of magnitude under the chroma grid (33 c)
    assert float(st) == pytest.approx(TRUE_ST, abs=0.03)


def test_zero_shift_is_zero(features):
    (s_spec, _, _, _, _), _ = features
    spec = jnp.sum(s_spec, axis=0)
    st, q = jax.jit(lambda a, b: f0.spectral_shift_st(a, b, CFG))(spec, spec)
    assert float(st) == pytest.approx(0.0, abs=1e-4)
    assert float(q) == pytest.approx(1.0, abs=1e-4)


def test_tracker_frames_and_voicing(features):
    (_, _, hz, sal, vm), _ = features
    hz, sal, vm = np.asarray(hz), np.asarray(sal), np.asarray(vm, bool)
    assert vm.sum() > 50                       # 26 s at hop 2048
    voiced = vm & (sal >= CFG.f0_voicing_frac * sal[vm].max())
    f = hz[voiced]
    assert len(f) > 0
    assert np.all((f >= CFG.f0_fmin * 0.99) & (f <= CFG.f0_max_hz * 1.01))


def test_pipeline_refined_beats_chroma_grid(pair):
    nc, src = pair
    res, pa = analyze_arrays(nc, src, CFG)
    assert bool(np.asarray(pa.pitch_refined_ok))
    refined = float(np.asarray(pa.pitch_refined_st))
    chroma_pt = float(np.asarray(pa.pitch_point_st))
    assert abs(refined - TRUE_ST) < 0.03
    assert abs(refined - TRUE_ST) < abs(chroma_pt - TRUE_ST)
    assert res.pitch_refined_st == pytest.approx(refined)
    lo, hi = res.pitch_refined_ci
    assert lo <= hi
    # per-chunk shifts agree with the whole-file value
    ch = np.asarray(pa.pitch_refined_chunk_st)
    mask = np.asarray(pa.pitch_chunk_mask)
    assert np.all(np.abs(ch[mask] - TRUE_ST) < 0.1)


def test_refine_disabled_falls_back(pair):
    nc, src = pair
    res, pa = analyze_arrays(nc, src, CFG.replace(compute_pitch_refine=False))
    assert not bool(np.asarray(pa.pitch_refined_ok))
    assert res.pitch_refined_st is None
    # falls back to the chroma point estimate
    assert float(np.asarray(pa.pitch_refined_st)) == \
        pytest.approx(float(np.asarray(pa.pitch_point_st)))


def test_tpu_f0_host_api(pair):
    from nightcore_analyzer_tpu import pitch
    nc, src = pair
    out = pitch.estimate_pitch_tpu_f0(src, nc, SR)
    assert out is not None
    sv, nv = out
    assert len(sv) > 0 and len(nv) > 0
    assert all(isinstance(v, float) and v > 0 for v in sv[:5])
    assert pitch.estimate_pitch_tpu_f0(np.zeros(SR, np.float32),
                                       np.zeros(SR, np.float32), SR) is None


def test_combined_method_gated(pair):
    from nightcore_analyzer_tpu import pitch
    nc, src = pair
    src_hz, nc_hz, method = pitch.estimate_pitch_combined(src, nc, SR)
    assert method in ("chroma_xcorr", "chroma+tpu_f0")
    st = 12.0 * np.log2(np.median(nc_hz) / np.median(src_hz))
    tol = 1.5 if method == "chroma+tpu_f0" else 0.34
    assert st == pytest.approx(TRUE_ST, abs=tol)
