"""Golden-value tests for the foundational ops against numpy/scipy oracles."""

import numpy as np
import pytest
import scipy.signal

import jax
import jax.numpy as jnp

from nightcore_analyzer_tpu.ops import filters, spectrum, stats, energy
from nightcore_analyzer_tpu.config import AnalyzerConfig


def test_hann_matches_scipy():
    for n in (5, 64, 2048):
        got = filters.hann(n)
        want = scipy.signal.get_window("hann", n, fftbins=True)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_mel_filterbank_shape_and_area():
    fb = filters.mel_filterbank(22050, 2048, 128)
    assert fb.shape == (128, 1025)
    # every filter nonneg, has support, and slaney-normalized area ≈ 2/bandwidth
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()
    # filters should tile the spectrum: column sums mostly positive mid-band
    colsum = fb.sum(axis=0)
    assert (colsum[50:900] > 0).all()


def test_power_to_db_matches_reference_formula():
    S = np.abs(np.random.default_rng(0).normal(size=(4, 16))) ** 2
    got = np.asarray(spectrum.power_to_db(jnp.asarray(S)))
    want = 10 * np.log10(np.maximum(S, 1e-10))
    want = np.maximum(want, want.max() - 80.0)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_masked_median_matches_numpy(rng):
    for n_valid in (1, 2, 5, 8):
        vals = rng.normal(size=12).astype(np.float32)
        mask = np.zeros(12, bool)
        mask[rng.choice(12, size=n_valid, replace=False)] = True
        got = float(stats.masked_median(jnp.asarray(vals), jnp.asarray(mask)))
        want = float(np.median(vals[mask]))
        assert got == pytest.approx(want, rel=1e-6)


def test_masked_std_ddof1(rng):
    vals = rng.normal(size=20).astype(np.float32)
    mask = np.arange(20) < 13
    got = float(stats.masked_std(jnp.asarray(vals), jnp.asarray(mask)))
    assert got == pytest.approx(float(np.std(vals[:13], ddof=1)), rel=1e-4)


def test_percentile_matches_numpy(rng):
    v = np.sort(rng.normal(size=200)).astype(np.float32)
    for q in (2.5, 50.0, 97.5):
        got = float(stats.percentile(jnp.asarray(v), q))
        assert got == pytest.approx(float(np.percentile(v, q)), abs=1e-5)


def test_bootstrap_ratio_point_and_ci(rng):
    nc = (120.0 + rng.normal(scale=1.0, size=40)).astype(np.float32)
    src = (100.0 + rng.normal(scale=1.0, size=35)).astype(np.float32)
    nc_pad = np.concatenate([nc, np.zeros(10, np.float32)])
    src_pad = np.concatenate([src, np.zeros(15, np.float32)])
    nc_mask = np.arange(50) < 40
    src_mask = np.arange(50) < 35
    point, lo, hi = stats.bootstrap_ratio_ci(
        jax.random.PRNGKey(42), jnp.asarray(nc_pad), jnp.asarray(nc_mask),
        jnp.asarray(src_pad), jnp.asarray(src_mask), n_boot=2000)
    want = np.median(nc) / np.median(src)
    assert float(point) == pytest.approx(want, rel=1e-6)
    assert float(lo) < want < float(hi)
    # CI should be tight for tight data
    assert float(hi) - float(lo) < 0.05 * want
    # numpy-oracle bootstrap CI for comparison (width within 2x)
    r = np.random.default_rng(42)
    boots = [np.median(r.choice(nc, size=40)) / np.median(r.choice(src, size=35))
             for _ in range(2000)]
    np_lo, np_hi = np.percentile(boots, [2.5, 97.5])
    width_np = np_hi - np_lo
    width_jax = float(hi) - float(lo)
    assert 0.5 < width_jax / width_np < 2.0


def test_trim_bounds_matches_librosa_semantics():
    """Oracle: hand-computed librosa.effects.trim equivalent in numpy."""
    sr = 22050
    n = sr * 6
    y = np.zeros(n, np.float32)
    # 2 s silence, 3 s tone, 1 s silence
    t = np.arange(sr * 3) / sr
    y[2 * sr:5 * sr] = 0.5 * np.sin(2 * np.pi * 440 * t)

    # numpy oracle (librosa.effects.trim with frame 2048 / hop 512)
    frame, hop, top_db = 2048, 512, 60.0
    ypad = np.pad(y, (frame // 2, frame // 2))
    n_frames = 1 + n // hop
    power = np.array([
        np.mean(ypad[i * hop:i * hop + frame] ** 2) for i in range(n_frames)])
    db = 10 * np.log10(np.maximum(power, 1e-10) / max(power.max(), 1e-10))
    nonsilent = np.flatnonzero(db > -top_db)
    want_start = nonsilent[0] * hop
    want_end = min((nonsilent[-1] + 1) * hop, n)

    buf = np.zeros(n + 1000, np.float32)
    buf[:n] = y
    cs = energy.energy_cumsum(jnp.asarray(buf))
    start, end = energy.trim_bounds(cs, jnp.asarray(n), top_db)
    assert abs(int(start) - want_start) <= hop
    assert abs(int(end) - want_end) <= hop


def test_window_energy_gate():
    cfg = AnalyzerConfig(max_duration_sec=60.0)
    n = 50 * 22050
    y = np.zeros(cfg.max_samples, np.float32)
    rng = np.random.default_rng(0)
    y[:n] = 0.3 * rng.normal(size=n).astype(np.float32)
    y[10 * 22050:20 * 22050] *= 0.001  # quiet region → gated out
    cs = energy.energy_cumsum(jnp.asarray(y))
    db, valid = energy.window_energies_db(cs, jnp.asarray(n), cfg)
    gate = energy.energy_gate_mask(db, valid, cfg.energy_gate_db)
    db, valid, gate = map(np.asarray, (db, valid, gate))
    # slots: starts at 0,5,..; full windows while start+10s <= 50s → slots 0..8 valid
    assert valid[:9].all() and not valid[9:].any()
    # windows fully inside the quiet region (start 10s) should be gated
    assert not gate[2]
    # loud windows kept
    assert gate[0] and gate[6]
    # reference oracle for RMS dB of slot 0
    want_db = 20 * np.log10(np.sqrt(np.mean(y[:220500].astype(np.float64) ** 2)))
    assert float(db[0]) == pytest.approx(want_db, abs=0.01)


def test_envelope_floor_sub():
    """Noise-gated baseline removal on the hop-64 onset envelope (round 5,
    config.ibi_onset_floor_sub): a heavy constant baseline — what broadband
    noise adds to the positive-flux envelope — trips the med/mean gate and
    is removed exactly; sparse clean envelopes stay BELOW the gate and pass
    through bit-identical (the measured swing-safety property); the padded
    tail stays zero."""
    from nightcore_analyzer_tpu.ops import onset

    rng = np.random.default_rng(5)
    F, n_valid = 4096, 3500
    env = np.zeros((2, F), np.float32)
    # sparse clean onsets: spikes every ~40 frames on a tiny texture floor
    spikes = np.arange(20, n_valid, 40)
    env[0, :n_valid] = 0.01 * rng.random(n_valid)
    env[0, spikes] = 1.0 + 0.2 * rng.random(len(spikes))
    # same onsets riding a heavy noise baseline (med/mean ≈ 0.97 — the
    # measured 11 dB regime)
    base = 1.0
    env[1] = env[0] + base
    env[1, n_valid:] = 0.0
    n_frames = jnp.asarray([n_valid, n_valid], jnp.int32)

    out = np.asarray(onset.envelope_floor_sub(
        jnp.asarray(env), n_frames, 1.0, 0.95))
    # clean row (med/mean ≈ 0.2): gate closed — bit-identical passthrough
    np.testing.assert_array_equal(out[0], env[0])
    # noisy row: gate open, baseline removed — ≈ the clean envelope
    np.testing.assert_allclose(out[1, :n_valid], env[0, :n_valid], atol=0.03)
    # padded tail stays zero, nothing goes negative
    assert not out[:, n_valid:].any()
    assert (out >= 0).all()

    # thresh=0 conditions unconditionally (clean row loses only its tiny
    # texture median)
    out_all = np.asarray(onset.envelope_floor_sub(
        jnp.asarray(env), n_frames, 1.0, 0.0))
    assert np.all(out_all[0, spikes] > 0.98)

    # all-invalid row: no NaNs
    out2 = np.asarray(onset.envelope_floor_sub(
        jnp.asarray(env), jnp.asarray([0, 0], jnp.int32), 1.0, 0.95))
    assert np.isfinite(out2).all() and not out2.any()
