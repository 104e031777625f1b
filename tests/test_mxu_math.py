"""TPU-path math, tested directly on CPU (the functions are backend-agnostic
matmul formulations; in production they are gated to TPU by ``_use_mxu``).

Guards the MXU-specialized branches — factored rfft, windowed-DFT mel,
cosine-matmul ACF, time-domain CQT kernels — which CPU CI would otherwise
never execute.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nightcore_analyzer_tpu.ops import filters
from nightcore_analyzer_tpu.ops.fft_mxu import rfft_mxu
from nightcore_analyzer_tpu.ops.tempogram import _acf_cos_matrix
from nightcore_analyzer_tpu.ops.onset import _dft_windowed, _mel_basis


def test_rfft_mxu_f32_exact(rng):
    for n in (1024, 2048, 4096):
        x = rng.normal(size=(3, n)).astype(np.float32)
        z = rfft_mxu(jnp.asarray(x), dtype=jnp.float32)
        got = np.asarray(jnp.real(z)) + 1j * np.asarray(jnp.imag(z))
        want = np.fft.rfft(x, axis=-1)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


def test_rfft_mxu_bf16_noise_floor(rng):
    x = rng.normal(size=(4, 2048)).astype(np.float32)
    z = rfft_mxu(jnp.asarray(x), dtype=jnp.bfloat16)
    got = np.asarray(jnp.real(z)) + 1j * np.asarray(jnp.imag(z))
    want = np.fft.rfft(x, axis=-1)
    # documented contract: noise ≲ -45 dB of the spectral peak
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 10 ** (-45 / 20)


def test_acf_cos_matrix_equals_irfft(rng):
    nfft, win = 1024, 344
    x = rng.normal(size=(5, win)).astype(np.float32)
    spec = np.fft.rfft(x, n=nfft, axis=-1)
    mag2 = np.abs(spec) ** 2
    want = np.fft.irfft(mag2, n=nfft, axis=-1)[:, :win]
    got = mag2 @ _acf_cos_matrix(nfft, win)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dft_windowed_equals_windowed_rfft(rng):
    n_fft = 2048
    Fr, Fi = _dft_windowed(n_fft)
    x = rng.normal(size=(3, n_fft)).astype(np.float32)
    w = filters.hann(n_fft)
    want = np.fft.rfft(x * w, axis=-1)
    got = (x @ Fr) + 1j * (x @ Fi)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-4


def test_dft_mel_power_matches_fft_path(rng):
    """The full windowed-DFT → mel pipeline ≈ rfft → mel (f32 matrices)."""
    n_fft, sr = 2048, 22050
    Fr, Fi = _dft_windowed(n_fft)
    mel_T = _mel_basis(sr, n_fft, 128)
    w = filters.hann(n_fft)
    x = rng.normal(size=(6, n_fft)).astype(np.float32) * 0.3
    spec = np.fft.rfft(x * w, axis=-1)
    want = (np.abs(spec) ** 2) @ mel_T
    got = ((x @ Fr) ** 2 + (x @ Fi) ** 2) @ mel_T
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-6)


def test_cqt_time_kernels_match_freq_path_lag():
    """Fused time-domain CQT gives the same chroma *shape* (up to scale) as
    the freq-domain kernels — verified via normalized profiles on a chord."""
    sr, n_fft = 22050.0, 4096
    fmin = 32.70319566257483 * 8.0          # C4 stream
    n_bins = 144
    w = filters.hann(n_fft)

    t = np.arange(n_fft) / sr
    frame = sum(np.sin(2 * np.pi * 261.63 * r * t) * a
                for r, a in [(1, 0.5), (1.5, 0.3), (2, 0.2)]).astype(np.float32)

    k_re, k_im = filters.cqt_kernels(sr, n_fft, fmin, n_bins, 36)
    spec = np.fft.rfft(frame * w)
    freq_mag = np.abs(spec @ (k_re.T + 1j * k_im.T))

    t_re, t_im = filters.cqt_time_kernels(sr, n_fft, fmin, n_bins, 36,
                                          frame_window=w)
    time_mag = np.abs(frame @ (t_re + 1j * t_im))

    a = freq_mag / freq_mag.max()
    b = time_mag / time_mag.max()
    assert np.argmax(a) == np.argmax(b)
    # profiles agree closely wherever there is actual energy
    sig = a > 0.05
    assert np.abs(a - b)[sig].max() < 0.05


def test_beatdp_pallas_interpret_matches_scan(rng):
    """The Pallas DP kernel semantics vs the lax.scan reference — run in
    Pallas interpret mode so it executes on CPU CI."""
    from functools import partial
    import jax.experimental.pallas as pl  # noqa: F401
    from nightcore_analyzer_tpu.ops import beat
    from nightcore_analyzer_tpu.ops.pallas import beatdp

    L, F, W = 3, 700, 104
    env = np.abs(rng.normal(size=(L, F))).astype(np.float32)
    for l in range(L):
        env[l, :: 40 + 3 * l] += 6.0
    periods = jnp.asarray(np.array([40.0, 43.0, 46.0], np.float32))
    ls = jnp.asarray(env)
    weak = 0.01 * jnp.max(ls, axis=-1)

    real_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return real_call(*args, **kw)

    import unittest.mock as mock
    with mock.patch.object(beatdp.pl, "pallas_call", interp_call):
        cum_p, bl_p = beatdp.dp_forward(ls, periods, weak,
                                        tightness=100.0, W=W, T=256)
    cum_s, bl_s = jax.vmap(lambda l, p: beat._dp(l, p, 100.0, W))(ls, periods)
    assert np.allclose(np.asarray(cum_p), np.asarray(cum_s), rtol=1e-4, atol=1e-3)
    assert (np.asarray(bl_p) == np.asarray(bl_s)).all()


def test_tempo_subgrid_beats_grid(rng):
    """Parabolic sub-grid tempo lands between the quantized grid points."""
    from nightcore_analyzer_tpu.ops import tempogram
    sr, hop, win = 22050.0, 512, 344
    true_bpm = 126.7                         # deliberately off-grid
    period = 60.0 * sr / (hop * true_bpm)    # ≈ 20.4 lags
    lags = np.arange(win, dtype=np.float64)
    acf = np.exp(-0.5 * ((lags - period) / 1.2) ** 2) \
        + 0.4 * np.exp(-0.5 * ((lags - 2 * period) / 1.6) ** 2)
    acf[0] = 1.5
    grid = float(tempogram.tempo_from_acf(
        jnp.asarray(acf.astype(np.float32)), jnp.asarray(120.0),
        hop_length=hop, sr=sr))
    sub = float(tempogram.tempo_from_acf(
        jnp.asarray(acf.astype(np.float32)), jnp.asarray(120.0),
        hop_length=hop, sr=sr, subgrid=True))
    assert abs(sub - true_bpm) < abs(grid - true_bpm)
    assert sub == pytest.approx(true_bpm, rel=0.005)


def test_melfft_frames_matches_exact(rng):
    """Pallas fused rfft→mag²→mel (frames API, interpret mode) vs the exact
    rfft + mel matmul the CPU path uses."""
    from nightcore_analyzer_tpu.ops.pallas import melfft
    from nightcore_analyzer_tpu.ops import filters
    sr, n_mels, n_fft = 22050, 128, 2048
    frames = rng.standard_normal((2, 40, n_fft)).astype(np.float32)
    out = np.asarray(melfft.fft_mel_frames(
        jnp.asarray(frames), sr=sr, n_mels=n_mels, interpret=True))
    w = filters.hann(n_fft)
    spec = np.fft.rfft(frames * w, axis=-1)
    ref = (np.abs(spec) ** 2) @ filters.mel_filterbank(sr, n_fft, n_mels).T
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert out.shape == (2, 40, n_mels)
    assert rel < 0.01                       # bf16 noise floor


def test_melfft_fused_matches_scan_path(rng):
    """Full fused gmel (signal in, framing inside the kernel) vs the scan
    path of onset.mel_power_global — frame ordering, centering, and values
    must agree to bf16 tolerance."""
    from nightcore_analyzer_tpu.ops.pallas import melfft
    from nightcore_analyzer_tpu.ops import onset
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    cfg = AnalyzerConfig(max_duration_sec=5.0, window_sec=2.0, hop_sec=1.0,
                         max_beats=128, max_beats_window=16, frame_chunk=512)
    S = 2
    ys = rng.standard_normal((S, cfg.max_samples)).astype(np.float32)
    fused = np.asarray(melfft.mel_power_global_batch(
        jnp.asarray(ys), sr=cfg.sample_rate, n_mels=cfg.n_mels,
        n_frames=cfg.global_onset_frames, interpret=True))
    ref = np.asarray(jax.vmap(
        lambda y: onset.mel_power_global(y, cfg))(jnp.asarray(ys)))
    assert fused.shape == ref.shape
    rel = np.abs(fused - ref).max() / np.abs(ref).max()
    assert rel < 0.01


def test_pallas_acf_matches_jnp_path(rng):
    """Fused strided mean-ACF kernel (interpret mode) vs the jnp tempogram
    path — f32-exact across valid-length variation."""
    import unittest.mock as mock
    from jax.experimental import pallas as pl
    from nightcore_analyzer_tpu.ops.pallas import acf as ACF
    from nightcore_analyzer_tpu.ops import tempogram

    frames, win, stride, maxlag = 3000, 2756, 16, 1024
    env = np.abs(rng.standard_normal((2, frames))).astype(np.float32)
    nv = np.array([2900, 1500], np.int32)
    n_used = np.ceil(np.minimum(nv, frames) / stride).astype(np.int32)

    real_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return real_call(*a, **k)

    with mock.patch.object(ACF.pl, "pallas_call", interp_call):
        got = np.asarray(ACF.mean_acf_batch(
            jnp.asarray(env), jnp.asarray(n_used),
            win_length=win, n_frames=frames))
    ref = np.stack([np.asarray(tempogram.tempogram_mean_acf(
        jnp.asarray(env[i]), jnp.asarray(nv[i]), win_length=win,
        stride=stride, max_lag=maxlag)) for i in range(2)])
    assert np.abs(got - ref).max() < 1e-5


def test_melfft_hop512_matches_exact(rng):
    """Fused hop-512 global mel (four phase-decimated views, interpret mode)
    vs an exact centered-STFT mel at hop 512."""
    from nightcore_analyzer_tpu.ops.pallas import melfft
    sr, n_mels, n_fft, hop = 22050, 128, 2048, 512
    n = 9 * sr // 2
    n_frames = 1 + n // hop
    ys = rng.standard_normal((2, n)).astype(np.float32)
    out = np.asarray(melfft.mel_power_hop512_batch(
        jnp.asarray(ys), sr=sr, n_mels=n_mels, n_frames=n_frames,
        interpret=True))
    w = filters.hann(n_fft)
    mel_b = filters.mel_filterbank(sr, n_fft, n_mels).T
    pad = np.pad(ys, ((0, 0), (n_fft // 2, n_fft)))
    ref = np.stack([
        (np.abs(np.fft.rfft(np.stack(
            [pad[s, f * hop:f * hop + n_fft] for f in range(n_frames)]) * w,
            axis=-1)) ** 2) @ mel_b
        for s in range(2)])
    assert out.shape == (2, n_frames, n_mels)
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 0.01                       # bf16 noise floor


def test_window_acfs_fast_path_decision_equivalence():
    """The TPU global-grid fast path of ``_window_acfs`` must produce the
    same per-slot BPM picks as the reference-exact per-window framing.

    Forced on CPU by patching ``_use_mxu`` and running the Pallas kernel in
    interpret mode (the gate is backend-based, so plain CI never takes the
    fast branch)."""
    import unittest.mock as mock
    from jax.experimental import pallas as pl
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    from nightcore_analyzer_tpu.models import analyzer as A
    from nightcore_analyzer_tpu.ops import tempogram
    from nightcore_analyzer_tpu.ops.pallas import melfft
    from nightcore_analyzer_tpu.utils import synth

    cfg = AnalyzerConfig(max_duration_sec=30.0, max_beats=256,
                         max_beats_window=64, frame_chunk=512)
    y = synth.music_like(28.0, cfg.sample_rate, bpm=126.0, seed=3)
    ys = jnp.asarray(y[None, :cfg.max_samples]) \
        if len(y) >= cfg.max_samples else jnp.asarray(
            np.pad(y, (0, cfg.max_samples - len(y)))[None])

    _, acf_exact = A._window_acfs(ys, cfg)

    real_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return real_call(*a, **k)

    try:
        with mock.patch("nightcore_analyzer_tpu.ops.fft_mxu._use_mxu",
                        lambda: True), \
             mock.patch.object(melfft.pl, "pallas_call", interp_call):
            _, acf_fast = A._window_acfs(ys, cfg)
            # shared-mel variant: every 8th row of the hop-64 global mel
            # must yield the same decisions as the dedicated hop-512 kernel
            mel64 = melfft.mel_power_global_batch(
                ys, sr=cfg.sample_rate, n_mels=cfg.n_mels,
                n_frames=cfg.global_onset_frames, interpret=True)
            _, acf_shared = A._window_acfs(ys, cfg, mel64)
    finally:
        # the patched pallas_call traced interpret-mode executables into
        # the jit caches under interpret=False keys — drop them so later
        # same-process calls retrace cleanly
        melfft.mel_power_hop512_batch.clear_cache()
        melfft.mel_power_global_batch.clear_cache()

    pick = lambda a: np.asarray(jax.vmap(lambda aa: tempogram.tempo_from_acf(
        aa, jnp.asarray(120.0), hop_length=cfg.tempo_hop,
        sr=cfg.sample_rate))(a))
    n_full = (len(y) - cfg.win_samples) // cfg.hop_samples + 1
    bpm_exact = pick(acf_exact[0])[:n_full]
    bpm_fast = pick(acf_fast[0])[:n_full]
    bpm_shared = pick(acf_shared[0])[:n_full]
    assert np.array_equal(bpm_exact, bpm_fast), (bpm_exact, bpm_fast)
    assert np.array_equal(bpm_exact, bpm_shared), (bpm_exact, bpm_shared)


def test_chromacq_pallas_interpret_matches_scan(rng):
    """The fused Pallas chroma tile kernel (framing + dual-stream CQT +
    fold + normalize + masked frame-sum in VMEM) vs the lax.scan fallback
    of ``chunk_chroma_means`` — same time-domain bases, so only framing /
    fold placement differ and bf16 tolerance applies.

    Forced on CPU by patching ``_use_mxu`` (the gate is backend-based) and
    running the Pallas kernel in interpret mode; the scan leg is obtained
    by patching ``chromacq.supported`` to False."""
    import unittest.mock as mock
    from jax.experimental import pallas as pl
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    from nightcore_analyzer_tpu.ops import chroma as chroma_mod
    from nightcore_analyzer_tpu.ops import resample
    from nightcore_analyzer_tpu.ops.pallas import chromacq

    cfg = AnalyzerConfig(max_duration_sec=8.0, chunk_sec=4.0,
                         max_beats=128, max_beats_window=32,
                         chroma_frame_chunk=64)
    y = rng.standard_normal(cfg.max_samples).astype(np.float32)
    n_valid = int(7.3 * cfg.sample_rate)
    y[n_valid:] = 0.0
    ys = jnp.asarray(y)
    y4 = resample.decimate_pow2(ys[None], 4)[0]
    ns = jnp.asarray(n_valid, jnp.int32)

    real_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return real_call(*a, **k)

    assert chromacq.supported(cfg.chroma_n_fft, cfg.chroma_hop,
                              cfg.chroma_frame_chunk)
    try:
        with mock.patch("nightcore_analyzer_tpu.ops.fft_mxu._use_mxu",
                        lambda: True):
            with mock.patch.object(chromacq.pl, "pallas_call", interp_call):
                got = np.asarray(chroma_mod.chunk_chroma_means(ys, y4, ns, cfg))
            with mock.patch.object(chromacq, "supported",
                                   lambda *a: False):
                want = np.asarray(chroma_mod.chunk_chroma_means(ys, y4, ns, cfg))
    finally:
        chromacq.chroma_chunk_sums.clear_cache()

    assert got.shape == want.shape == (cfg.max_chunks, cfg.chroma_bins_per_octave)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.01                       # bf16 reorder noise floor


def test_chroma_floor_sub_recovers_noisy_pitch(rng):
    """The per-bin chunk-median noise floor (config.chroma_floor_sub, ON by
    default) keeps the cyclic-xcorr pitch decision correct under broadband
    noise where the plain front-end fails, and leaves the clean decision
    unchanged (VERDICT r3 #4; sweep measurements in config.py)."""
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    from nightcore_analyzer_tpu.ops import chroma as chroma_mod
    from nightcore_analyzer_tpu.ops import resample
    from nightcore_analyzer_tpu.utils import synth

    sr = 22050
    cfg = AnalyzerConfig(max_duration_sec=30.0, max_beats=512,
                         max_beats_window=32)
    factor = 1.26           # ≈ +4 st → chroma lag 12
    expect_lag = int(np.round(12.0 * np.log2(factor) * 3.0))

    def chroma_of(y, flag):
        c = cfg.replace(chroma_floor_sub=flag)
        buf = np.zeros(c.max_samples, np.float32)
        buf[:len(y)] = y[:c.max_samples]
        ys = jnp.asarray(buf)
        y4 = resample.decimate_pow2(ys[None], 4)[0]
        ch = chroma_mod.chunk_chroma_means(
            ys, y4, jnp.asarray(min(len(y), c.max_samples), jnp.int32), c)
        return np.asarray(ch)

    def lag_of(src, nc, flag):
        cs, cn = chroma_of(src, flag), chroma_of(nc, flag)
        lags = [int(chroma_mod.cyclic_xcorr_lag(jnp.asarray(a),
                                                jnp.asarray(b)))
                for a, b in zip(cs, cn) if a.any() and b.any()]
        return int(np.median(lags))

    # noisy pair: ~11 dB SNR — the plain front-end's documented failure
    src_n = synth.music_like(28.0, sr, bpm=140.0, seed=2, tempo_drift=0.008,
                             noise_level=0.2)
    nc_n = synth.speed_shift(src_n, factor)
    assert lag_of(src_n, nc_n, True) == expect_lag
    # clean pair: both modes agree on the decision
    src_c = synth.music_like(28.0, sr, bpm=140.0, seed=2, tempo_drift=0.008)
    nc_c = synth.speed_shift(src_c, factor)
    assert lag_of(src_c, nc_c, True) == expect_lag
    assert lag_of(src_c, nc_c, False) == expect_lag

    # chroma_floor_scale plumbing: a stronger floor must change the chroma
    # (measured curve in config.py); auto-selection pinned off so the
    # scales are what this assertion says they are
    c10 = cfg.replace(chroma_floor_auto=False)
    c15 = cfg.replace(chroma_floor_scale=1.5, chroma_floor_auto=False)
    buf = np.zeros(cfg.max_samples, np.float32)
    buf[:len(src_n)] = src_n[:cfg.max_samples]
    ys = jnp.asarray(buf)
    y4 = resample.decimate_pow2(ys[None], 4)[0]
    n = jnp.asarray(min(len(src_n), cfg.max_samples), jnp.int32)
    ch10 = np.asarray(chroma_mod.chunk_chroma_means(ys, y4, n, c10))
    ch15 = np.asarray(chroma_mod.chunk_chroma_means(ys, y4, n, c15))
    assert not np.allclose(ch10, ch15)

    # auto floor-scale selection (round 5): with an always-fire threshold
    # the selected chroma equals the static noisy scale, with a never-fire
    # threshold it equals the static base scale — one program, both
    # outcomes, driven by the in-kernel noise proxy
    c_always = cfg.replace(chroma_floor_noise_thresh=-1.0)
    c_never = cfg.replace(chroma_floor_noise_thresh=10.0)
    ch_always = np.asarray(chroma_mod.chunk_chroma_means(ys, y4, n, c_always))
    ch_never = np.asarray(chroma_mod.chunk_chroma_means(ys, y4, n, c_never))
    np.testing.assert_allclose(ch_always, ch15, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ch_never, ch10, rtol=1e-5, atol=1e-6)
    # the default threshold classifies this 11 dB input as noisy
    ch_def = np.asarray(chroma_mod.chunk_chroma_means(ys, y4, n, cfg))
    np.testing.assert_allclose(ch_def, ch15, rtol=1e-5, atol=1e-6)


def test_window_acfs_window_longer_than_bucket():
    """window_sec > bucket (f_win > F512) must fall back to the exact
    windowed path on TPU instead of crashing at trace time (the global-grid
    slice cannot cover a window longer than the signal grid)."""
    import unittest.mock as mock
    import numpy as np
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    from nightcore_analyzer_tpu.models import analyzer as A

    cfg = AnalyzerConfig(max_duration_sec=8.0, window_sec=10.0, hop_sec=5.0,
                         max_beats=128, max_beats_window=32, frame_chunk=512)
    ys = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, cfg.max_samples)).astype(np.float32))
    mel64 = jnp.zeros((1, cfg.global_onset_frames, cfg.n_mels))
    with mock.patch("nightcore_analyzer_tpu.ops.fft_mxu._use_mxu",
                    lambda: True):
        envs, acf = A._window_acfs(ys, cfg, mel64)   # must not raise
    assert envs.shape[0] == 1 and acf.shape[-1] == cfg.tempogram_win_length
