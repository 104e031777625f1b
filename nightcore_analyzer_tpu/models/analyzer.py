"""The flagship device program: one jit-compiled pair analysis.

Rebuilds the reference orchestrator ``pipeline.run`` (``pipeline.py:23-216``)
as a single pure array program over fixed-shape buffers:

    load (host) → silence trim → manual/auto source trim → window + energy
    gate → chroma-xcorr pitch → two-phase windowed tempo (source prior 120,
    nightcore prior = median(src BPM) × duration ratio, ``pipeline.py:161-186``)
    → bootstrap ratios → full-signal hop-64 IBI pass (``pipeline.py:198-213``)

Architecture notes:

* The two sides of a pair (nightcore, source) are **stacked on a leading
  side-axis** and processed by one vmapped program wherever the math is
  prior-independent (onset envelopes, tempograms, chroma, beat DP).  This
  halves the XLA graph (compile time) and doubles the lane width of the
  sequential beat-tracker scans (runtime) versus processing the sides
  separately.  Only the tempo-prior picks (cheap argmaxes) are side-ordered,
  because the nightcore prior derives from the source windows.
* Everything data-dependent (agreement gates, fallbacks) is masks +
  ``where``-selects; strings/warnings live on the host (``analyze.consensus``)
  consuming the returned scalar flags — the same numbers/prose split as the
  reference's consensus layer.
* The core is **batch-first**: ``analyze_batch`` takes a (B, max_samples)
  corpus slab so the sequential beat-DP stages flatten every (pair, side
  [, window]) lane into ONE Pallas kernel launch — an outer ``vmap`` would
  instead dispatch a 128-lane kernel per pair at 2-lane occupancy.
  ``analyze_pair`` is the batch-of-one convenience wrapper; ``batch.corpus``
  shards the pair axis of ``analyze_batch`` across the TPU mesh
  (SURVEY §2.3's parallelism map).
"""

from __future__ import annotations

from functools import partial, lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import AnalyzerConfig
from ..ops import onset, tempogram, beat, chroma, energy, resample, stats, \
    align, f0
from ..ops.stats import masked_median

__all__ = ["PairAnalysis", "analyze_pair", "analyze_batch", "build_analyze_fn"]

NC, SRC = 0, 1       # side-axis convention


class PairAnalysis(NamedTuple):
    # ── post-trim geometry (samples @ cfg.sample_rate) ───────────────────────
    nc_len: jnp.ndarray
    src_len: jnp.ndarray
    nc_lead: jnp.ndarray            # leading silence removed (samples)
    nc_trail: jnp.ndarray
    src_lead: jnp.ndarray
    src_trail: jnp.ndarray
    intro_offset: jnp.ndarray       # samples trimmed from src start (manual/auto)
    align_speed: jnp.ndarray        # speed hint from auto-align (1.0 if unused)

    # ── windowed tempo ───────────────────────────────────────────────────────
    src_tempos: jnp.ndarray         # (n_window_slots,) BPM
    src_tempo_mask: jnp.ndarray
    nc_tempos: jnp.ndarray
    nc_tempo_mask: jnp.ndarray
    n_src_windows: jnp.ndarray      # windows surviving the energy gate
    n_nc_windows: jnp.ndarray
    src_gate: jnp.ndarray           # (n_window_slots,) energy-gate masks
    nc_gate: jnp.ndarray
    all_gated: jnp.ndarray          # bool — reference RuntimeError condition
    src_median_bpm: jnp.ndarray
    nc_median_bpm: jnp.ndarray
    nc_start_bpm: jnp.ndarray       # prior used for the nightcore side
    tempo_ratio: jnp.ndarray
    tempo_lo: jnp.ndarray
    tempo_hi: jnp.ndarray
    tempo_insufficient: jnp.ndarray  # bool — reference ValueError condition

    # ── pitch (chroma xcorr) ─────────────────────────────────────────────────
    pitch_shifts_st: jnp.ndarray    # (max_chunks,) per-chunk shift, semitones
    pitch_chunk_mask: jnp.ndarray
    n_chunks: jnp.ndarray
    pitch_point_st: jnp.ndarray
    pitch_st_lo: jnp.ndarray
    pitch_st_hi: jnp.ndarray
    pitch_ratio: jnp.ndarray        # hz-median bootstrap (consensus path)
    pitch_lo: jnp.ndarray
    pitch_hi: jnp.ndarray
    # sub-semitone refinement (ops/f0.py — the first-party MELODIA
    # replacement): per-chunk fine log-spectrum xcorr shifts, the whole-file
    # shift, its bootstrap CI, the peak cosine quality, and the MELODIA-style
    # ±1.5 st agreement gate vs the chroma estimate
    pitch_refined_chunk_st: jnp.ndarray   # (max_chunks,)
    pitch_refined_st: jnp.ndarray
    pitch_refined_lo: jnp.ndarray
    pitch_refined_hi: jnp.ndarray
    pitch_refined_quality: jnp.ndarray
    pitch_refined_ok: jnp.ndarray

    # ── high-precision IBI pass ──────────────────────────────────────────────
    ibi_ratio: jnp.ndarray
    ibi_lo: jnp.ndarray
    ibi_hi: jnp.ndarray
    ibi_valid: jnp.ndarray
    n_src_ibis: jnp.ndarray
    n_nc_ibis: jnp.ndarray
    # mean-IBI ratio: the median inherits the hop-64 grid (it IS one of the
    # quantized IBI values), bounding precision to ~±0.15%; the mean of
    # hundreds of dithered IBIs interpolates the grid to ~0.01% — an
    # estimator the reference does not have (its median path is mirrored in
    # ibi_ratio above for parity)
    ibi_refined_ratio: jnp.ndarray
    ibi_regression_ratio: jnp.ndarray


def _strip(y, n, cfg: AnalyzerConfig):
    start, end = energy.trim_bounds_y(y, n, cfg.silence_strip_db)
    # trim starts are multiples of the trim hop → block roll (shared
    # constant: a hop change can't silently desync the block size)
    y2 = energy.roll_to_start(y, start, block=energy.TRIM_HOP)
    return y2, end - start, start, n - end


def _gates(ys, ns, cfg: AnalyzerConfig):
    """(2, slots) energy-gate masks."""
    def one(y, n):
        edb, slot_valid = energy.window_energies_db_y(y, n, cfg)
        return energy.energy_gate_mask(edb, slot_valid, cfg.energy_gate_db)
    return jax.vmap(one)(ys, ns)


def _window_acfs(ys, cfg: AnalyzerConfig, mel64=None):
    """Prior-independent windowed-tempo features for both sides at once.

    ``ys``: (..., max_samples).  Returns (envs (..., slots, F),
    acf (..., slots, win_length)).  ``mel64``: optional precomputed hop-64
    global mel power (..., global_onset_frames, n_mels) — the IBI pass
    computes it anyway, and at the default geometry (tempo_hop = 8·ibi_hop,
    same n_fft/window) every hop-512 frame is exactly every 8th hop-64
    frame, so the fast path below subsamples it for free.
    """
    lead = ys.shape[:-1]
    ys_f = ys.reshape(-1, ys.shape[-1])
    f_win = 1 + cfg.win_samples // cfg.tempo_hop
    f_valid = jnp.asarray(f_win, jnp.int32)

    from ..ops.fft_mxu import _use_mxu
    from ..ops.pallas import melfft
    stride = cfg.tempo_hop // cfg.ibi_hop
    F512 = 1 + cfg.max_samples // cfg.tempo_hop
    fits = f_win <= F512        # window longer than the bucket → exact path
    share_mel = (mel64 is not None and _use_mxu() and fits
                 and cfg.tempo_hop == stride * cfg.ibi_hop)
    if share_mel or (_use_mxu() and fits and cfg.tempo_hop == 512
                     and melfft.supported(cfg.tempo_n_fft, None, cfg.n_mels)):
        # Global-grid fast path: ONE hop-512 mel + envelope per side (every
        # 8th row of the IBI pass's hop-64 mel when provided, else the fused
        # Pallas kernel), then every 10 s window slot is a static slice
        # of the global envelope.  The reference frames each slot at its own
        # sample origin (s·hop_samples, not a hop multiple), so this carries
        # a ≤ half-hop (256-sample ≈ 12 ms) frame-phase offset per slot and
        # a signal-global (not per-window) dB clamp reference — both far
        # below the tempogram's lag resolution; the CPU path below keeps the
        # reference-exact per-window framing, and the bench accuracy canary
        # pins the decision-level agreement.  Cuts ~26k frames/side to ~5.2k
        # and routes them through the VMEM-resident FFT.
        if share_mel:
            # stride-8 frame subsample via pad→reshape→plain slice (a
            # strided slice here made the corpus program's XLA compile
            # pathological: >40 min vs ~9 min)
            m = mel64.reshape((-1,) + mel64.shape[len(lead):])
            F64 = m.shape[1]
            padf = (-F64) % stride
            if padf:
                m = jnp.pad(m, ((0, 0), (0, padf), (0, 0)))
            mel = m.reshape(m.shape[0], -1, stride,
                            m.shape[-1])[:, :F512, 0, :]
        else:
            mel = melfft.mel_power_hop512_batch(
                ys_f, sr=cfg.sample_rate, n_mels=cfg.n_mels, n_frames=F512)
        env_g = onset.onset_envelope_from_mel(
            mel, jnp.asarray(F512, jnp.int32), cfg.tempo_n_fft, cfg.tempo_hop)
        # round-to-nearest keeps the frame-phase offset ≤ half a hop (floor
        # division reached a full hop at some slots)
        starts = [min((s * cfg.hop_samples + cfg.tempo_hop // 2)
                      // cfg.tempo_hop, max(F512 - f_win, 0))
                  for s in range(cfg.n_window_slots)]
        envs = jnp.stack([jax.lax.slice_in_dim(env_g, st, st + f_win, axis=-1)
                          for st in starts], axis=-2)      # (S, slots, F)
        # per-window envelopes start with onset_pad_width zero frames
        # (librosa zero-pads the flux head); zero the slice heads so slot
        # envelopes match the reference-exact path there instead of
        # carrying cross-window-boundary flux
        pad_w = onset.onset_pad_width(cfg.tempo_n_fft, cfg.tempo_hop)
        head = (jnp.arange(f_win) >= pad_w).astype(envs.dtype)
        envs = envs * head
    else:
        mel = jax.vmap(lambda y: onset.mel_power_windows(y, cfg))(ys_f)
        envs = onset.onset_envelope_from_mel(mel, f_valid, cfg.tempo_n_fft,
                                             cfg.tempo_hop)
    acf_fn = lambda e: tempogram.tempogram_mean_acf(      # noqa: E731
        e, f_valid, win_length=cfg.tempogram_win_length,
        stride=cfg.tempo_frame_stride, chunk=cfg.tg_frame_chunk)
    acf = jax.vmap(jax.vmap(acf_fn))(envs)
    return (envs.reshape(lead + envs.shape[1:]),
            acf.reshape(lead + acf.shape[1:]))


def _window_beat_counts(envs, bpms, cfg: AnalyzerConfig):
    """(2, slots) beat counts via the batched DP tracker (Pallas on TPU)."""
    f_valid = onset.onset_frames_valid(jnp.asarray(cfg.win_samples), cfg.tempo_hop)
    track = beat.beat_track_batch(
        envs, f_valid, bpms, sr=cfg.sample_rate, hop_length=cfg.tempo_hop,
        tightness=cfg.tightness, search_window=cfg.dp_search_window,
        max_beats=cfg.max_beats_window,
        bpm_min=cfg.dp_bpm_min, bpm_max=cfg.dp_bpm_max)
    return track.n_beats


def _global_ibis(ys, ns, start_bpms, cfg: AnalyzerConfig, mel64=None):
    """Full-signal hop-64 IBI extraction over arbitrary leading dims
    (reference tempo.py:120-173).  ``ys``: (..., max_samples); ``mel64``:
    optional precomputed hop-64 global mel (shared with the windowed-tempo
    stage by ``analyze_batch``)."""
    lead = ys.shape[:-1]
    ys_f = ys.reshape((-1, ys.shape[-1]))
    ns_f = ns.reshape(-1)
    bpm0_f = start_bpms.reshape(-1)

    n_frames = jax.vmap(lambda n: onset.onset_frames_valid(n, cfg.ibi_hop))(ns_f)
    mel = (mel64.reshape((-1,) + mel64.shape[len(lead):])
           if mel64 is not None else onset.mel_power_global_batch(ys_f, cfg))
    env = jax.vmap(lambda m, f: onset.onset_envelope_from_mel(
        m, f, cfg.tempo_n_fft, cfg.ibi_hop))(mel, n_frames)
    if cfg.ibi_onset_floor_sub:
        # noise-gated baseline removal ahead of the ACF pick AND the DP
        # (ops/onset.envelope_floor_sub; measured: 11 dB regression
        # 3.0 %→0.002 % median, clean/swing rows untouched by the gate)
        env = onset.envelope_floor_sub(env, n_frames,
                                       cfg.ibi_onset_floor_scale,
                                       cfg.ibi_onset_floor_thresh)
    # Full librosa ac_size window (2756 frames = 8 s at hop 64); only the
    # *output* lags are truncated to ibi_tempo_max_lag — the window width
    # sets the ACF's triangular taper, so shrinking it would bias slow-BPM
    # lags vs the reference (round-1 advisor finding). Lag truncation alone
    # is decision-exact (lags > max_lag are unwinnable under the prior).
    # On TPU at the default geometry this runs as the fused Pallas kernel
    # (ops/pallas/acf.py, f32/HIGHEST: 81 ms → 31 ms per 16-pair batch).
    from ..ops.fft_mxu import _use_mxu
    from ..ops.pallas import acf as pacf
    if _use_mxu() and pacf.supported(cfg.ibi_tempogram_win_length,
                                     cfg.ibi_tempo_stride,
                                     cfg.ibi_tempo_max_lag):
        n_used = jnp.maximum(
            (jnp.minimum(n_frames, env.shape[-1])
             + cfg.ibi_tempo_stride - 1) // cfg.ibi_tempo_stride, 1)
        acf = pacf.mean_acf_batch(env, n_used,
                                  win_length=cfg.ibi_tempogram_win_length,
                                  n_frames=env.shape[-1])
    else:
        acf = jax.vmap(lambda e, f: tempogram.tempogram_mean_acf(
            e, f, win_length=cfg.ibi_tempogram_win_length,
            max_lag=cfg.ibi_tempo_max_lag,
            stride=cfg.ibi_tempo_stride,
            chunk=cfg.tg_frame_chunk))(env, n_frames)
    bpm = jax.vmap(lambda a, b: tempogram.tempo_from_acf(
        a, b, hop_length=cfg.ibi_hop, sr=cfg.sample_rate,
        std_bpm=cfg.std_bpm, max_tempo=cfg.max_tempo))(acf, bpm0_f)
    track = beat.beat_track_batch(
        env, n_frames, bpm, sr=cfg.sample_rate, hop_length=cfg.ibi_hop,
        tightness=cfg.tightness, search_window=cfg.dp_search_window_ibi,
        max_beats=cfg.max_beats, bpm_min=cfg.dp_bpm_min,
        bpm_max=cfg.dp_bpm_max)
    ibis, mask = jax.vmap(lambda b, n: beat.beats_to_ibis(
        b, n, sr=cfg.sample_rate, hop_length=cfg.ibi_hop,
        glitch_sec=cfg.ibi_glitch_sec))(track.beats, track.n_beats)
    n_ibis = jnp.sum(mask, axis=-1)
    valid = (track.n_beats >= cfg.ibi_min_ibis + 1) & (n_ibis >= cfg.ibi_min_ibis)
    rs = lambda x: x.reshape(lead + x.shape[1:])
    return rs(ibis), rs(mask), rs(n_ibis), rs(valid)


def _ibi_ls_slope(ibis: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked least-squares slope of cumulative beat time vs valid index.

    ``ibis``: (..., K) glitch-filtered intervals, ``mask`` marks the valid
    ones.  Fitting T_j = a + b·j over the points (j, Σ first-j valid IBIs)
    gives b = the LS mean interval — it uses every beat timestamp, not just
    the endpoints.  Returns the per-row slope (0 when < 2 valid points).
    """
    mf = mask.astype(jnp.float32)
    j = jnp.cumsum(mf, axis=-1)                  # valid-IBI ordinal (1-based)
    T = jnp.cumsum(ibis * mf, axis=-1)           # beat time since first beat
    n = jnp.maximum(jnp.sum(mf, axis=-1, keepdims=True), 1.0)
    jm = jnp.sum(j * mf, axis=-1, keepdims=True) / n
    Tm = jnp.sum(T * mf, axis=-1, keepdims=True) / n
    num = jnp.sum(mf * (j - jm) * (T - Tm), axis=-1)
    den = jnp.sum(mf * (j - jm) ** 2, axis=-1)
    return jnp.where(den > 1e-9, num / jnp.maximum(den, 1e-9), 0.0)


def _pitch(ys, ns, cfg: AnalyzerConfig):
    """Chroma-xcorr pitch shift (reference pitch.py:100-173)."""
    y4 = resample.decimate_pow2(ys, 4)
    chromas = jax.vmap(lambda y, y4_, n: chroma.chunk_chroma_means(y, y4_, n, cfg)
                       )(ys, y4, ns)                       # (2, max_chunks, 36)

    n_chunks = jnp.minimum(ns[SRC] // cfg.chunk_samples,
                           ns[NC] // cfg.chunk_samples)
    n_eff = jnp.maximum(n_chunks, 1)                       # whole-file fallback
    lags = chroma.cyclic_xcorr_lag(chromas[SRC], chromas[NC])  # (max_chunks,)
    shifts = lags.astype(jnp.float32) / (cfg.chroma_bins_per_octave / 12.0)
    cmask = jnp.arange(cfg.max_chunks) < n_eff

    point = masked_median(shifts, cmask)
    boots = stats.bootstrap_medians(jax.random.PRNGKey(0), shifts, cmask,
                                    cfg.n_bootstrap)
    sb = jnp.sort(boots)
    alpha = (1.0 - cfg.ci_level) / 2.0
    st_lo = stats.percentile(sb, alpha * 100.0)
    st_hi = stats.percentile(sb, (1.0 - alpha) * 100.0)
    enough = n_eff >= cfg.min_chunks
    st_lo = jnp.where(enough, st_lo, point)
    st_hi = jnp.where(enough, st_hi, point)

    # consensus-compatible implied-Hz ratio bootstrap (pitch.py:156-160 →
    # consensus._bootstrap_ratio with src ≡ 440 Hz)
    nc_hz = cfg.ref_hz * 2.0 ** (shifts / 12.0)
    src_hz = jnp.full_like(nc_hz, cfg.ref_hz)
    ratio, lo, hi = stats.bootstrap_ratio_ci(
        jax.random.PRNGKey(42), nc_hz, cmask, src_hz, cmask,
        n_boot=cfg.n_bootstrap, ci=cfg.ci_level)

    # ── sub-semitone refinement (ops/f0.py — first-party MELODIA leg) ────────
    if cfg.compute_pitch_refine:
        spec_ch, cnts, _, _, _ = jax.vmap(
            lambda yy, y4_, nn: f0.f0_features(yy, y4_, nn, cfg))(ys, y4, ns)
        r_shifts, _r_qs = jax.vmap(
            lambda s, n_: f0.spectral_shift_st(s, n_, cfg)
        )(spec_ch[SRC], spec_ch[NC])                   # (max_chunks,)
        rmask = cmask & (cnts[SRC] > 0) & (cnts[NC] > 0)
        # whole-file spectra (sums over every valid frame) give the finest
        # single estimate; the per-chunk shifts supply an honest bootstrap CI
        g_st, g_q = f0.spectral_shift_st(jnp.sum(spec_ch[SRC], axis=0),
                                         jnp.sum(spec_ch[NC], axis=0), cfg)
        rboots = jnp.sort(stats.bootstrap_medians(
            jax.random.PRNGKey(7), r_shifts, rmask, cfg.n_bootstrap))
        r_lo = stats.percentile(rboots, alpha * 100.0)
        r_hi = stats.percentile(rboots, (1.0 - alpha) * 100.0)
        enough_r = jnp.sum(rmask) >= cfg.min_chunks
        ok = ((g_q >= cfg.pitch_refine_min_quality)
              & (jnp.abs(g_st - point) <= cfg.pitch_refine_agree_st)
              & (jnp.sum(cnts[SRC]) > 0) & (jnp.sum(cnts[NC]) > 0))
        refined = jnp.where(ok, g_st, point)
        r_lo = jnp.where(ok & enough_r, r_lo, refined)
        r_hi = jnp.where(ok & enough_r, r_hi, refined)
        r_shifts = jnp.where(rmask, r_shifts, 0.0)
    else:
        r_shifts = jnp.zeros_like(shifts)
        refined = point
        r_lo = r_hi = point
        g_q = jnp.zeros(())
        ok = jnp.zeros((), bool)
    return (shifts, cmask, n_eff, point, st_lo, st_hi, ratio, lo, hi,
            r_shifts, refined, r_lo, r_hi, g_q, ok)


def analyze_batch(nc: jnp.ndarray, n_nc: jnp.ndarray,
                  src: jnp.ndarray, n_src: jnp.ndarray,
                  src_trim: jnp.ndarray, cfg: AnalyzerConfig,
                  *, auto_align: bool = False,
                  compute_pitch: bool = True) -> PairAnalysis:
    """Batched device analysis of B (nightcore, source) pairs.

    ``nc``/``src``: (B, cfg.max_samples) mono 22.05 kHz float32, zero-padded;
    ``n_nc``/``n_src``/``src_trim``: (B,) sample counts / manual source-head
    trims (pipeline.py:106-110).  ``auto_align``/``compute_pitch`` are
    trace-time flags (pipeline.py:31-33).  Returns a ``PairAnalysis`` whose
    every leaf has leading dim B.

    Batch-first on purpose: the beat-DP stages flatten (B, 2[, slots]) into
    the lane axis of a single Pallas launch.
    """
    B = nc.shape[0]
    zeros_b = jnp.zeros(B, jnp.int32)
    n_nc = n_nc.astype(jnp.int32)
    n_src = n_src.astype(jnp.int32)

    # ── 1b. silence strip (pipeline.py:93-104) ──────────────────────────────
    # The src side defers its strip roll so it can fuse with the trim/align
    # roll below (a full-signal dynamic roll is ~HBM-bound; 3 rolls → 2 on
    # the default path).
    if cfg.strip_silence:
        nc, n_nc, nc_lead, nc_trail = jax.vmap(
            lambda y, n: _strip(y, n, cfg))(nc, n_nc)
        src_start, src_end = jax.vmap(
            lambda y, n: energy.trim_bounds_y(y, n, cfg.silence_strip_db)
        )(src, n_src)
        src_lead, src_trail = src_start, n_src - src_end
        n_src = src_end - src_start
    else:
        nc_lead = nc_trail = src_lead = src_trail = zeros_b
        src_start = zeros_b

    # ── 1c. source trim: manual overrides auto (pipeline.py:106-127) ────────
    src_trim = jnp.clip(src_trim, 0, n_src)
    align_speed = jnp.ones(B)
    if auto_align:
        src_stripped = jax.vmap(energy.roll_to_start)(src, src_start)
        raw_off, align_speed = jax.vmap(
            lambda s, m, ns_, nn_: align.find_content_offset(s, m, ns_, nn_, cfg)
        )(src_stripped, nc, n_src, n_nc)
        auto_samples = jnp.where(
            raw_off >= cfg.align_min_offset,
            (raw_off * cfg.sample_rate).astype(jnp.int32), 0)
        offset = jnp.where(src_trim > 0, src_trim, auto_samples)
    else:
        offset = src_trim
    # single roll: strip start + manual/auto trim (roll composition is
    # additive; the tail garbage is masked by the length bookkeeping)
    src = jax.vmap(energy.roll_to_start)(src, src_start + offset)
    n_src = n_src - offset

    ys = jnp.stack([nc, src], axis=1)           # (B, 2, max_samples)
    ns = jnp.stack([n_nc, n_src], axis=1)       # (B, 2)

    # ── 4. pitch (pipeline.py:149-158) ──────────────────────────────────────
    if compute_pitch:
        (pitch_shifts, cmask, n_chunks, p_point, p_lo, p_hi,
         pr, pr_lo, pr_hi,
         p_ref_chunks, p_ref, p_ref_lo, p_ref_hi, p_ref_q, p_ref_ok
         ) = jax.vmap(lambda y, n: _pitch(y, n, cfg))(ys, ns)
    else:
        pitch_shifts = jnp.zeros((B, cfg.max_chunks))
        cmask = jnp.zeros((B, cfg.max_chunks), bool)
        n_chunks = zeros_b
        p_point = p_lo = p_hi = jnp.zeros(B)
        pr = pr_lo = pr_hi = jnp.ones(B)
        p_ref_chunks = jnp.zeros((B, cfg.max_chunks))
        p_ref = p_ref_lo = p_ref_hi = p_ref_q = jnp.zeros(B)
        p_ref_ok = jnp.zeros(B, bool)

    # ── 2/3. windows + energy gate (pipeline.py:129-146) ────────────────────
    gates = jax.vmap(lambda y, n: _gates(y, n, cfg))(ys, ns)   # (B, 2, slots)
    all_gated = (jnp.sum(gates[:, NC], -1) == 0) | \
        (jnp.sum(gates[:, SRC], -1) == 0)

    # ── 5. two-phase windowed tempo (pipeline.py:160-186) ───────────────────
    # One hop-64 global mel serves both the windowed-tempo stage (every 8th
    # frame IS the hop-512 grid) and the IBI pass below.
    mel64 = onset.mel_power_global_batch(
        ys.reshape(-1, ys.shape[-1]), cfg).reshape(
            B, 2, -1, cfg.n_mels)
    envs, acf = _window_acfs(ys, cfg, mel64)                   # (B,2,slots,·)

    tempo_pick = lambda a, prior: tempogram.tempo_from_acf(  # noqa: E731
        a, prior, hop_length=cfg.tempo_hop, sr=cfg.sample_rate,
        std_bpm=cfg.std_bpm, max_tempo=cfg.max_tempo,
        subgrid=cfg.tempo_subgrid)

    src_bpms = jax.vmap(jax.vmap(
        lambda a: tempo_pick(a, jnp.asarray(120.0))))(acf[:, SRC])

    # Source-side beat-count DP runs *before* the prior is formed: the
    # reference medians over windows that passed both the energy gate and
    # the >=4-beat gate (pipeline.py:169-183 via batch_estimate_tempo's
    # None filtering), so sparse-beat windows that merely survive the
    # energy gate must not contribute junk BPMs to the nightcore prior.
    src_n_beats = _window_beat_counts(
        envs[:, SRC:SRC + 1], src_bpms[:, None, :], cfg)[:, 0]
    src_tmask = gates[:, SRC] & (src_n_beats >= cfg.min_beats)

    dur_ratio = n_src.astype(jnp.float32) / jnp.maximum(n_nc, 1)
    src_median_prior = masked_median(src_bpms, src_tmask)
    have_prior = (jnp.sum(src_tmask, -1) > 0) & (n_nc > 0) & (n_src > 0)
    nc_start_bpm = jnp.where(have_prior, src_median_prior * dur_ratio, 120.0)

    nc_bpms = jax.vmap(lambda a, p: jax.vmap(
        lambda aa: tempo_pick(aa, p))(a))(acf[:, NC], nc_start_bpm)

    nc_n_beats = _window_beat_counts(
        envs[:, NC:NC + 1], nc_bpms[:, None, :], cfg)[:, 0]
    bpms = jnp.stack([nc_bpms, src_bpms], axis=1)   # (B, 2, slots)
    n_beats = jnp.stack([nc_n_beats, src_n_beats], axis=1)
    tmask = gates & (n_beats >= cfg.min_beats)

    src_tempos, src_tmask = bpms[:, SRC], tmask[:, SRC]
    nc_tempos, nc_tmask = bpms[:, NC], tmask[:, NC]
    src_median = masked_median(src_tempos, src_tmask)
    nc_median = masked_median(nc_tempos, nc_tmask)

    tempo_insufficient = (jnp.sum(src_tmask, -1) < cfg.min_valid) | \
        (jnp.sum(nc_tmask, -1) < cfg.min_valid)

    boot = jax.vmap(lambda nv, nm, sv, sm: stats.bootstrap_ratio_ci(
        jax.random.PRNGKey(42), nv, nm, sv, sm,
        n_boot=cfg.n_bootstrap, ci=cfg.ci_level))
    tempo_ratio, t_lo, t_hi = boot(nc_tempos, nc_tmask, src_tempos, src_tmask)

    # ── 7. IBI pass (pipeline.py:198-213) ───────────────────────────────────
    start_bpms = jnp.stack([nc_start_bpm, jnp.full(B, 120.0)], axis=1)
    ibis, imask, n_ibis, ivalid = _global_ibis(ys, ns, start_bpms, cfg, mel64)
    # ratio = median(src)/median(nc)  (consensus.py:270-312)
    ibi_ratio, i_lo, i_hi = boot(
        ibis[:, SRC], imask[:, SRC], ibis[:, NC], imask[:, NC])
    ibi_valid = (ivalid[:, SRC] & ivalid[:, NC] &
                 (n_ibis[:, SRC] >= 4) & (n_ibis[:, NC] >= 4))
    ibi_refined = (stats.masked_mean(ibis[:, SRC], imask[:, SRC]) /
                   stats.masked_mean(ibis[:, NC], imask[:, NC]))
    # Beat-time linear regression (beyond-reference, round-2): LS slope of
    # cumulative beat time vs valid-IBI index.  The mean-IBI estimator is
    # (t_last - t_first)/n — only the endpoint frames' ±hop/2 quantization
    # enters; the LS slope averages the hop-grid noise of EVERY beat
    # timestamp, the best linear-unbiased estimate under per-beat jitter.
    ibi_regression = (_ibi_ls_slope(ibis[:, SRC], imask[:, SRC]) /
                      jnp.maximum(_ibi_ls_slope(ibis[:, NC], imask[:, NC]),
                                  1e-9))

    return PairAnalysis(
        nc_len=n_nc, src_len=n_src,
        nc_lead=nc_lead, nc_trail=nc_trail,
        src_lead=src_lead, src_trail=src_trail,
        intro_offset=offset, align_speed=align_speed,
        src_tempos=src_tempos, src_tempo_mask=src_tmask,
        nc_tempos=nc_tempos, nc_tempo_mask=nc_tmask,
        n_src_windows=jnp.sum(gates[:, SRC], -1),
        n_nc_windows=jnp.sum(gates[:, NC], -1),
        src_gate=gates[:, SRC], nc_gate=gates[:, NC],
        all_gated=all_gated,
        src_median_bpm=src_median, nc_median_bpm=nc_median,
        nc_start_bpm=nc_start_bpm,
        tempo_ratio=tempo_ratio, tempo_lo=t_lo, tempo_hi=t_hi,
        tempo_insufficient=tempo_insufficient,
        pitch_shifts_st=pitch_shifts, pitch_chunk_mask=cmask,
        n_chunks=n_chunks,
        pitch_point_st=p_point, pitch_st_lo=p_lo, pitch_st_hi=p_hi,
        pitch_ratio=pr, pitch_lo=pr_lo, pitch_hi=pr_hi,
        pitch_refined_chunk_st=p_ref_chunks, pitch_refined_st=p_ref,
        pitch_refined_lo=p_ref_lo, pitch_refined_hi=p_ref_hi,
        pitch_refined_quality=p_ref_q, pitch_refined_ok=p_ref_ok,
        ibi_ratio=ibi_ratio, ibi_lo=i_lo, ibi_hi=i_hi, ibi_valid=ibi_valid,
        n_src_ibis=n_ibis[:, SRC], n_nc_ibis=n_ibis[:, NC],
        ibi_refined_ratio=ibi_refined,
        ibi_regression_ratio=ibi_regression,
    )


def analyze_pair(nc: jnp.ndarray, n_nc: jnp.ndarray,
                 src: jnp.ndarray, n_src: jnp.ndarray,
                 src_trim: jnp.ndarray, cfg: AnalyzerConfig,
                 *, auto_align: bool = False,
                 compute_pitch: bool = True) -> PairAnalysis:
    """Single-pair analysis: batch-of-one wrapper over :func:`analyze_batch`
    (same contract as the reference ``pipeline.run`` numeric core)."""
    pa = analyze_batch(
        nc[None], jnp.asarray(n_nc)[None], src[None], jnp.asarray(n_src)[None],
        jnp.asarray(src_trim)[None], cfg,
        auto_align=auto_align, compute_pitch=compute_pitch)
    return jax.tree_util.tree_map(lambda x: x[0], pa)


@lru_cache(maxsize=32)
def build_analyze_fn(cfg: AnalyzerConfig, auto_align: bool = False,
                     compute_pitch: bool = True):
    """jit-compiled single-pair analysis for a given static config."""
    fn = partial(analyze_pair, cfg=cfg, auto_align=auto_align,
                 compute_pitch=compute_pitch)
    return jax.jit(lambda nc, n_nc, src, n_src, src_trim:
                   fn(nc, n_nc, src, n_src, src_trim))
