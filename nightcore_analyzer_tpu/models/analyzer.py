"""The flagship device program: one jit-compiled pair analysis.

Rebuilds the reference orchestrator ``pipeline.run`` (``pipeline.py:23-216``)
as a single pure array program over fixed-shape buffers:

    load (host) → silence trim → manual/auto source trim → window + energy
    gate → chroma-xcorr pitch → two-phase windowed tempo (source prior 120,
    nightcore prior = median(src BPM) × duration ratio, ``pipeline.py:161-186``)
    → bootstrap ratios → full-signal hop-64 IBI pass (``pipeline.py:198-213``)

Everything data-dependent (agreement gates, fallbacks) is computed with masks
and ``where``-selects; all strings/warnings live on the host side
(``analyze.consensus``), which consumes the returned scalar flags — the same
numbers/prose split as the reference's consensus layer.

Batching: ``analyze_pair`` is written for one pair; ``batch.corpus`` vmaps it
over the pair axis and shards that axis across the TPU mesh (SURVEY §2.3's
parallelism map).
"""

from __future__ import annotations

from functools import partial, lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import AnalyzerConfig
from ..ops import onset, tempogram, beat, chroma, energy, resample, stats, align
from ..ops.stats import masked_median

__all__ = ["PairAnalysis", "analyze_pair", "build_analyze_fn"]


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

    # ── high-precision IBI pass ──────────────────────────────────────────────
    ibi_ratio: jnp.ndarray
    ibi_lo: jnp.ndarray
    ibi_hi: jnp.ndarray
    ibi_valid: jnp.ndarray
    n_src_ibis: jnp.ndarray
    n_nc_ibis: jnp.ndarray


def _strip(y, n, cfg: AnalyzerConfig):
    cs = energy.energy_cumsum(y)
    start, end = energy.trim_bounds(cs, n, cfg.silence_strip_db)
    y2 = energy.roll_to_start(y, start)
    return y2, end - start, start, n - end


def _window_tempos(y, n, start_bpm, cfg: AnalyzerConfig):
    """Per-window BPM + validity for one side (reference tempo.py:27-111)."""
    mel = onset.mel_power_windows(y, cfg)                  # (slots, F, mels)
    f_valid = onset.onset_frames_valid(jnp.asarray(cfg.win_samples), cfg.tempo_hop)
    envs = onset.onset_envelope_from_mel(
        mel, f_valid, cfg.tempo_n_fft, cfg.tempo_hop)      # (slots, F)

    acf = jax.vmap(lambda e: tempogram.tempogram_mean_acf(
        e, f_valid, win_length=cfg.tempogram_win_length,
        stride=cfg.tempo_frame_stride, chunk=cfg.tg_frame_chunk))(envs)
    bpms = jax.vmap(lambda a: tempogram.tempo_from_acf(
        a, start_bpm, hop_length=cfg.tempo_hop, sr=cfg.sample_rate,
        std_bpm=cfg.std_bpm, max_tempo=cfg.max_tempo))(acf)

    track = jax.vmap(lambda e, b: beat.beat_track(
        e, f_valid, b, sr=cfg.sample_rate, hop_length=cfg.tempo_hop,
        tightness=cfg.tightness, search_window=cfg.dp_search_window,
        max_beats=cfg.max_beats_window,
        bpm_min=cfg.dp_bpm_min, bpm_max=cfg.dp_bpm_max))(envs, bpms)

    enough_beats = track.n_beats >= cfg.min_beats
    cs = energy.energy_cumsum(y)
    edb, slot_valid = energy.window_energies_db(cs, n, cfg)
    gate = energy.energy_gate_mask(edb, slot_valid, cfg.energy_gate_db)
    return bpms, gate & enough_beats, gate


def _global_ibis(y, n, start_bpm, cfg: AnalyzerConfig):
    """Full-signal hop-64 IBI extraction (reference tempo.py:120-173)."""
    mel = onset.mel_power_global(y, cfg)
    n_frames = onset.onset_frames_valid(n, cfg.ibi_hop)
    env = onset.onset_envelope_from_mel(mel, n_frames, cfg.tempo_n_fft, cfg.ibi_hop)
    acf = tempogram.tempogram_mean_acf(
        env, n_frames, win_length=cfg.ibi_tempogram_win_length,
        stride=cfg.ibi_tempo_stride, chunk=cfg.tg_frame_chunk)
    bpm = tempogram.tempo_from_acf(
        acf, start_bpm, hop_length=cfg.ibi_hop, sr=cfg.sample_rate,
        std_bpm=cfg.std_bpm, max_tempo=cfg.max_tempo)
    track = beat.beat_track(
        env, n_frames, bpm, sr=cfg.sample_rate, hop_length=cfg.ibi_hop,
        tightness=cfg.tightness, search_window=cfg.dp_search_window_ibi,
        max_beats=cfg.max_beats, bpm_min=cfg.dp_bpm_min, bpm_max=cfg.dp_bpm_max)
    ibis, mask = beat.beats_to_ibis(track.beats, track.n_beats,
                                    sr=cfg.sample_rate, hop_length=cfg.ibi_hop,
                                    glitch_sec=cfg.ibi_glitch_sec)
    n_ibis = jnp.sum(mask)
    valid = (track.n_beats >= cfg.ibi_min_ibis + 1) & (n_ibis >= cfg.ibi_min_ibis)
    return ibis, mask, n_ibis, valid


def _pitch(nc, n_nc, src, n_src, cfg: AnalyzerConfig):
    """Chroma-xcorr pitch shift (reference pitch.py:100-173)."""
    nc4 = resample.decimate_pow2(nc, 4)
    src4 = resample.decimate_pow2(src, 4)
    nc_chroma = chroma.chunk_chroma_means(nc, nc4, n_nc, cfg)
    src_chroma = chroma.chunk_chroma_means(src, src4, n_src, cfg)

    n_chunks = jnp.minimum(n_src // cfg.chunk_samples, n_nc // cfg.chunk_samples)
    n_eff = jnp.maximum(n_chunks, 1)                    # whole-file fallback
    lags = chroma.cyclic_xcorr_lag(src_chroma, nc_chroma)   # (max_chunks,)
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
    return shifts, cmask, n_eff, point, st_lo, st_hi, ratio, lo, hi


def analyze_pair(nc: jnp.ndarray, n_nc: jnp.ndarray,
                 src: jnp.ndarray, n_src: jnp.ndarray,
                 src_trim: jnp.ndarray, cfg: AnalyzerConfig,
                 *, auto_align: bool = False,
                 compute_pitch: bool = True) -> PairAnalysis:
    """Device analysis of one (nightcore, source) pair.

    ``nc``/``src``: (cfg.max_samples,) mono 22.05 kHz float32, zero-padded;
    ``n_nc``/``n_src``: valid sample counts; ``src_trim``: samples to drop
    from the source head (manual intro trim, reference pipeline.py:106-110).
    ``auto_align``/``compute_pitch`` are trace-time flags (pipeline.py:31-33).
    """
    zero = jnp.asarray(0, jnp.int32)

    # ── 1b. silence strip (pipeline.py:93-104) ──────────────────────────────
    if cfg.strip_silence:
        nc, n_nc, nc_lead, nc_trail = _strip(nc, n_nc, cfg)
        src, n_src, src_lead, src_trail = _strip(src, n_src, cfg)
    else:
        nc_lead = nc_trail = src_lead = src_trail = zero

    # ── 1c. source trim: manual overrides auto (pipeline.py:106-127) ────────
    src_trim = jnp.clip(src_trim, 0, n_src)
    align_speed = jnp.asarray(1.0)
    if auto_align:
        raw_off, align_speed = align.find_content_offset(src, nc, n_src, n_nc, cfg)
        auto_samples = jnp.where(
            raw_off >= cfg.align_min_offset,
            (raw_off * cfg.sample_rate).astype(jnp.int32), 0)
        offset = jnp.where(src_trim > 0, src_trim, auto_samples)
    else:
        offset = src_trim
    src = energy.roll_to_start(src, offset)
    n_src = n_src - offset

    # ── 4. pitch (pipeline.py:149-158) ──────────────────────────────────────
    if compute_pitch:
        (pitch_shifts, cmask, n_chunks, p_point, p_lo, p_hi,
         pr, pr_lo, pr_hi) = _pitch(nc, n_nc, src, n_src, cfg)
    else:
        pitch_shifts = jnp.zeros(cfg.max_chunks)
        cmask = jnp.zeros(cfg.max_chunks, bool)
        n_chunks = zero
        p_point = p_lo = p_hi = jnp.asarray(0.0)
        pr = pr_lo = pr_hi = jnp.asarray(1.0)

    # ── 5. two-phase windowed tempo (pipeline.py:160-186) ───────────────────
    src_tempos, src_tmask, src_gate = _window_tempos(
        src, n_src, jnp.asarray(120.0), cfg)
    src_median = masked_median(src_tempos, src_tmask)

    dur_ratio = n_src.astype(jnp.float32) / jnp.maximum(n_nc, 1)
    have_prior = (jnp.sum(src_tmask) > 0) & (n_nc > 0) & (n_src > 0)
    nc_start_bpm = jnp.where(have_prior, src_median * dur_ratio, 120.0)

    nc_tempos, nc_tmask, nc_gate = _window_tempos(nc, n_nc, nc_start_bpm, cfg)
    nc_median = masked_median(nc_tempos, nc_tmask)

    all_gated = (jnp.sum(nc_gate) == 0) | (jnp.sum(src_gate) == 0)
    tempo_insufficient = (jnp.sum(src_tmask) < cfg.min_valid) | \
        (jnp.sum(nc_tmask) < cfg.min_valid)

    tempo_ratio, t_lo, t_hi = stats.bootstrap_ratio_ci(
        jax.random.PRNGKey(42), nc_tempos, nc_tmask, src_tempos, src_tmask,
        n_boot=cfg.n_bootstrap, ci=cfg.ci_level)

    # ── 7. IBI pass (pipeline.py:198-213) ───────────────────────────────────
    src_ibis, src_imask, n_src_ibis, src_ivalid = _global_ibis(
        src, n_src, jnp.asarray(120.0), cfg)
    nc_ibis, nc_imask, n_nc_ibis, nc_ivalid = _global_ibis(
        nc, n_nc, nc_start_bpm, cfg)
    # ratio = median(src)/median(nc)  (consensus.py:270-312)
    ibi_ratio, i_lo, i_hi = stats.bootstrap_ratio_ci(
        jax.random.PRNGKey(42), src_ibis, src_imask, nc_ibis, nc_imask,
        n_boot=cfg.n_bootstrap, ci=cfg.ci_level)
    ibi_valid = src_ivalid & nc_ivalid & (n_src_ibis >= 4) & (n_nc_ibis >= 4)

    return PairAnalysis(
        nc_len=n_nc, src_len=n_src,
        nc_lead=nc_lead, nc_trail=nc_trail,
        src_lead=src_lead, src_trail=src_trail,
        intro_offset=offset, align_speed=align_speed,
        src_tempos=src_tempos, src_tempo_mask=src_tmask,
        nc_tempos=nc_tempos, nc_tempo_mask=nc_tmask,
        n_src_windows=jnp.sum(src_gate), n_nc_windows=jnp.sum(nc_gate),
        src_gate=src_gate, nc_gate=nc_gate,
        all_gated=all_gated,
        src_median_bpm=src_median, nc_median_bpm=nc_median,
        nc_start_bpm=nc_start_bpm,
        tempo_ratio=tempo_ratio, tempo_lo=t_lo, tempo_hi=t_hi,
        tempo_insufficient=tempo_insufficient,
        pitch_shifts_st=pitch_shifts, pitch_chunk_mask=cmask,
        n_chunks=n_chunks,
        pitch_point_st=p_point, pitch_st_lo=p_lo, pitch_st_hi=p_hi,
        pitch_ratio=pr, pitch_lo=pr_lo, pitch_hi=pr_hi,
        ibi_ratio=ibi_ratio, ibi_lo=i_lo, ibi_hi=i_hi, ibi_valid=ibi_valid,
        n_src_ibis=n_src_ibis, n_nc_ibis=n_nc_ibis,
    )


@lru_cache(maxsize=32)
def build_analyze_fn(cfg: AnalyzerConfig, auto_align: bool = False,
                     compute_pitch: bool = True):
    """jit-compiled single-pair analysis for a given static config."""
    fn = partial(analyze_pair, cfg=cfg, auto_align=auto_align,
                 compute_pitch=compute_pitch)
    return jax.jit(lambda nc, n_nc, src, n_src, src_trim:
                   fn(nc, n_nc, src, n_src, src_trim))
