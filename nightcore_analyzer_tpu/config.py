"""Static configuration for the TPU-native nightcore analyzer.

Every tunable of the reference implementation is mirrored here with the same
default value (citations point into ``/root/reference/``):

* sample rate / window / hop / gate / silence-strip — ``io.py:19-23``
* tempo estimator constants — ``tempo.py:22-24,116-117``
* pitch (chroma) constants — ``pitch.py:42-50``
* consensus / bootstrap constants — ``consensus.py:52-62``
* xcorr verify + auto-align constants — ``xcorr.py:33-51``

Unlike the reference (module-level constants shadowed by CLI flags), the TPU
build needs *static shapes*: everything under ``jit`` is traced once, so the
config is a frozen (hashable) dataclass that doubles as the static argument of
the compiled analysis program.  Derived sizes (number of window slots, frame
counts, chunk counts…) are exposed as cached properties.
"""

from __future__ import annotations

import dataclasses
import math
from functools import cached_property

__all__ = ["AnalyzerConfig", "DEFAULT_CONFIG", "bucket_for_duration",
           "config_for_bucket", "truncation_warning"]


@dataclasses.dataclass(frozen=True)
class AnalyzerConfig:
    # ── signal I/O (reference io.py:19-23) ───────────────────────────────────
    sample_rate: int = 22050
    window_sec: float = 10.0
    hop_sec: float = 5.0
    energy_gate_db: float = -40.0
    silence_strip_db: float = 60.0          # top_db for trim; gated by strip_silence flag
    strip_silence: bool = True

    # ── static shape bucket ──────────────────────────────────────────────────
    # All device buffers are padded to max_duration_sec; actual lengths ride
    # along as scalars and everything downstream is masked.
    max_duration_sec: float = 300.0

    # ── tempo estimator (reference tempo.py:22-24) ───────────────────────────
    tempo_hop: int = 512
    tempo_n_fft: int = 2048
    n_mels: int = 128
    min_beats: int = 4
    # NOTE: the reference's 8% two-estimator agreement knob (tempo.py:23) has
    # no equivalent here by design: both of its "independent" estimators
    # resolve to feature.tempo (see below), so the consensus reduces to the
    # single ACF pick and a tunable would be a dead trap.
    # librosa feature.tempo defaults (the actual windowed estimator — the
    # reference's two "independent" estimators are both feature.tempo, see
    # tempo.py:45-68 where beat_track's returned tempo IS feature.tempo's)
    ac_size: float = 8.0
    std_bpm: float = 1.0
    max_tempo: float = 320.0
    tightness: float = 100.0
    # Parabolic sub-grid interpolation of the ACF tempo peak — beyond the
    # reference's integer-lag quantization; OFF by default for parity.
    tempo_subgrid: bool = False
    # Classification v2 (beyond-reference, ON by default since round 4):
    # when the IBI pass is valid, classify against the beat-time estimators
    # instead of the grid-quantized windowed ratio — removes the
    # time_stretch_only / independent_pitch_shift misfires on constant-tempo
    # material, where every window snaps to the same (slightly wrong) grid
    # BPM (the reference's own fragility, consensus.py:315-336 fed by
    # tempo.py:61-68: 28/56 on the bench's pure pairs).  When the IBI pass
    # is invalid the windowed path is used unchanged.  Set False (CLI
    # --classify-parity) to reproduce the reference's classification
    # behavior exactly.
    classify_on_ibi: bool = True
    # IBI octave rescue (beyond-reference, host-side, ON by default): on
    # heavily swung material the DP beat tracker can lock one side onto the
    # 2-beat swing-pair period, exactly halving (or doubling) every
    # IBI-derived ratio while the windowed/duration evidence stays correct.
    # When the regression estimator disagrees with the beat-free duration
    # ratio by more than ibi_octave_tolerance but an octave multiple
    # (×2 or ×0.5) agrees within it, all IBI estimators and their CI are
    # rescaled by that multiple and a warning is emitted.  The reference's
    # own half-time flip (consensus.py:563-576) only repairs inversions;
    # this extends the same duration-arbitrated idea to octave locks.
    ibi_octave_rescue: bool = True
    ibi_octave_tolerance: float = 0.02
    # Octave-rescue third leg (host-side, round 5): when the rescue
    # deliberation is ambiguous (windowed leg broken, or the windowed veto
    # could itself be a same-level windowed+DP lock), the envelope
    # speed-candidate discriminator (analyze/envspeed.py) decides IF its
    # NCC verdict is conclusive — winner ≥ min_score and ahead of the
    # loser by ≥ margin (measured on the sweep conditions: true-speed
    # NCC 0.55–0.95, octave-wrong 0.05–0.30; 11 dB noise narrows but
    # never inverts the gap).  Inconclusive keeps the two-leg behavior.
    rescue_env_min_score: float = 0.4
    rescue_env_margin: float = 0.1
    # Loose-tolerance rescue (round 5): compound swing+noise (measured at
    # swing 8 % + 11 dB SNR) can halve the DP *inexactly* — ~0.51–0.52×
    # true instead of 0.500× — which the exact-octave check can never
    # catch (three ~48 % errors in the sweep row).  When no exact octave
    # candidate exists but one lands within the loose tolerance AND the
    # envelope discriminator conclusively sides with the duration ratio,
    # the rescale still applies, with a warning that a residual (~2–3 %)
    # beat-tracking error remains on this degraded material.  Audio
    # required (the envelope leg is the only guard against false loose
    # rescues); without it the raw estimate stands.
    ibi_octave_loose_tolerance: float = 0.10
    # Frame stride when aggregating the local-ACF tempogram.  1 == librosa
    # semantics (mean over every onset frame).  The global hop-64 pass uses
    # ibi_tempo_stride to bound compute; the aggregate is a mean so striding
    # is statistically transparent.
    tempo_frame_stride: int = 1

    # ── high-precision IBI pass (reference tempo.py:116-117) ────────────────
    ibi_hop: int = 64
    # Noise-gated onset-envelope baseline subtraction on the hop-64 pass
    # (beyond-reference, round 5; ops/onset.envelope_floor_sub): broadband
    # noise adds a near-constant positive-flux baseline that pays the
    # Ellis-DP for every inserted beat (spurious subdivisions + beat
    # jitter).  Subtracting the valid-frame median restores the reward
    # structure — but ONLY noise-floored envelopes are conditioned (the
    # per-side med/mean gate below): unconditional subtraction converts
    # heavy-swing octave locks (cleanly rescued by the duration arbiter)
    # into ~1 % unrescuable beat corruption (measured, sweep swing rows).
    # Measured with the gate (tools/robustness_sweep.py, 16 pairs): 11 dB
    # regression 3.0 %→0.002 % median, 10.5 %→0.005 % max; every other
    # row bit-identical to the ungated baseline (the gate never fires
    # above ~14 dB SNR — clean/swing ratios 0.45–0.51, 17 dB 0.92–0.93,
    # 11 dB 0.96–0.97).  OFF reproduces the reference's raw librosa
    # envelope exactly.
    ibi_onset_floor_sub: bool = True
    ibi_onset_floor_scale: float = 1.0
    ibi_onset_floor_thresh: float = 0.95
    ibi_min_ibis: int = 4
    ibi_glitch_sec: float = 0.05
    ibi_tempo_stride: int = 16
    # Max ACF lag evaluated for the hop-64 global tempo pick.  Lag 1024 ≈
    # 20 BPM; beyond it the log-normal prior penalty (≥3.3 nats at default
    # std_bpm) exceeds the largest possible score gain (ACF is maximal at
    # lag 0 by Cauchy-Schwarz, so normalized ACF ≤ 1 everywhere), making
    # longer lags unwinnable — truncation is decision-exact and cuts the
    # tempogram matmul ~2.7×.
    ibi_tempo_max_lag: int = 1024
    max_beats: int = 2048                   # fixed-capacity global beat buffer
    max_beats_window: int = 64              # per-10s-window beat buffer
    # DP beat tracker BPM clamp (keeps the search window statically bounded)
    dp_bpm_min: float = 50.0
    dp_bpm_max: float = 400.0

    # ── pitch estimator (reference pitch.py:42-50) ───────────────────────────
    chroma_bins_per_octave: int = 36
    chroma_hop: int = 512
    chunk_sec: float = 20.0
    min_chunks: int = 3
    ref_hz: float = 440.0
    chroma_n_octaves: int = 7               # C1..B7, librosa chroma_cqt default
    chroma_fmin: float = 32.70319566257483  # C1
    chroma_n_fft: int = 4096                # per-stream FFT size (dual stream)
    chroma_low_octaves: int = 3             # octaves served by the 4x-decimated stream
    # Per-bin noise-floor subtraction ahead of the octave fold
    # (beyond-reference, ON by default since round 4): each 20 s chunk's
    # per-CQT-bin median magnitude over its frames — a stationary-noise
    # floor estimate — is subtracted (clamped at 0) before folding to
    # chroma.  Broadband noise raises every bin's floor and washes out the
    # max-normalized chroma; sparse-in-time musical content barely moves a
    # 20 s median.  Measured (tools/robustness_sweep.py conditions, 16
    # pairs): 17 dB SNR pitch grid 11/16 → 16/16, 11 dB 0/16 → 12/16,
    # clean decisions unchanged.  The floor must be CHUNK-scoped: a 6 s
    # tile median eats signal (tile-scoped variants measured ≤5/16 at
    # 17 dB).  False = the reference's plain chroma_cqt front-end.
    chroma_floor_sub: bool = True
    # Floor strength: subtract scale·median.  Measured curve (16 pairs,
    # same harness; hits at clean / 17 dB / 11 dB):
    # 1.0→16/16/12, 1.2→16/16/13, 1.35→16/16/15, 1.5→16/16/16,
    # 1.65→15/16/16, 1.8→13/16/16.  1.0 is the base: 1.5 buys the last
    # 11 dB misses but sits one notch from the clean-accuracy cliff
    # (1.65 already drops a clean pair) — clean material should keep the
    # margin, so the scale is AUTO-SELECTED per side (round 5): the chroma
    # kernel emits a per-chunk noise proxy (real-bin Σ(per-bin 20 s median
    # floor)/Σ(per-bin peak) — broadband noise lifts every bin's median
    # toward its peak, sparse musical content doesn't), the valid-chunk
    # mean is compared against chroma_floor_noise_thresh, and noisy sides
    # take chroma_floor_scale_noisy (both folds are computed in-kernel,
    # ~1 % of its matmul work; one compiled program serves both outcomes).
    # Measured proxy separation (sweep conditions, 110 s sides on chip,
    # 8 sides each): clean 0.028–0.041, 17 dB SNR 0.189–0.197, 11 dB
    # 0.252–0.257 (swing doesn't move it).  Threshold 0.22 fires only
    # below ~14 dB SNR — where scale 1.0 starts missing — and leaves
    # 17 dB material (already 16/16 at scale 1.0) on the safe base scale.
    # A SECOND gate protects sustained tonal content (drones/pads), whose
    # floor-to-peak proxy is high because its harmonics ARE its floor:
    # the floor's spectral flatness (gm/am over real bins; measured:
    # broadband noise 0.93, drone+noise 0.76, clean music 0.20, clean
    # drone 0.05) must also exceed chroma_floor_flat_thresh — only a
    # PERVASIVE elevated floor is noise.  Set chroma_floor_auto=False to
    # pin chroma_floor_scale statically.
    chroma_floor_scale: float = 1.0
    chroma_floor_auto: bool = True
    chroma_floor_scale_noisy: float = 1.5
    chroma_floor_noise_thresh: float = 0.22
    chroma_floor_flat_thresh: float = 0.6

    # ── first-party F0 refinement (sub-semitone; replaces optional MELODIA) ──
    # The reference refines chroma pitch with essentia MELODIA when installed
    # (pitch.py:187-241); this build's equivalent is an on-device
    # harmonic-summation tracker plus a fine log-frequency spectral-shift
    # estimator (ops/f0.py) — both run on the same dual-stream constant-Q
    # front-end at 10-cent resolution.
    compute_pitch_refine: bool = True
    f0_bins_per_octave: int = 120           # 10-cent log-frequency grid
    f0_fmin: float = 82.40688922821748      # E2 — melody F0 range bottom
    f0_max_hz: float = 1174.6590716696303   # D6 — F0 argmax range top
    f0_spec_max_hz: float = 9000.0          # spectrum grid top (harmonics)
    f0_n_fft: int = 4096                    # per-stream frame (dual stream)
    f0_hop: int = 2048
    f0_harmonics: int = 8
    f0_harmonic_decay: float = 0.8          # w_h = decay**(h-1)
    f0_voicing_frac: float = 0.1            # voiced: salience ≥ frac·max
    f0_frame_chunk: int = 128               # frames per scan step
    pitch_refine_max_st: float = 15.0       # spectral-xcorr lag search ±st
    pitch_refine_agree_st: float = 1.5      # MELODIA-style agreement gate
    pitch_refine_min_quality: float = 0.2   # min peak cosine similarity
    # Grid-midpoint coin-flip arbitration (host-side, round 5): when the
    # bootstrap pitch median lands within pitch_midpoint_tol_st (2 cents)
    # of a 1/6-st grid midpoint — an even chunk-vote split, a coin flip by
    # construction (all 12 misses on the 1 k corpus were this case) — and
    # the refined estimate passed its agreement gate, snap pitch_ratio to
    # the grid point nearest the refined shift (adjacent-grid moves only).
    pitch_grid_arbitration: bool = True
    pitch_midpoint_tol_st: float = 0.02

    # ── consensus (reference consensus.py:52-62) ─────────────────────────────
    n_bootstrap: int = 2000
    ci_level: float = 0.95
    pure_nc_tolerance: float = 0.02
    min_valid: int = 3
    nightcore_ratio_min: float = 1.05
    nightcore_ratio_max: float = 1.50
    near_unity_tolerance: float = 0.05
    wide_ci_relative: float = 2.0
    duration_tempo_mismatch_tolerance: float = 0.08

    # ── xcorr verify (reference xcorr.py:33-42) ──────────────────────────────
    xcorr_n_windows: int = 20
    xcorr_window_sec: float = 3.0
    xcorr_search_range: float = 0.05
    xcorr_skip_edges: float = 0.10
    xcorr_rms_gate: float = 1e-3
    xcorr_quality_good: float = 0.70
    xcorr_quality_fair: float = 0.40

    # ── auto-align (reference xcorr.py:44-51) ────────────────────────────────
    align_sr: int = 11025
    align_hop: int = 512
    align_speed_lo: float = 1.03
    align_speed_hi: float = 1.50
    align_n_speeds: int = 30
    align_max_offset: float = 120.0
    align_min_offset: float = 1.0

    # ── memory chunking knobs (device-program internal; no semantic effect) ──
    window_chunk: int = 4                   # analysis windows processed per scan step
    frame_chunk: int = 1024                  # STFT frames per scan step (hop-64 pass)
    tg_frame_chunk: int = 64                # tempogram columns per scan step
    chroma_frame_chunk: int = 256           # chroma frames per scan step

    # ── derived sizes ────────────────────────────────────────────────────────
    @cached_property
    def max_samples(self) -> int:
        return int(round(self.max_duration_sec * self.sample_rate))

    @cached_property
    def win_samples(self) -> int:
        return int(self.window_sec * self.sample_rate)

    @cached_property
    def hop_samples(self) -> int:
        return int(self.hop_sec * self.sample_rate)

    @cached_property
    def n_window_slots(self) -> int:
        if self.max_samples < self.win_samples:
            return 1
        return (self.max_samples - self.win_samples) // self.hop_samples + 1

    @cached_property
    def onset_frames_per_window(self) -> int:
        # centered STFT: 1 + N // hop frames  (librosa convention)
        return 1 + self.win_samples // self.tempo_hop

    @cached_property
    def tempogram_win_length(self) -> int:
        # librosa feature.tempo: win_length = ac_size * sr // hop_length
        return int(self.ac_size * self.sample_rate // self.tempo_hop)

    @cached_property
    def ibi_tempogram_win_length(self) -> int:
        return int(self.ac_size * self.sample_rate // self.ibi_hop)

    @cached_property
    def global_onset_frames(self) -> int:
        return 1 + self.max_samples // self.ibi_hop

    @cached_property
    def chunk_samples(self) -> int:
        return int(self.chunk_sec * self.sample_rate)

    @cached_property
    def max_chunks(self) -> int:
        return max(1, self.max_samples // self.chunk_samples)

    @cached_property
    def chroma_frames_per_chunk(self) -> int:
        return 1 + self.chunk_samples // self.chroma_hop

    @cached_property
    def n_chroma_bins(self) -> int:
        return self.chroma_bins_per_octave * self.chroma_n_octaves

    # ── F0 refinement derived sizes ──────────────────────────────────────────
    @cached_property
    def f0_q(self) -> float:
        return 1.0 / (2.0 ** (1.0 / self.f0_bins_per_octave) - 1.0)

    @cached_property
    def f0_n_spec_bins(self) -> int:
        return int(math.ceil(
            math.log2(self.f0_spec_max_hz / self.f0_fmin) * self.f0_bins_per_octave))

    @cached_property
    def f0_n_low_bins(self) -> int:
        """Bins served by the 4×-decimated stream: the crossover is the lowest
        frequency whose full-Q kernel fits the native-rate frame."""
        f_x = self.f0_q * self.sample_rate / self.f0_n_fft
        n = int(math.ceil(
            math.log2(f_x / self.f0_fmin) * self.f0_bins_per_octave))
        return min(max(n, 1), self.f0_n_spec_bins)

    @cached_property
    def f0_n_f0_bins(self) -> int:
        return int(math.ceil(
            math.log2(self.f0_max_hz / self.f0_fmin) * self.f0_bins_per_octave))

    @cached_property
    def f0_frames(self) -> int:
        return max(1, self.max_samples // self.f0_hop)

    @cached_property
    def dp_search_window(self) -> int:
        """Static width of the DP beat-tracker search window at tempo_hop."""
        p_max = 60.0 * self.sample_rate / (self.tempo_hop * self.dp_bpm_min)
        return int(math.ceil(2.0 * p_max)) + 1

    @cached_property
    def dp_search_window_ibi(self) -> int:
        p_max = 60.0 * self.sample_rate / (self.ibi_hop * self.dp_bpm_min)
        return int(math.ceil(2.0 * p_max)) + 1

    @cached_property
    def align_env_frames(self) -> int:
        # envelope at align_sr / align_hop over the decimated max-length signal
        return 1 + (self.max_samples // 2) // self.align_hop

    @cached_property
    def xcorr_win_samples(self) -> int:
        return int(self.xcorr_window_sec * self.sample_rate)

    def replace(self, **kw) -> "AnalyzerConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = AnalyzerConfig()

#: Duration buckets (seconds).  A pair is analyzed in the smallest bucket that
#: fits both files; each bucket is a separate XLA compilation (cached).  The
#: 900–1800 s tiers cover extended/DJ mixes (the reference analyzes any
#: length, ``io.py:44-55``; a 30 min input is its practical ceiling too —
#: librosa load+CQT at that length); anything beyond the last bucket is
#: truncated WITH an explicit warning (see ``truncation_warning``), never
#: silently.
DURATION_BUCKETS = (30.0, 60.0, 120.0, 180.0, 240.0, 300.0, 420.0, 600.0,
                    900.0, 1200.0, 1800.0, 2700.0)


def config_for_bucket(base_cfg: AnalyzerConfig,
                      bucket_sec: float) -> AnalyzerConfig:
    """Config for a duration bucket: sets ``max_duration_sec`` and scales the
    fixed-capacity global beat buffer — a 30 min mix at 210 BPM carries
    ~6300 beats, and with the default 2048 capacity the backtrace would
    keep only the tail (the IBI medians stay valid but the regression
    estimator's span shrinks).  Capacities are derived uniformly so the
    buffer holds ≥273 BPM over the full bucket (240 s → 1092 beats fits
    2048; 900 s → 4095 fits 4096; 1800 s → 8190 fits 8192; 2700 s → 12285
    fits 16384); a track even faster than that truncates to the newest
    beats, which keeps the medians valid.  Shape-history note (the chosen
    capacity is part of the compiled program's shape, so changing a
    bucket's tier invalidates its compile cache): round 4 moved the 900 s
    bucket 2048 → 4096; round 5 moved 300–600 s 2048 → 4096 (covering
    >273 BPM material at 600 s — round-4 advisor finding) and added the
    2700 s tier.  The committed warm caches (120 s bench, 180/240 s driver
    shapes) all sit in the unchanged ≤240 s tier."""
    kw = {"max_duration_sec": bucket_sec}
    if bucket_sec > 1800.0:
        kw["max_beats"] = 16384
    elif bucket_sec > 900.0:
        kw["max_beats"] = 8192
    elif bucket_sec > 240.0:
        kw["max_beats"] = 4096
    return base_cfg.replace(**kw)


def truncation_warning(duration_sec: float, bucket_sec: float):
    """Warning string when ``duration_sec`` exceeds the analysis bucket, else
    ``None``.  Every entry point (CLI/workflow/GUI via ``analyze_arrays``,
    the batch driver, ``CorpusAnalyzer.analyze_pairs``) attaches this to the
    result so a long tail is never dropped invisibly."""
    if duration_sec <= bucket_sec + 1e-6:
        return None
    return (f"Input is {duration_sec:.1f}s but the analysis covers only the "
            f"first {bucket_sec:.0f}s — {duration_sec - bucket_sec:.1f}s of "
            "audio was NOT analyzed.  Ratios describe the analyzed span "
            "only; if the two files are different edits the duration-based "
            "checks may be unreliable.")


def bucket_for_duration(duration_sec: float, buckets=DURATION_BUCKETS) -> float:
    """Smallest bucket that holds ``duration_sec`` (last bucket if none do)."""
    for b in buckets:
        if duration_sec <= b:
            return b
    return buckets[-1]
