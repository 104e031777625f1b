"""CPU baseline: a numpy/scipy implementation of the reference pipeline.

The reference's own stack (librosa on CPU) is not installable in this image,
and it publishes no throughput numbers (BASELINE.md), so the baseline must
be *measured* against an equivalent CPU implementation.  This module
re-creates the reference's per-pair serial architecture — per-window
onset/tempo loop (``tempo.py:80-111``), python-loop DP beat tracker (what
``librosa.beat.beat_track`` itself is), hop-64 full-signal pass
(``tempo.py:120-173``), per-chunk chroma (``pitch.py:100-173``), and the
serial 2000-iteration bootstrap loops (``consensus.py:243-312``) — with the
vectorized-numpy inner kernels librosa uses internally.  If anything this
under-states the advantage: librosa's recursive-CQT chroma is slower than
the matmul CQT used here.

Used by ``bench.py`` (vs_baseline) and as a cross-check oracle in tests.
"""

from __future__ import annotations

import numpy as np

from nightcore_analyzer_tpu.ops import filters

SR = 22050


# ── onset strength ───────────────────────────────────────────────────────────

def _frame(y: np.ndarray, frame_length: int, hop: int) -> np.ndarray:
    n_frames = 1 + (len(y) - frame_length) // hop
    shape = (n_frames, frame_length)
    strides = (y.strides[0] * hop, y.strides[0])
    return np.lib.stride_tricks.as_strided(y, shape, strides)


_mel_cache: dict = {}


def onset_strength(y: np.ndarray, sr: int = SR, hop: int = 512,
                   n_fft: int = 2048) -> np.ndarray:
    key = (sr, n_fft)
    if key not in _mel_cache:
        _mel_cache[key] = filters.mel_filterbank(sr, n_fft, 128).T
    mel_T = _mel_cache[key]
    ypad = np.pad(y, (n_fft // 2, n_fft // 2))
    frames = _frame(ypad, n_fft, hop)
    win = filters.hann(n_fft)
    # chunked FFT to bound memory at hop 64
    mels = np.empty((len(frames), 128), np.float32)
    step = 4096
    for i in range(0, len(frames), step):
        spec = np.fft.rfft(frames[i:i + step] * win, axis=-1)
        mels[i:i + step] = (np.abs(spec) ** 2) @ mel_T
    db = 10.0 * np.log10(np.maximum(mels, 1e-10))
    db = np.maximum(db, db.max() - 80.0)
    flux = np.maximum(0.0, db[1:] - db[:-1]).mean(axis=1)
    pad = 1 + n_fft // (2 * hop)
    env = np.concatenate([np.zeros(pad), flux])[:len(frames)]
    return env


# ── tempo (ACF tempogram + log-normal prior) ─────────────────────────────────

def tempo_acf(env: np.ndarray, sr: int = SR, hop: int = 512,
              start_bpm: float = 120.0, stride: int = 1) -> float:
    win_length = int(8.0 * sr // hop)
    half = win_length // 2
    envp = np.pad(env, (half, half + win_length))
    cols = _frame(envp, win_length, stride)[: (len(env) + stride - 1) // stride]
    w = filters.hann(win_length)
    nfft = 1
    while nfft < 2 * win_length:
        nfft *= 2
    acc = np.zeros(win_length)
    step = 512
    for i in range(0, len(cols), step):
        spec = np.fft.rfft(cols[i:i + step] * w, n=nfft, axis=-1)
        ac = np.fft.irfft(np.abs(spec) ** 2, n=nfft, axis=-1)[:, :win_length]
        peak = np.abs(ac).max(axis=1, keepdims=True)
        ac = np.where(peak > 1e-20, ac / np.maximum(peak, 1e-20), 0.0)
        acc += ac.sum(axis=0)
    acf = acc / max(len(cols), 1)
    bpms = filters.tempo_frequencies(win_length, hop, sr)
    prior = filters.log_tempo_prior(bpms, start_bpm, 1.0, 320.0)
    return float(bpms[np.argmax(np.log1p(1e6 * acf) + prior)])


# ── DP beat tracker (python loop — as librosa's own implementation is) ───────

def beat_track(env: np.ndarray, bpm: float, sr: int = SR, hop: int = 512,
               tightness: float = 100.0) -> np.ndarray:
    sd = env.std(ddof=1)
    envn = env / max(sd, 1e-10)
    period = max(1, int(round(60.0 * sr / (hop * bpm))))
    # gaussian local score
    t = np.arange(-period, period + 1)
    win = np.exp(-0.5 * (t * 32.0 / period) ** 2)
    localscore = np.convolve(envn, win, mode="same")

    backlink = np.full(len(localscore), -1, np.int64)
    cumscore = np.zeros(len(localscore))
    prange = np.arange(-2 * period, -int(round(period / 2)) + 1)
    txwt = -tightness * np.log(-prange / period) ** 2
    first_beat = True
    max_ls = localscore.max()
    for i, score_i in enumerate(localscore):
        lo = max(0, i + prange[0])
        z = lo - (i + prange[0])
        cands = txwt[z:] + cumscore[lo:i + prange[-1] + 1] \
            if i + prange[-1] >= 0 else np.empty(0)
        if len(cands):
            k = int(np.argmax(cands))
            cumscore[i] = score_i + cands[k]
            if first_beat and score_i < 0.01 * max_ls:
                backlink[i] = -1
            else:
                backlink[i] = lo + k
                first_beat = False
        else:
            cumscore[i] = score_i

    # pick tail, backtrace
    lmax = np.zeros(len(cumscore), bool)
    lmax[1:-1] = (cumscore[1:-1] > cumscore[:-2]) & (cumscore[1:-1] >= cumscore[2:])
    if not lmax.any():
        return np.empty(0, np.int64)
    med = np.median(cumscore[lmax])
    cand = np.flatnonzero(lmax & (cumscore >= 0.5 * med))
    beats = [int(cand[-1])]
    while backlink[beats[-1]] >= 0:
        beats.append(int(backlink[beats[-1]]))
    beats = np.array(beats[::-1], np.int64)
    # trim
    ls = localscore[beats]
    lsp = np.pad(ls, (1, 1))
    smooth = 0.5 * lsp[:-2] + lsp[1:-1] + 0.5 * lsp[2:]
    thr = 0.5 * np.sqrt(np.mean(smooth ** 2))
    good = np.flatnonzero(smooth > thr)
    if len(good) < 2:
        return beats[:0]
    return beats[good.min():good.max()]


# ── chroma pitch ─────────────────────────────────────────────────────────────

_cqt_cache: dict = {}


def mean_chroma(y: np.ndarray, sr: int = SR) -> np.ndarray:
    import scipy.signal
    if "bases" not in _cqt_cache:
        fmin = 32.70319566257483
        lo = filters.cqt_kernels(sr / 4.0, 4096, fmin, 108, 36)
        hi = filters.cqt_kernels(float(sr), 4096, fmin * 8.0, 144, 36)
        _cqt_cache["bases"] = (lo[0] + 1j * lo[1], hi[0] + 1j * hi[1])
        _cqt_cache["hb"] = filters.halfband_lowpass()
    K_lo, K_hi = _cqt_cache["bases"]
    hb = _cqt_cache["hb"]
    y4 = scipy.signal.lfilter(hb, [1.0], np.pad(y, (0, len(hb))))[len(hb) // 2:][::2]
    y4 = scipy.signal.lfilter(hb, [1.0], np.pad(y4, (0, len(hb))))[len(hb) // 2:][::2]
    win = filters.hann(4096)
    fr_hi = _frame(np.pad(y, (2048, 2048)), 4096, 512)
    fr_lo = _frame(np.pad(y4, (2048, 2048)), 4096, 128)
    n = min(len(fr_hi), len(fr_lo))
    chroma_sum = np.zeros(36)
    step = 256
    for i in range(0, n, step):
        s_hi = np.fft.rfft(fr_hi[i:i + step] * win, axis=-1)
        s_lo = np.fft.rfft(fr_lo[i:i + step] * win, axis=-1)
        cq = np.concatenate([np.abs(s_lo @ K_lo.T), np.abs(s_hi @ K_hi.T)], axis=1)
        ch = cq.reshape(-1, 7, 36).sum(axis=1)
        peak = ch.max(axis=1, keepdims=True)
        ch = np.where(peak > 1e-12, ch / np.maximum(peak, 1e-12), 0.0)
        chroma_sum += ch.sum(axis=0)
    return chroma_sum / max(n, 1)


def chroma_shift_st(src_chunk: np.ndarray, nc_chunk: np.ndarray,
                    sr: int = SR) -> float:
    cs, cn = mean_chroma(src_chunk, sr), mean_chroma(nc_chunk, sr)
    xc = np.array([np.dot(cs, np.roll(cn, -k)) for k in range(36)])
    lag = int(np.argmax(xc))
    if lag > 18:
        lag -= 36
    return lag / 3.0


# ── bootstrap (serial loop, as in the reference) ─────────────────────────────

def bootstrap_ratio(nc_vals, src_vals, n_boot=2000, seed=42):
    rng = np.random.default_rng(seed)
    nc_vals = np.asarray(nc_vals, float)
    src_vals = np.asarray(src_vals, float)
    point = float(np.median(nc_vals) / np.median(src_vals))
    boot = np.empty(n_boot)
    for i in range(n_boot):
        boot[i] = (np.median(rng.choice(nc_vals, size=len(nc_vals))) /
                   np.median(rng.choice(src_vals, size=len(src_vals))))
    return point, (float(np.percentile(boot, 2.5)),
                   float(np.percentile(boot, 97.5)))


# ── full per-pair pipeline ───────────────────────────────────────────────────

def analyze_pair_cpu(nc: np.ndarray, src: np.ndarray, sr: int = SR,
                     compute_pitch: bool = True) -> dict:
    """Serial CPU analysis of one pair; returns the core ratio dict."""
    win_n, hop_n = int(10.0 * sr), int(5.0 * sr)

    def windows(y):
        out = []
        start = 0
        while start + win_n <= len(y):
            out.append(y[start:start + win_n])
            start += hop_n
        return out

    def window_tempos(wins, start_bpm):
        vals = []
        for w in wins:
            env = onset_strength(w, sr, 512)
            bpm = tempo_acf(env, sr, 512, start_bpm)
            beats = beat_track(env, bpm, sr, 512)
            vals.append(bpm if len(beats) >= 4 else None)
        return [v for v in vals if v is not None]

    src_w, nc_w = windows(src), windows(nc)
    src_t = window_tempos(src_w, 120.0)
    prior = (float(np.median(src_t)) * (len(src) / len(nc))
             if src_t else 120.0)
    nc_t = window_tempos(nc_w, prior)

    tempo_ratio, tempo_ci = bootstrap_ratio(nc_t, src_t) \
        if len(src_t) >= 3 and len(nc_t) >= 3 else (float("nan"), (0, 0))

    # pitch chunks
    pitch_st = None
    if compute_pitch:
        chunk_n = int(20.0 * sr)
        n_chunks = min(len(src) // chunk_n, len(nc) // chunk_n)
        shifts = [chroma_shift_st(src[i * chunk_n:(i + 1) * chunk_n],
                                  nc[i * chunk_n:(i + 1) * chunk_n], sr)
                  for i in range(max(n_chunks, 1))] if n_chunks >= 1 else \
            [chroma_shift_st(src, nc, sr)]
        pitch_st = float(np.median(shifts))

    # hop-64 IBI pass
    def ibis(y, start_bpm):
        env = onset_strength(y, sr, 64)
        bpm = tempo_acf(env, sr, 64, start_bpm, stride=16)
        beats = beat_track(env, bpm, sr, 64)
        if len(beats) < 5:
            return None
        ib = np.diff(beats * 64.0 / sr)
        ib = ib[ib > 0.05]
        return ib if len(ib) >= 4 else None

    src_ib = ibis(src, 120.0)
    nc_ib = ibis(nc, prior)
    if src_ib is not None and nc_ib is not None:
        ibi_ratio, ibi_ci = bootstrap_ratio(src_ib, nc_ib)
    else:
        ibi_ratio, ibi_ci = None, None

    return {"tempo_ratio": tempo_ratio, "tempo_ci": tempo_ci,
            "pitch_st": pitch_st, "ibi_ratio": ibi_ratio, "ibi_ci": ibi_ci}
