"""JAX/XLA/Pallas DSP op library — the foundation layer of the TPU build.

Rebuilds the librosa-backed math of the reference (SURVEY §2.2) as
shape-static, jit/vmap-friendly array programs:

========================  ====================================================
module                    reference counterpart
========================  ====================================================
``filters``               librosa filter/window construction (host, numpy)
``spectrum``              STFT / dB conversion cores
``onset``                 ``librosa.onset.onset_strength`` (tempo.py:44,158)
``tempogram``             ``librosa.feature.tempogram``/``tempo`` (tempo.py:58-68)
``beat``                  ``librosa.beat.beat_track`` DP tracker (tempo.py:45,159)
``chroma``                ``librosa.feature.chroma_cqt`` + cyclic xcorr
                          (pitch.py:55-95)
``energy``                ``librosa.effects.trim`` / RMS windows / energy gate
                          (io.py:38-126)
``resample``              ``librosa.resample`` pow-2 decimation (xcorr.py:206)
``stats``                 masked medians + the 2000-resample bootstrap
                          (consensus.py:243-312)
========================  ====================================================
"""

from . import filters, spectrum, stats, onset, tempogram, beat, chroma, energy, resample  # noqa: F401
