"""ctypes bindings + on-demand build of the native audio runtime.

The shared library (``libnativeaudio.so``) is compiled from
``src/nativeaudio.cpp`` with g++ on first use and cached next to the source.
It provides the host-side replacements for the reference's foreign L1
runtimes (SURVEY §2.2): FLAC/WAV decode, FLAC/WAV encode, arbitrary-ratio
polyphase resampling, and peak scan.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["decode_audio", "decode_native", "decode_native_peak",
           "decode_oracle", "resample", "encode_wav", "encode_flac",
           "encode_lossy", "has_lossy_codecs", "probe_duration", "peak_dbfs", "lib",
           "NativeAudioError"]

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "src" / "nativeaudio.cpp"
_SO = _DIR / "libnativeaudio.so"
_ABI_VERSION = 12

_lock = threading.Lock()
_lib = None


class NativeAudioError(RuntimeError):
    pass


def _build() -> None:
    # Generic -O3 (no -march=native: the cached .so must stay portable across
    # hosts — round-1 advisor finding). Lossy-format support (MP3/AAC/OGG via
    # the system libav*, the reference's own decode path through audioread →
    # ffmpeg) is compiled in when headers + libs are present; the first-party
    # FLAC/WAV codec never depends on it.
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC),
            "-o", str(_SO)]
    libav = base[:-2] + ["-DNA_HAVE_LIBAV=1", "-lavformat", "-lavcodec",
                         "-lavutil", "-o", str(_SO)]
    proc = subprocess.run(libav, capture_output=True, text=True)
    if proc.returncode == 0:
        return
    proc = subprocess.run(base, capture_output=True, text=True)
    if proc.returncode != 0:
        raise NativeAudioError(
            f"native audio build failed:\n{proc.stderr[-4000:]}")


def lib() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        need_build = not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime
        if not need_build:
            try:
                cand = ctypes.CDLL(str(_SO))
                if cand.na_version() != _ABI_VERSION:
                    need_build = True
                else:
                    _lib = _bind(cand)
                    return _lib
            except OSError:
                need_build = True
        if need_build:
            _build()
        _lib = _bind(ctypes.CDLL(str(_SO)))
        return _lib


def _bind(L: ctypes.CDLL) -> ctypes.CDLL:
    L.na_last_error.restype = ctypes.c_char_p
    L.na_decode.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int)]
    L.na_decode_resampled.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int)]
    L.na_resample.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                              ctypes.c_int, ctypes.c_int,
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                              ctypes.POINTER(ctypes.c_long)]
    L.na_decode_peak.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double)]
    L.na_encode_wav.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                ctypes.c_long, ctypes.c_int, ctypes.c_int]
    L.na_encode_lossy.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_long, ctypes.c_int, ctypes.c_char_p,
                                  ctypes.c_int]
    L.na_decode_oracle.argtypes = L.na_decode.argtypes
    L.na_probe_duration.argtypes = [ctypes.c_char_p]
    L.na_probe_duration.restype = ctypes.c_double
    L.na_encode_flac.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_long, ctypes.c_int]
    L.na_peak_dbfs.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    L.na_peak_dbfs.restype = ctypes.c_double
    L.na_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    return L


def _err(L) -> str:
    return L.na_last_error().decode("utf-8", "replace")


def _take(L, ptr, n) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(n.value,)).copy()
    L.na_free(ptr)
    return arr


def decode_native(path: str) -> tuple[np.ndarray, int]:
    """Decode to mono float32 at the file's native sample rate."""
    L = lib()
    ptr = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long()
    sr = ctypes.c_int()
    if L.na_decode(path.encode(), ctypes.byref(ptr), ctypes.byref(n),
                   ctypes.byref(sr)):
        raise NativeAudioError(f"{path}: {_err(L)}")
    return _take(L, ptr, n), sr.value


def decode_native_peak(path: str) -> tuple[np.ndarray, int, float]:
    """Decode to mono float32 at native rate, also returning the
    pre-mixdown per-channel absolute peak (linear, for clipping checks —
    ``|mean(L,R)| <= max(|L|,|R|)`` so the mono mixdown systematically
    under-detects stereo clipping; reference loudness.py:40-65)."""
    L = lib()
    ptr = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long()
    sr = ctypes.c_int()
    pk = ctypes.c_double()
    if L.na_decode_peak(path.encode(), ctypes.byref(ptr), ctypes.byref(n),
                        ctypes.byref(sr), ctypes.byref(pk)):
        raise NativeAudioError(f"{path}: {_err(L)}")
    return _take(L, ptr, n), sr.value, pk.value


def decode_oracle(path: str) -> tuple[np.ndarray, int]:
    """Decode via the system libav* regardless of container — the
    conformance oracle against which the first-party codec is tested."""
    L = lib()
    ptr = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long()
    sr = ctypes.c_int()
    if L.na_decode_oracle(path.encode(), ctypes.byref(ptr), ctypes.byref(n),
                          ctypes.byref(sr)):
        raise NativeAudioError(f"{path}: {_err(L)}")
    return _take(L, ptr, n), sr.value


def probe_duration(path: str) -> float:
    """Duration in seconds from container headers only (no decode).
    Raises on unreadable/unsupported files."""
    L = lib()
    d = float(L.na_probe_duration(path.encode()))
    if d < 0:
        raise NativeAudioError(f"{path}: {_err(L)}")
    return d


def has_lossy_codecs() -> bool:
    """True when MP3/AAC/OGG/M4A decode (system libav*) is compiled in."""
    return bool(lib().na_has_libav())


def encode_lossy(path: str, x: np.ndarray, sr: int, codec: str = "",
                 bitrate: int = 160_000) -> None:
    """Encode mono float32 to a lossy container (extension-inferred:
    .mp3/.ogg/.m4a/.aac). ``codec`` optionally forces an encoder name."""
    L = lib()
    x = np.ascontiguousarray(x, np.float32)
    if L.na_encode_lossy(path.encode(), x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         len(x), int(sr), codec.encode(), int(bitrate)):
        raise NativeAudioError(f"{path}: {_err(L)}")


def decode_audio(path: str, target_sr: int = 22050) -> np.ndarray:
    """Decode + resample to ``target_sr`` mono float32 (one native call)."""
    L = lib()
    ptr = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long()
    sr = ctypes.c_int()
    if L.na_decode_resampled(path.encode(), int(target_sr), ctypes.byref(ptr),
                             ctypes.byref(n), ctypes.byref(sr)):
        raise NativeAudioError(f"{path}: {_err(L)}")
    return _take(L, ptr, n)


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    L = lib()
    x = np.ascontiguousarray(x, np.float32)
    ptr = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long()
    if L.na_resample(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     len(x), int(sr_in), int(sr_out),
                     ctypes.byref(ptr), ctypes.byref(n)):
        raise NativeAudioError(_err(L))
    return _take(L, ptr, n)


def encode_wav(path: str, x: np.ndarray, sr: int, bits: int = 16) -> None:
    L = lib()
    x = np.ascontiguousarray(x, np.float32)
    if L.na_encode_wav(path.encode(), x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       len(x), int(sr), int(bits)):
        raise NativeAudioError(_err(L))


def encode_flac(path: str, x: np.ndarray, sr: int) -> None:
    L = lib()
    x = np.ascontiguousarray(x, np.float32)
    if L.na_encode_flac(path.encode(), x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        len(x), int(sr)):
        raise NativeAudioError(_err(L))


def peak_dbfs(x: np.ndarray) -> float:
    L = lib()
    x = np.ascontiguousarray(x, np.float32)
    return float(L.na_peak_dbfs(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x)))
