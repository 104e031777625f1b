"""MXU-resident real FFT: two-stage Cooley–Tukey as dense matmuls.

XLA's TPU ``rfft`` runs on the VPU at ~0.5 TFLOP/s effective and dominates
the STFT-heavy paths (hop-64 onset pass, window spectrograms, chroma).
Factoring the DFT as N = N2·N1 (radix blocks of 16 and 128) turns it into a
16-point matmul, a twiddle multiply, and a 128×128 matmul — bf16 MXU work
with f32 accumulation at ~20× the arithmetic but ~100× the throughput.

Accuracy: bf16 products with f32 accumulation give ~3e-3 relative spectrum
error — ≈0.03 dB, far below the musical contrasts the analyzer measures
(onset flux, chroma peak picking, band energies).  Callers that need exact
parity (tests) use ``jnp.fft.rfft``; ``use_mxu`` is auto-gated to TPU.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rfft_mxu", "rfft_auto"]


@lru_cache(maxsize=8)
def _factors(n: int):
    assert n % 2048 == 0 or n in (512, 1024, 2048, 4096, 8192), n
    n1 = 128
    n2 = n // n1
    k2g, n2g = np.meshgrid(np.arange(n2), np.arange(n2), indexing="ij")
    F2 = np.exp(-2j * np.pi * n2g * k2g / n2)            # (k2, n2)
    n1g, k1g = np.meshgrid(np.arange(n1), np.arange(n1), indexing="ij")
    F1 = np.exp(-2j * np.pi * n1g * k1g / n1)            # (n1, k1)
    tw_n1, tw_k2 = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    T = np.exp(-2j * np.pi * tw_n1 * tw_k2 / n)          # (n1, k2)
    bf = np.float32
    return (n1, n2,
            F2.real.astype(bf), F2.imag.astype(bf),
            F1.real.astype(bf), F1.imag.astype(bf),
            T.real.astype(bf), T.imag.astype(bf))


def _mm(a, b, dtype):
    if dtype == jnp.float32:
        return jnp.matmul(a, b, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    return jnp.matmul(a.astype(dtype), b.astype(dtype),
                      preferred_element_type=jnp.float32)


def rfft_mxu(x: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """rfft over the last axis (length 1024/2048/4096/8192) via MXU matmuls.
    Returns complex64 (..., n//2 + 1).

    ``dtype=jnp.bfloat16`` (default): ~1.6× faster than XLA's VPU FFT with a
    spectrum noise floor ≈ −50 dB of the frame peak — far below the musical
    contrasts the analyzer thresholds on (onset flux peaks, 36-bin chroma
    argmax, 10 %-band comparisons).  ``dtype=jnp.float32`` runs the matmuls
    at HIGHEST precision (exact to ~1e-7) at ~3× the cost.
    """
    n = x.shape[-1]
    n1, n2, F2r, F2i, F1r, F1i, Tr, Ti = _factors(n)
    lead = x.shape[:-1]

    # n = n1_idx + n1 * n2_idx  →  reshape (..., n2, n1) → (..., n1, n2)
    x2 = jnp.swapaxes(x.reshape(lead + (n2, n1)), -1, -2)

    # stage 1: DFT-n2 → Y (..., n1, k2)
    yr = _mm(x2, jnp.asarray(F2r.T), dtype)
    yi = _mm(x2, jnp.asarray(F2i.T), dtype)

    # twiddle (n1, k2)
    zr = yr * Tr - yi * Ti
    zi = yr * Ti + yi * Tr

    # stage 2: DFT-n1 over n1 → X (..., k1, k2)
    Xr = _mm(zr.swapaxes(-1, -2), F1r, dtype) - _mm(zi.swapaxes(-1, -2), F1i, dtype)
    Xi = _mm(zr.swapaxes(-1, -2), F1i, dtype) + _mm(zi.swapaxes(-1, -2), F1r, dtype)
    # (..., k2, k1) → flat k = k2 + n2*k1  →  transpose to (k1, k2) then flat
    Xr = jnp.swapaxes(Xr, -1, -2).reshape(lead + (n,))
    Xi = jnp.swapaxes(Xi, -1, -2).reshape(lead + (n,))
    return jax.lax.complex(Xr[..., :n // 2 + 1], Xi[..., :n // 2 + 1])


def _use_mxu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def rfft_auto(x: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """MXU rfft on TPU; exact ``jnp.fft.rfft`` elsewhere."""
    if _use_mxu() and x.shape[-1] in (512, 1024, 2048, 4096, 8192):
        return rfft_mxu(x, dtype)
    return jnp.fft.rfft(x, axis=-1)
