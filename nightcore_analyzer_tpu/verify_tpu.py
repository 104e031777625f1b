"""Environment verification — the TPU-era ``verify_cuda.py`` (reference C16).

The reference's script probes its CUDA/TensorFlow legacy stack plus every
pip dependency (``verify_cuda.py``, 11 sections).  This build's equivalent
checks what the TPU analyzer actually needs:

  1.  Python ≥ 3.10
  2.  numpy / scipy
  3.  JAX import + version
  4.  accelerator devices (TPU; CPU counts as degraded-OK)
  5.  device matmul smoke test
  6.  Pallas kernel smoke test (the beat-DP kernel path)
  7.  native audio runtime build (C++ codec: FLAC round-trip in a temp dir)
  8.  polyphase resampler sanity
  9.  optional external tools (sox / rubberband / ffmpeg — the workflow
      prefers them when present; first-party fallbacks otherwise)
  10. GUI stack (PyQt6 + matplotlib — optional)

Run:  python -m nightcore_analyzer_tpu.verify_tpu
Exit code 0 when every required section passes.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

_results: list[tuple[str, bool, bool, str]] = []   # (name, ok, required, note)


def _check(name: str, fn, required: bool = True) -> None:
    try:
        note = fn() or ""
        _results.append((name, True, required, str(note)))
        print(f"  [PASS] {name}" + (f" — {note}" if note else ""))
    except Exception as exc:
        _results.append((name, False, required, str(exc)))
        tag = "FAIL" if required else "SKIP"
        print(f"  [{tag}] {name} — {exc}")


def main() -> int:
    print("nightcore_analyzer_tpu — environment verification")
    print("=" * 57)

    def py():
        if sys.version_info < (3, 10):
            raise RuntimeError(f"need Python ≥ 3.10, have {sys.version.split()[0]}")
        return sys.version.split()[0]
    _check("Python ≥ 3.10", py)

    def np_scipy():
        import numpy
        import scipy
        return f"numpy {numpy.__version__}, scipy {scipy.__version__}"
    _check("numpy / scipy", np_scipy)

    def jax_import():
        import jax
        return f"jax {jax.__version__}"
    _check("JAX import", jax_import)

    def devices():
        import jax
        devs = jax.devices()
        kinds = {d.platform for d in devs}
        note = f"{len(devs)} device(s): {', '.join(str(d) for d in devs[:4])}"
        if "tpu" not in kinds:
            note += "  (no TPU — running on CPU/degraded)"
        return note
    _check("accelerator devices", devices)

    def matmul():
        import jax
        import jax.numpy as jnp
        a = jnp.ones((512, 512), jnp.bfloat16)
        out = float(jnp.sum(jnp.matmul(a, a, preferred_element_type=jnp.float32)))
        if abs(out - 512 ** 3) > 1e3:
            raise RuntimeError(f"matmul result off: {out}")
        return "512³ bf16 matmul OK"
    _check("device matmul smoke test", matmul)

    def pallas():
        import jax
        if jax.default_backend() != "tpu":
            raise RuntimeError("no TPU backend — Pallas path unused (scan fallback active)")
        import numpy as np
        import jax.numpy as jnp
        from .ops.pallas.beatdp import dp_forward
        ls = jnp.asarray(np.abs(np.random.default_rng(0).normal(
            size=(2, 512))).astype(np.float32))
        cum, bl = dp_forward(ls, jnp.asarray([40.0, 40.0]),
                             0.01 * jnp.max(ls, axis=-1), tightness=100.0,
                             W=96, T=256)
        float(jnp.sum(cum))
        return "beat-DP kernel compiled + ran"
    _check("Pallas kernel smoke test", pallas, required=False)

    def codec():
        import numpy as np
        from . import native
        t = np.arange(22050) / 22050.0
        y = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        with tempfile.TemporaryDirectory() as d:
            p = str(Path(d) / "probe.flac")
            native.encode_flac(p, y, 22050)
            z, sr = native.decode_native(p)
            if sr != 22050 or abs(len(z) - len(y)) > 0:
                raise RuntimeError("FLAC round-trip mismatch")
        return "C++ codec built; FLAC round-trip OK"
    _check("native audio runtime", codec)

    def lossy():
        import numpy as np
        from . import native
        if not native.has_lossy_codecs():
            raise RuntimeError(
                "built without libav* — MP3/AAC/OGG decode unavailable "
                "(FLAC/WAV still fully supported)")
        t = np.arange(22050) / 22050.0
        y = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        with tempfile.TemporaryDirectory() as d:
            p = str(Path(d) / "probe.mp3")
            native.encode_lossy(p, y, 22050, "libmp3lame", 128_000)
            z, sr, _pk = native.decode_native_peak(p)
            if sr != 22050 or abs(len(z) - len(y)) > 4096:
                raise RuntimeError("MP3 round-trip mismatch")
        return "libav* linked; MP3 round-trip OK"
    _check("lossy codecs (MP3/AAC/OGG via libav*)", lossy, required=False)

    def resampler():
        import numpy as np
        from . import native
        t = np.arange(44100) / 44100.0
        y = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
        z = native.resample(y, 44100, 22050)
        if abs(len(z) - 22050) > 2:
            raise RuntimeError(f"length {len(z)} != 22050")
        return "44.1k→22.05k OK"
    _check("polyphase resampler", resampler)

    for tool in ("sox", "rubberband", "ffmpeg"):
        _check(f"external tool: {tool}",
               (lambda t: (lambda: shutil.which(t) or (_ for _ in ()).throw(
                   RuntimeError("not on PATH — first-party fallback will be "
                                "used"))))(tool),
               required=False)

    def gui():
        import PyQt6  # noqa: F401
        import matplotlib
        return f"PyQt6 + matplotlib {matplotlib.__version__}"
    _check("GUI stack (optional)", gui, required=False)

    def pyqtgraph_probe():
        import pyqtgraph
        return f"pyqtgraph {pyqtgraph.__version__} (fast histogram backend)"
    _check("pyqtgraph (optional)", pyqtgraph_probe, required=False)

    print("=" * 57)
    req = [r for r in _results if r[2]]
    passed = sum(1 for r in req if r[1])
    opt_passed = sum(1 for r in _results if not r[2] and r[1])
    opt_total = sum(1 for r in _results if not r[2])
    print(f"required: {passed}/{len(req)} passed   "
          f"optional: {opt_passed}/{opt_total} available")
    ok = passed == len(req)
    print("VERIFICATION " + ("PASSED" if ok else "FAILED"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
