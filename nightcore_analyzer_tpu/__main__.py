"""``python -m nightcore_analyzer_tpu`` — launch the GUI, with the same
headless-fallback guidance as the reference (``__main__.py:11-39``)."""

from __future__ import annotations

import sys


def main() -> int:
    from .gui import qt_available, launch

    if not qt_available():
        print(
            "The GUI requires PyQt6, which is not available in this "
            "environment.\n\n"
            "Alternatives:\n"
            "  CLI:       python -m nightcore_analyzer_tpu.cli "
            "--nightcore NC.flac --source SRC.flac\n"
            "  Workflow:  python -m nightcore_analyzer_tpu.workflow\n"
            "  Python:    from nightcore_analyzer_tpu import run\n",
            file=sys.stderr)
        return 1
    return launch()


if __name__ == "__main__":
    sys.exit(main())
