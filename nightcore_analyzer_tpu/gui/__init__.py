"""PyQt6 GUI for the TPU analyzer (reference ``gui/``).

Import is gated: :func:`qt_available` reports whether PyQt6 can load, and
``__main__`` prints the same style of headless-fallback guidance as the
reference when it cannot (``__main__.py:11-39``).
"""

from __future__ import annotations

__all__ = ["qt_available", "launch"]


def qt_available() -> bool:
    try:
        import PyQt6  # noqa: F401
        return True
    except Exception:
        return False


def launch(argv=None) -> int:
    """Start the GUI event loop (requires PyQt6 + a display)."""
    from PyQt6.QtWidgets import QApplication
    from .main_window import MainWindow
    import sys

    app = QApplication(argv if argv is not None else sys.argv)
    win = MainWindow()
    win.show()
    return app.exec()
