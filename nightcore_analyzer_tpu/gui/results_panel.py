"""Results panel: classification badge, ratios + CIs, warnings, Rubber Band
copy-to-clipboard (reference ``gui/results_panel.py``).

``result_summary_fields`` holds the text/color logic so it is testable
without Qt.
"""

from __future__ import annotations

from typing import List, Tuple

__all__ = ["classification_color", "result_summary_fields", "ResultsPanel"]

_CLASS_COLORS = {
    "pure_nightcore": "#2e7d32",            # green — the classic case
    "independent_pitch_shift": "#f9a825",   # amber — extra processing
    "time_stretch_only": "#1565c0",         # blue — no pitch change
    "ambiguous": "#c62828",                 # red — unclear
}


def classification_color(classification: str) -> str:
    return _CLASS_COLORS.get(classification, "#555555")


def result_summary_fields(result) -> List[Tuple[str, str]]:
    """(label, text) rows for the panel."""
    rows = [
        ("Classification", f"{result.classification}  "
                           f"(mode: {getattr(result, 'classification_mode', 'windowed')})"),
        ("Tempo ratio", f"{result.tempo_ratio:.6f}  "
                        f"[{result.tempo_ci[0]:.6f}, {result.tempo_ci[1]:.6f}]"),
        ("Pitch ratio", f"{result.pitch_ratio:.6f}  "
                        f"[{result.pitch_ci[0]:.6f}, {result.pitch_ci[1]:.6f}]"),
    ]
    if result.ibi_ratio is not None and result.ibi_ci is not None:
        rows.append(("IBI ratio", f"{result.ibi_ratio:.6f}  "
                     f"[{result.ibi_ci[0]:.6f}, {result.ibi_ci[1]:.6f}]"))
    if result.nc_duration and result.src_duration:
        rows.append(("Durations", f"NC {result.nc_duration:.1f}s  /  "
                     f"SRC {result.src_duration:.1f}s"))
    rb = result.rubberband
    if "cli_command" in rb:
        src_label = {"ibi_regression": "IBI regression",
                     "ibi_median": "IBI median",
                     "windowed": "windowed BPM"}.get(
            rb.get("time_source", "windowed"), "?")
        p_label = {"refined": "refined pitch", "chroma_grid": "chroma grid"
                   }.get(rb.get("pitch_source", "chroma_grid"), "?")
        rows.append((f"Rubber Band (best: {src_label} + {p_label})",
                     rb["cli_command"]))
    if rb.get("windowed_cli_command") and \
            rb.get("time_source", "windowed") != "windowed":
        rows.append(("Rubber Band (windowed parity)",
                     rb["windowed_cli_command"]))
    return rows


try:
    from PyQt6.QtWidgets import (QWidget, QVBoxLayout, QGridLayout, QLabel,
                                 QPushButton, QTextEdit, QApplication)

    class ResultsPanel(QWidget):
        def __init__(self, parent=None):
            super().__init__(parent)
            self._lay = QVBoxLayout(self)
            self._badge = QLabel("—")
            self._badge.setStyleSheet(
                "padding: 6px; color: white; background: #555; "
                "border-radius: 4px; font-weight: bold;")
            self._lay.addWidget(self._badge)
            self._grid_host = QWidget()
            self._grid = QGridLayout(self._grid_host)
            self._lay.addWidget(self._grid_host)
            self._warn = QTextEdit()
            self._warn.setReadOnly(True)
            self._warn.setMaximumHeight(120)
            self._lay.addWidget(self._warn)
            self._copy = QPushButton("Copy Rubber Band command")
            self._copy.clicked.connect(self._copy_rb)
            self._lay.addWidget(self._copy)
            self._rb_cmd = ""

        def update_result(self, result) -> None:
            self._badge.setText(result.classification)
            self._badge.setStyleSheet(
                f"padding: 6px; color: white; background: "
                f"{classification_color(result.classification)}; "
                "border-radius: 4px; font-weight: bold;")
            while self._grid.count():
                item = self._grid.takeAt(0)
                w = item.widget()
                if w:
                    w.deleteLater()
            for r, (label, text) in enumerate(result_summary_fields(result)):
                self._grid.addWidget(QLabel(f"<b>{label}</b>"), r, 0)
                self._grid.addWidget(QLabel(text), r, 1)
            self._warn.setPlainText("\n".join(result.warnings)
                                    if result.warnings else "No warnings.")
            self._rb_cmd = result.rubberband.get("cli_command", "")

        def _copy_rb(self) -> None:
            if self._rb_cmd:
                QApplication.clipboard().setText(self._rb_cmd)

except Exception:  # headless
    ResultsPanel = None  # type: ignore[assignment,misc]
