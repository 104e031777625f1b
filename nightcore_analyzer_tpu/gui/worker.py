"""Background analysis worker (reference ``gui/worker.py``).

Runs ``pipeline.run`` on a QThread so the Qt event loop stays live — the
only thread boundary in the app (SURVEY §3.4).  Log lines are forwarded via
a signal; the result (or the exception) is delivered through ``finished``.
"""

from __future__ import annotations

from PyQt6.QtCore import QThread, pyqtSignal


class AnalysisWorker(QThread):
    log_line = pyqtSignal(str)
    finished_result = pyqtSignal(object)       # AnalysisResult | Exception

    def __init__(self, nc_path: str, src_path: str, params: dict,
                 parent=None):
        super().__init__(parent)
        self._nc = nc_path
        self._src = src_path
        self._params = dict(params)

    def run(self) -> None:  # QThread entry
        from ..analyze import pipeline
        try:
            result = pipeline.run(
                self._nc, self._src,
                window_sec=self._params.get("window_sec", 10.0),
                hop_sec=self._params.get("hop_sec", 5.0),
                energy_gate_db=self._params.get("energy_gate_db", -40.0),
                classify_on_ibi=not self._params.get("classify_parity", False),
                log=self.log_line.emit)
            self.finished_result.emit(result)
        except Exception as exc:  # surfaced in the UI, never crashes the loop
            self.finished_result.emit(exc)
