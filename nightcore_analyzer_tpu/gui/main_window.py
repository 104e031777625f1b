"""Main window (reference ``gui/main_window.py``).

Layout mirrors the reference: a splitter with file pickers + three parameter
spinboxes (window / hop / energy gate) + Run button + log pane on the left,
and a tab widget (Results, Histograms) on the right; a menu offers JSON/CSV
export.  Session state (paths, parameters) persists via
:mod:`..session` and is restored on launch; the worker thread is terminated
with a bounded wait on close (reference ``main_window.py:326-331``).
"""

from __future__ import annotations

from pathlib import Path

from PyQt6.QtWidgets import (
    QMainWindow, QWidget, QSplitter, QVBoxLayout, QHBoxLayout, QLabel,
    QLineEdit, QPushButton, QDoubleSpinBox, QCheckBox, QTextEdit, QTabWidget,
    QFileDialog, QMessageBox)
from PyQt6.QtCore import Qt

from .. import export, session
from .worker import AnalysisWorker
from .results_panel import ResultsPanel
from .histograms import HistogramWidget


class MainWindow(QMainWindow):
    def __init__(self):
        super().__init__()
        self.setWindowTitle("Nightcore Analyzer (TPU)")
        self.resize(1100, 700)
        self._worker = None
        self._result = None

        split = QSplitter(Qt.Orientation.Horizontal)
        self.setCentralWidget(split)

        # ── left: inputs + parameters + log ─────────────────────────────────
        left = QWidget()
        ll = QVBoxLayout(left)

        self._nc_edit = self._file_row(ll, "Nightcore file")
        self._src_edit = self._file_row(ll, "Source file")

        params = QHBoxLayout()
        self._win = self._spin(params, "Window (s)", 10.0, 1.0, 60.0)
        self._hop = self._spin(params, "Hop (s)", 5.0, 0.5, 30.0)
        self._gate = self._spin(params, "Gate (dB)", -40.0, -120.0, 0.0)
        ll.addLayout(params)

        # reference-parity classification toggle (default OFF = robust
        # beat-time classification; mirrors the CLI --classify-parity flag)
        self._parity = QCheckBox("Parity classification (reference windowed)")
        self._parity.setToolTip(
            "Classify on the grid-quantized windowed tempo ratio exactly "
            "like the reference (fragile on constant-tempo material). "
            "Unchecked = robust beat-time (IBI) classification.")
        ll.addWidget(self._parity)

        self._run_btn = QPushButton("Run Analysis")
        self._run_btn.clicked.connect(self._run_analysis)
        ll.addWidget(self._run_btn)

        self._log = QTextEdit()
        self._log.setReadOnly(True)
        ll.addWidget(self._log, stretch=1)
        split.addWidget(left)

        # ── right: tabs ─────────────────────────────────────────────────────
        tabs = QTabWidget()
        self._results = ResultsPanel()
        self._hists = HistogramWidget()
        tabs.addTab(self._results, "Results")
        tabs.addTab(self._hists, "Histograms")
        split.addWidget(tabs)
        split.setSizes([420, 680])

        # ── menu: export ────────────────────────────────────────────────────
        filemenu = self.menuBar().addMenu("&File")
        filemenu.addAction("Save JSON…", self._save_json)
        filemenu.addAction("Save CSV…", self._save_csv)
        filemenu.addAction("Quit", self.close)

        self._restore_session()

    # ── widget builders ─────────────────────────────────────────────────────
    def _file_row(self, layout, label):
        row = QHBoxLayout()
        row.addWidget(QLabel(label))
        edit = QLineEdit()
        row.addWidget(edit, stretch=1)
        btn = QPushButton("Browse…")
        btn.clicked.connect(lambda: self._browse(edit))
        row.addWidget(btn)
        layout.addLayout(row)
        return edit

    def _spin(self, layout, label, val, lo, hi):
        layout.addWidget(QLabel(label))
        sb = QDoubleSpinBox()
        sb.setRange(lo, hi)
        sb.setValue(val)
        layout.addWidget(sb)
        return sb

    def _browse(self, edit):
        path, _ = QFileDialog.getOpenFileName(
            self, "Select audio file", "",
            "Audio (*.flac *.wav);;All files (*)")
        if path:
            edit.setText(path)

    # ── session ─────────────────────────────────────────────────────────────
    def _restore_session(self):
        self._nc_edit.setText(session.get("last_nc", ""))
        self._src_edit.setText(session.get("last_src", ""))
        self._win.setValue(session.get("window_sec", 10.0))
        self._hop.setValue(session.get("hop_sec", 5.0))
        self._gate.setValue(session.get("energy_gate_db", -40.0))
        self._parity.setChecked(bool(session.get("classify_parity", False)))

    def _save_session(self):
        session.set_many({
            "last_nc": self._nc_edit.text(),
            "last_src": self._src_edit.text(),
            "window_sec": self._win.value(),
            "hop_sec": self._hop.value(),
            "energy_gate_db": self._gate.value(),
            "classify_parity": self._parity.isChecked(),
        })

    # ── run ─────────────────────────────────────────────────────────────────
    def _run_analysis(self):
        nc, src = self._nc_edit.text().strip(), self._src_edit.text().strip()
        if not (nc and Path(nc).is_file()):
            QMessageBox.warning(self, "Missing file", "Select a nightcore file.")
            return
        if not (src and Path(src).is_file()):
            QMessageBox.warning(self, "Missing file", "Select a source file.")
            return
        self._save_session()
        self._log.clear()
        self._run_btn.setEnabled(False)
        self._worker = AnalysisWorker(nc, src, {
            "window_sec": self._win.value(),
            "hop_sec": self._hop.value(),
            "energy_gate_db": self._gate.value(),
            "classify_parity": self._parity.isChecked()})
        self._worker.log_line.connect(self._log.append)
        self._worker.finished_result.connect(self._on_finished)
        self._worker.start()

    def _on_finished(self, result):
        self._run_btn.setEnabled(True)
        if isinstance(result, Exception):
            QMessageBox.critical(self, "Analysis failed", str(result))
            return
        self._result = result
        self._results.update_result(result)
        self._hists.update_result(result)

    # ── export ──────────────────────────────────────────────────────────────
    def _save_json(self):
        if self._result is None:
            return
        path, _ = QFileDialog.getSaveFileName(self, "Save JSON", "",
                                              "JSON (*.json)")
        if path:
            export.export_json(self._result, path)

    def _save_csv(self):
        if self._result is None:
            return
        path, _ = QFileDialog.getSaveFileName(self, "Save CSV", "",
                                              "CSV (*.csv)")
        if path:
            export.export_csv(self._result, path)

    # ── close ───────────────────────────────────────────────────────────────
    def closeEvent(self, event):
        if self._worker is not None and self._worker.isRunning():
            self._worker.terminate()
            self._worker.wait(3000)
        event.accept()
