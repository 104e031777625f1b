"""Histogram data preparation + matplotlib widget (reference
``gui/histogram_widget.py``).

The data munging (2×2 grid of per-window pitch/tempo histograms with median
lines) is factored out of the Qt widget so it is testable headlessly.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

__all__ = ["histogram_panels", "HistogramWidget"]


def histogram_panels(result) -> List[Tuple[str, np.ndarray, Optional[float]]]:
    """(title, values, median) for each of the four panels: source pitch,
    nightcore pitch, source tempo, nightcore tempo — skipping empties."""
    panels = []
    for title, raw in [
            ("Source pitch (Hz)", result.src_pitches_raw),
            ("Nightcore pitch (Hz)", result.nc_pitches_raw),
            ("Source tempo (BPM)", result.src_tempos_raw),
            ("Nightcore tempo (BPM)", result.nc_tempos_raw)]:
        vals = np.asarray([v for v in (raw or []) if v is not None], float)
        med = float(np.median(vals)) if len(vals) else None
        panels.append((title, vals, med))
    return panels


def histogram_bins(vals: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(counts, edges) with the same bin-count rule both widget backends
    use — headlessly testable."""
    n_bins = min(30, max(5, len(vals) // 2))
    return np.histogram(vals, bins=n_bins)


def _make_pyqtgraph_widget():
    """pyqtgraph-backed 2×2 histogram grid (the reference lists pyqtgraph
    as its fast-plotting option, requirements.txt:44); None if the package
    is absent."""
    try:
        import pyqtgraph as pg
        from PyQt6.QtWidgets import QWidget, QVBoxLayout
    except Exception:
        return None

    class PgHistogramWidget(QWidget):
        """2×2 per-window estimate histograms (pyqtgraph backend)."""

        def __init__(self, parent=None):
            super().__init__(parent)
            self._glw = pg.GraphicsLayoutWidget()
            lay = QVBoxLayout(self)
            lay.addWidget(self._glw)

        def update_result(self, result) -> None:
            self._glw.clear()
            for i, (title, vals, med) in enumerate(histogram_panels(result)):
                plot = self._glw.addPlot(row=i // 2, col=i % 2, title=title)
                if len(vals):
                    counts, edges = histogram_bins(vals)
                    width = (edges[1] - edges[0]) * 0.9 if len(edges) > 1 else 1.0
                    plot.addItem(pg.BarGraphItem(
                        x=(edges[:-1] + edges[1:]) / 2.0, height=counts,
                        width=width, brush="#4d7dd6"))
                    if med is not None:
                        plot.addItem(pg.InfiniteLine(
                            pos=med, angle=90,
                            pen=pg.mkPen("#d64d4d", style=2, width=1.5),
                            label=f"median {med:.2f}",
                            labelOpts={"position": 0.9}))
                else:
                    t = pg.TextItem("no data", color="gray")
                    plot.addItem(t)

    return PgHistogramWidget


try:
    from PyQt6.QtWidgets import QWidget, QVBoxLayout
    from matplotlib.backends.backend_qtagg import FigureCanvasQTAgg
    from matplotlib.figure import Figure

    class HistogramWidget(QWidget):
        """2×2 per-window estimate histograms with median markers."""

        def __init__(self, parent=None):
            super().__init__(parent)
            self._fig = Figure(figsize=(6, 5))
            self._canvas = FigureCanvasQTAgg(self._fig)
            lay = QVBoxLayout(self)
            lay.addWidget(self._canvas)

        def update_result(self, result) -> None:
            self._fig.clear()
            for i, (title, vals, med) in enumerate(histogram_panels(result)):
                ax = self._fig.add_subplot(2, 2, i + 1)
                ax.set_title(title, fontsize=9)
                if len(vals):
                    ax.hist(vals, bins=min(30, max(5, len(vals) // 2)),
                            color="#4d7dd6", edgecolor="black", linewidth=0.3)
                    if med is not None:
                        ax.axvline(med, color="#d64d4d", linestyle="--",
                                   linewidth=1.2, label=f"median {med:.2f}")
                        ax.legend(fontsize=7)
                else:
                    ax.text(0.5, 0.5, "no data", ha="center", va="center",
                            transform=ax.transAxes, color="gray")
            self._fig.tight_layout()
            self._canvas.draw_idle()

    # pyqtgraph is preferred when installed (faster redraws, stays
    # interactive during long runs); matplotlib remains the fallback
    _pg_widget = _make_pyqtgraph_widget()
    if _pg_widget is not None:
        HistogramWidget = _pg_widget  # type: ignore[misc]

except Exception:  # PyQt6 / Qt backend unavailable — headless environment
    HistogramWidget = _make_pyqtgraph_widget()  # type: ignore[assignment]
