"""Headless-testable GUI logic (Qt-free parts of the gui package)."""

from nightcore_analyzer_tpu.gui import qt_available
from nightcore_analyzer_tpu.gui.histograms import histogram_panels
from nightcore_analyzer_tpu.gui.results_panel import (classification_color,
                                                      result_summary_fields)
from nightcore_analyzer_tpu.analyze.result import AnalysisResult


def _result():
    return AnalysisResult(
        tempo_ratio=1.25, pitch_ratio=1.26,
        tempo_ci=(1.24, 1.26), pitch_ci=(1.25, 1.27),
        classification="pure_nightcore",
        n_source_pitch_windows=4, n_nc_pitch_windows=4,
        n_source_tempo_windows=10, n_nc_tempo_windows=8,
        rubberband={"cli_command": "rubberband --time 1.25 …"},
        src_pitches_raw=[440.0] * 4,
        nc_pitches_raw=[554.4, 554.4, None, 550.0],
        src_tempos_raw=[128.0, None, 129.0],
        nc_tempos_raw=[160.0, 161.0],
        nc_duration=80.0, src_duration=100.0,
        ibi_ratio=1.2502, ibi_ci=(1.2498, 1.2506))


def test_histogram_panels():
    panels = histogram_panels(_result())
    assert len(panels) == 4
    titles = [p[0] for p in panels]
    assert "Source pitch (Hz)" in titles[0]
    # None entries filtered; medians computed
    assert len(panels[1][1]) == 3
    assert panels[2][2] == 128.5


def test_classification_colors_distinct():
    colors = {classification_color(c) for c in
              ["pure_nightcore", "independent_pitch_shift",
               "time_stretch_only", "ambiguous"]}
    assert len(colors) == 4
    assert classification_color("unknown") == "#555555"


def test_result_summary_fields():
    rows = dict(result_summary_fields(_result()))
    assert rows["Classification"].startswith("pure_nightcore")
    assert "mode:" in rows["Classification"]
    assert "1.250000" in rows["Tempo ratio"]
    assert "IBI ratio" in rows
    rb_rows = [k for k in rows if k.startswith("Rubber Band")]
    assert rb_rows and "windowed BPM" in rb_rows[0]   # provenance labeled

    # best-estimate provenance + windowed parity row (round 5)
    r2 = _result()
    r2.rubberband = {
        "cli_command": "rubberband --time 1.249970 --pitch -3.8660 …",
        "time_source": "ibi_regression", "pitch_source": "refined",
        "windowed_time_ratio": 1.25, "windowed_pitch_semitones": -3.9,
        "windowed_cli_command": "rubberband --time 1.250000 …"}
    rows2 = dict(result_summary_fields(r2))
    best = [k for k in rows2 if k.startswith("Rubber Band (best")]
    assert best and "IBI regression" in best[0] and "refined" in best[0]
    assert "Rubber Band (windowed parity)" in rows2


def test_qt_gating_consistent():
    # in this image PyQt6 is absent; the package must degrade, not crash
    avail = qt_available()
    from nightcore_analyzer_tpu.gui import histograms, results_panel
    if not avail:
        assert histograms.HistogramWidget is None
        assert results_panel.ResultsPanel is None


def test_main_headless_fallback(capsys):
    if qt_available():
        return
    from nightcore_analyzer_tpu.__main__ import main
    assert main() == 1
    err = capsys.readouterr().err
    assert "PyQt6" in err and "cli" in err
