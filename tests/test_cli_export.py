"""CLI glue (validation, JSON schema, exit codes) and export formats."""

import csv
import json

import pytest

from nightcore_analyzer_tpu import cli, export, session
from nightcore_analyzer_tpu.analyze.result import AnalysisResult


def _fake_result():
    return AnalysisResult(
        tempo_ratio=1.25, pitch_ratio=1.26,
        tempo_ci=(1.24, 1.26), pitch_ci=(1.25, 1.27),
        classification="pure_nightcore",
        n_source_pitch_windows=5, n_nc_pitch_windows=5,
        n_source_tempo_windows=12, n_nc_tempo_windows=10,
        rubberband={"time_ratio": 1.25, "pitch_semitones": -3.8631,
                    "nc_to_source_speed": 0.8, "cli_command": "rubberband …"},
        nc_duration=80.0, src_duration=100.0,
        nc_median_bpm=160.0, src_median_bpm=128.0,
        warnings=["test warning"], pitch_method="chroma_xcorr",
        ibi_ratio=1.2501, ibi_ci=(1.2497, 1.2505))


def test_cli_missing_files(tmp_path, capsys):
    rc = cli.main(["-n", str(tmp_path / "a.flac"), "-s", str(tmp_path / "b.flac")])
    assert rc == 2
    assert "not found" in capsys.readouterr().err


def test_cli_hop_validation(tmp_path, capsys):
    a = tmp_path / "a.flac"
    b = tmp_path / "b.flac"
    a.write_bytes(b"x")
    b.write_bytes(b"x")
    rc = cli.main(["-n", str(a), "-s", str(b), "--hop", "10", "--window", "10"])
    assert rc == 2
    assert "--hop" in capsys.readouterr().err


def test_cli_success_path(tmp_path, monkeypatch, capsys):
    a = tmp_path / "a.flac"
    b = tmp_path / "b.flac"
    a.write_bytes(b"x")
    b.write_bytes(b"x")
    from nightcore_analyzer_tpu.analyze import pipeline
    monkeypatch.setattr(pipeline, "run", lambda *args, **kw: _fake_result())
    out = tmp_path / "out.json"
    rc = cli.main(["-n", str(a), "-s", str(b), "-o", str(out), "-q"])
    assert rc == 0
    d = json.loads(out.read_text())
    assert d["classification"] == "pure_nightcore"
    assert d["tempo_ratio"] == 1.25
    assert d["windows_used"]["source_tempo"] == 12
    assert d["rubberband"]["time_ratio"] == 1.25


def test_cli_default_is_robust_classification(tmp_path, monkeypatch):
    """The robust beat-time (IBI) classification is the DEFAULT; the parity
    flag restores the reference's windowed path (round-4 flip)."""
    a = tmp_path / "a.flac"
    b = tmp_path / "b.flac"
    a.write_bytes(b"x")
    b.write_bytes(b"x")
    from nightcore_analyzer_tpu.analyze import pipeline
    seen = {}

    def fake_run(*args, **kw):
        seen.update(kw)
        r = _fake_result()
        r.classification_mode = "ibi" if kw["classify_on_ibi"] else "windowed"
        return r

    monkeypatch.setattr(pipeline, "run", fake_run)
    out = tmp_path / "out.json"
    rc = cli.main(["-n", str(a), "-s", str(b), "-o", str(out), "-q"])
    assert rc == 0
    assert seen["classify_on_ibi"] is True
    assert json.loads(out.read_text())["classification_mode"] == "ibi"

    rc = cli.main(["-n", str(a), "-s", str(b), "-o", str(out), "-q",
                   "--classify-parity"])
    assert rc == 0
    assert seen["classify_on_ibi"] is False
    assert json.loads(out.read_text())["classification_mode"] == "windowed"

    # the config default itself (covers workflow/GUI paths that pass
    # DEFAULT_CONFIG straight into analyze_arrays)
    from nightcore_analyzer_tpu.config import DEFAULT_CONFIG
    assert DEFAULT_CONFIG.classify_on_ibi is True


def test_exported_command_carries_best_estimators(tmp_path, monkeypatch):
    """Round 5: the default exported rubberband command (the one a scripted
    consumer runs verbatim) must carry the regression/refined numbers, with
    the windowed grid command as the labeled parity field."""
    from test_consensus import _mk_pa
    from nightcore_analyzer_tpu.config import AnalyzerConfig
    from nightcore_analyzer_tpu.analyze.consensus import result_from_pair_analysis

    true_st = 3.8631                       # factor 1.25
    pa = _mk_pa(1.23, 1.30, 1.25, refined_st=true_st)
    r = result_from_pair_analysis(pa, AnalyzerConfig(max_duration_sec=120.0))
    d = export.to_dict(r)
    rb = d["rubberband"]
    assert rb["time_source"] == "ibi_regression"
    assert rb["time_ratio"] == pytest.approx(d["ibi_regression_ratio"],
                                             abs=1e-6)
    assert rb["pitch_source"] == "refined"
    assert rb["pitch_semitones"] == pytest.approx(-d["pitch_refined_st"],
                                                  abs=1e-3)
    assert f"--time {rb['time_ratio']:.6f}" in rb["cli_command"]
    assert rb["windowed_time_ratio"] == pytest.approx(1.30, abs=1e-6)
    # CSV carries the same labels
    p = tmp_path / "r.csv"
    export.export_csv(r, p)
    row = list(csv.DictReader(open(p)))[0]
    assert row["rb_time_source"] == "ibi_regression"
    assert row["rb_pitch_source"] == "refined"
    assert row["rb_windowed_cli_command"]


def test_cli_analysis_error_exit_1(tmp_path, monkeypatch, capsys):
    a = tmp_path / "a.flac"
    b = tmp_path / "b.flac"
    a.write_bytes(b"x")
    b.write_bytes(b"x")
    from nightcore_analyzer_tpu.analyze import pipeline

    def boom(*args, **kw):
        raise RuntimeError("all windows gated")
    monkeypatch.setattr(pipeline, "run", boom)
    rc = cli.main(["-n", str(a), "-s", str(b), "-q"])
    assert rc == 1
    assert "all windows gated" in capsys.readouterr().err


def test_export_json_roundtrip(tmp_path):
    r = _fake_result()
    p = tmp_path / "r.json"
    export.export_json(r, p)
    d = json.loads(p.read_text())
    assert d["tempo_ratio"] == 1.25
    assert d["ibi_ratio"] == 1.2501
    assert d["durations"]["duration_ratio"] == 1.25
    assert d["median_bpms"]["nightcore"] == 160.0
    assert d["warnings"] == ["test warning"]


def test_export_csv_roundtrip(tmp_path):
    r = _fake_result()
    p = tmp_path / "r.csv"
    export.export_csv(r, p)
    rows = list(csv.DictReader(open(p)))
    assert len(rows) == 1
    assert float(rows[0]["tempo_ratio"]) == 1.25
    assert rows[0]["classification"] == "pure_nightcore"
    assert float(rows[0]["rb_time_ratio"]) == 1.25


def test_session_store(tmp_path, monkeypatch):
    monkeypatch.setattr(session, "_SESSION_FILE", tmp_path / "s.json")
    session.set("last_nc", "/x/y.flac")
    session.set_many({"window": 10.0, "hop": 5.0})
    assert session.get("last_nc") == "/x/y.flac"
    assert session.get("window") == 10.0
    assert session.get("missing", 7) == 7
