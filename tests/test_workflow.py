"""Interactive workflow: prompt semantics, artefact naming, and the
full-suite state machine (scripted stdin, stubbed analysis)."""

from pathlib import Path

import numpy as np
import pytest

from nightcore_analyzer_tpu import workflow, native
from nightcore_analyzer_tpu.analyze.result import AnalysisResult


def _scripted_input(monkeypatch, answers):
    answers = list(answers)

    def fake_input(prompt=""):
        if not answers:
            raise AssertionError(f"unexpected prompt: {prompt}")
        return answers.pop(0)
    monkeypatch.setattr("builtins.input", fake_input)
    return answers


def test_prompt_choice_default(monkeypatch):
    _scripted_input(monkeypatch, [""])
    assert workflow._prompt_choice("q?", "yne", "n") == "n"


def test_prompt_choice_retries(monkeypatch, capsys):
    _scripted_input(monkeypatch, ["x", "y"])
    assert workflow._prompt_choice("q?", "yne") == "y"


def test_prompt_choice_exit(monkeypatch):
    _scripted_input(monkeypatch, ["e"])
    with pytest.raises(SystemExit):
        workflow._prompt_choice("q?", "yne")


def test_artefact_paths():
    hq = Path("/x/Song.flac")
    assert workflow._hqnc_path(hq).name == "Song [Nightcore].flac"
    assert workflow._hqnc_path(hq, 2).name == "Song [Nightcore] UPD2.flac"
    assert workflow._ps_path(hq, 1).name == "Song PS1.flac"


def test_quality_label():
    assert workflow.quality_label(0.9) == "good match"
    assert workflow.quality_label(0.5) == "moderate match"
    assert "poor match" in workflow.quality_label(0.1)


def _result(tempo=1.25, pitch=1.0, ibi=None, nc_dur=48.0, src_dur=60.0,
            n_pitch=0):
    return AnalysisResult(
        tempo_ratio=tempo, pitch_ratio=pitch,
        tempo_ci=(tempo - 0.002, tempo + 0.002),
        pitch_ci=(pitch - 0.002, pitch + 0.002),
        classification="pure_nightcore",
        n_source_pitch_windows=n_pitch, n_nc_pitch_windows=n_pitch,
        n_source_tempo_windows=9, n_nc_tempo_windows=7,
        rubberband={"time_ratio": tempo, "pitch_semitones": -3.86,
                    "nc_to_source_speed": round(1 / tempo, 6),
                    "cli_command": "rubberband …"},
        nc_duration=nc_dur, src_duration=src_dur,
        nc_median_bpm=160.0, src_median_bpm=128.0,
        ibi_ratio=ibi, ibi_ci=(ibi - 1e-4, ibi + 1e-4) if ibi else None)


def test_full_suite_happy_path(monkeypatch, tmp_path, capsys):
    """Speed compare → create HQNC (native resample) → verification passes →
    skip pitch/spectral/loudness."""
    sr = 22050
    t = np.arange(sr * 4) / sr
    y = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    hq = tmp_path / "Song.flac"
    ncog = tmp_path / "NC.flac"
    native.encode_flac(str(hq), y, sr)
    native.encode_flac(str(ncog), y[: int(len(y) / 1.25)], sr)

    calls = {"n": 0}

    def fake_run(nc_path, src_path, **kw):
        calls["n"] += 1
        if calls["n"] == 1:                  # step 1: HQ vs NCOG
            return _result(tempo=1.25, ibi=1.25)
        return _result(tempo=1.0, pitch=1.0, ibi=1.0003,   # verification
                       nc_dur=48.0, src_dur=48.0)

    from nightcore_analyzer_tpu.analyze import pipeline as pl
    monkeypatch.setattr(pl, "run", fake_run)
    monkeypatch.setattr(workflow, "_estimate_xcorr", lambda a, b: (1.0002, 0.91))

    # prompts: create HQNC [y], pitch [n], spectral [n], loudness [n]
    _scripted_input(monkeypatch, ["y", "n", "n", "n"])
    workflow.run_full_suite(hq, ncog)

    out = capsys.readouterr().out
    assert "SPEED COMPARISON RESULTS" in out
    assert "VERIFICATION" in out
    assert "faithfully recreates the NCOG" in out
    hqnc = workflow._hqnc_path(hq)
    assert hqnc.is_file()                    # artefact created natively
    z, zsr = native.decode_native(str(hqnc))
    assert zsr == sr
    assert len(z) == pytest.approx(len(y) / 1.25, rel=0.01)
    assert calls["n"] == 2


def test_full_suite_retry_loop(monkeypatch, tmp_path, capsys):
    """Verification fails once → corrected UPD1 file → passes."""
    sr = 22050
    y = (0.3 * np.sin(2 * np.pi * 220 * np.arange(sr * 3) / sr)).astype(np.float32)
    hq = tmp_path / "S.flac"
    ncog = tmp_path / "N.flac"
    native.encode_flac(str(hq), y, sr)
    native.encode_flac(str(ncog), y[: int(len(y) / 1.2)], sr)

    seq = [_result(tempo=1.2, ibi=1.185),            # step 1 (slightly off)
           _result(tempo=1.01, ibi=1.0127, nc_dur=40, src_dur=40),  # verify 1: off
           _result(tempo=1.0, ibi=1.0004, nc_dur=40, src_dur=40)]   # verify 2: ok

    from nightcore_analyzer_tpu.analyze import pipeline as pl
    monkeypatch.setattr(pl, "run", lambda *a, **k: seq.pop(0))
    monkeypatch.setattr(workflow, "_estimate_xcorr", lambda a, b: (1.0, 0.8))

    # create HQNC [y], retry corrected [y], pitch [n], spectral [n], loud [n]
    _scripted_input(monkeypatch, ["y", "y", "n", "n", "n"])
    workflow.run_full_suite(hq, ncog)

    out = capsys.readouterr().out
    assert "Corrected factor" in out
    upd1 = workflow._hqnc_path(hq, 1)
    assert upd1.is_file()
    # cumulative corrected factor 1.185 × 1.0127
    z, _ = native.decode_native(str(upd1))
    assert len(z) == pytest.approx(len(y) / (1.185 * 1.0127), rel=0.01)


def test_classify_parity_flag_plumbs_to_pipeline(monkeypatch, tmp_path):
    """--classify-parity sets workflow.CLASSIFY_PARITY, and _run_pipeline
    forwards classify_on_ibi accordingly (round-4 parity surface)."""
    seen = {}

    def fake_run(nc_path, src_path, **kw):
        seen.update(kw)
        return _result(tempo=1.25, ibi=1.25)

    from nightcore_analyzer_tpu.analyze import pipeline as pl
    monkeypatch.setattr(pl, "run", fake_run)
    a = tmp_path / "a.flac"
    b = tmp_path / "b.flac"

    monkeypatch.setattr(workflow, "CLASSIFY_PARITY", False)
    workflow._run_pipeline(a, b, "step")
    assert seen["classify_on_ibi"] is True

    monkeypatch.setattr(workflow, "CLASSIFY_PARITY", True)
    workflow._run_pipeline(a, b, "step")
    assert seen["classify_on_ibi"] is False
