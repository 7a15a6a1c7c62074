"""quick_start parameter contract (parity: the reference suite's
test_quick_start_vpbd.py — interactive answers must map onto the intent
surface exactly like the CLI does, SURVEY §4)."""

import numpy as np
import pytest

import audio_cut_tpu.quick_start as qs
from audio_cut_tpu.io import write_wav


@pytest.fixture()
def song_dir(tmp_path):
    sr = 44100
    t = np.arange(sr * 2) / sr
    x = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    d = tmp_path / "input"
    d.mkdir()
    write_wav(d / "a.wav", x, sr)
    write_wav(d / "b.wav", x, sr)
    return tmp_path


def _run(monkeypatch, song_dir, answers):
    calls = []

    def fake_api(**kwargs):
        calls.append(kwargs)
        return {"success": True, "stats": {"num_segments": 1}}

    it = iter(answers)
    monkeypatch.setattr(qs, "separate_and_segment", fake_api)
    monkeypatch.setattr("builtins.input", lambda *_a: next(it))
    rc = qs.run_interactive(str(song_dir / "input"), output_dir=str(song_dir / "out"))
    return rc, calls


def test_split_answers_route_to_intent(monkeypatch, song_dir):
    """density/alignment answers become the intent args (mode stays None so
    the API routes intent -> vpbd_asr, reference run_splitter.py:162-168)."""
    rc, calls = _run(monkeypatch, song_dir, ["1", "split", "many", "beat_lean"])
    assert rc == 0 and len(calls) == 1
    kw = calls[0]
    assert kw["mode"] is None
    assert kw["segments"] == "many"
    assert kw["alignment"] == "beat_lean"
    assert kw["export_manifest"] is True


def test_separate_answer_routes_to_vocal_separation(monkeypatch, song_dir):
    rc, calls = _run(monkeypatch, song_dir, ["2", "separate"])
    assert rc == 0 and len(calls) == 1
    assert calls[0]["mode"] == "vocal_separation"
    assert calls[0]["segments"] is None and calls[0]["alignment"] is None


def test_batch_mode_runs_every_file(monkeypatch, song_dir):
    rc, calls = _run(monkeypatch, song_dir, ["all", "split", "", ""])  # defaults
    assert rc == 0 and len(calls) == 2
    assert calls[0]["segments"] == "medium"      # default density
    assert calls[0]["alignment"] == "balanced"   # default alignment
    dests = {kw["export_dir"] for kw in calls}
    assert len(dests) == 2  # per-file output subdirs


def test_invalid_then_valid_answers(monkeypatch, song_dir):
    rc, calls = _run(
        monkeypatch, song_dir, ["9", "1", "nope", "split", "some", "few", "beat"]
    )
    assert rc == 0 and len(calls) == 1
    assert calls[0]["segments"] == "few" and calls[0]["alignment"] == "beat"


def test_empty_dir_exit_code(tmp_path, monkeypatch):
    assert qs.run_interactive(str(tmp_path / "missing")) == 2


def test_api_failure_sets_exit_code(monkeypatch, song_dir):
    def boom(**kwargs):
        raise RuntimeError("backend exploded")

    it = iter(["1", "split", "", ""])
    monkeypatch.setattr(qs, "separate_and_segment", boom)
    monkeypatch.setattr("builtins.input", lambda *_a: next(it))
    assert qs.run_interactive(str(song_dir / "input")) == 1
