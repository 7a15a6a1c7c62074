import os

import pytest

from audio_cut_tpu.config.manager import ConfigManager, deep_merge, get_nested, set_nested


def test_defaults_loaded():
    cm = ConfigManager()
    assert cm.get("audio.sample_rate") == 44100
    assert cm.get("v2_mdd.pure_vocal_detection.min_pause_duration") == 0.5
    assert cm.get("global_planner.hard_min_s") == 2.0
    assert cm.get("phrase_boundary.weights.acoustic_pause") == 0.35


def test_runtime_overrides_tracked_and_reset():
    cm = ConfigManager()
    cm.set_runtime({"smart_cut.segments": "few", "audio.sample_rate": 48000})
    assert cm.get("smart_cut.segments") == "few"
    assert cm.get("audio.sample_rate") == 48000
    assert cm.runtime_override_keys() == {"smart_cut.segments", "audio.sample_rate"}
    cm.reset_runtime()
    assert cm.get("audio.sample_rate") == 44100
    assert cm.runtime_override_keys() == set()


def test_env_override(monkeypatch):
    monkeypatch.setenv("VSS__audio__sample_rate", "48000")
    cm = ConfigManager()
    assert cm.get("audio.sample_rate") == 48000


def test_external_config_path(tmp_path, monkeypatch):
    ext = tmp_path / "ext.yaml"
    ext.write_text("smart_cut:\n  segments: many\n")
    monkeypatch.setenv("AUDIO_CUT_TPU_CONFIG", str(ext))
    cm = ConfigManager()
    assert cm.get("smart_cut.segments") == "many"


def test_validation_rejects_bad_sr(tmp_path, monkeypatch):
    ext = tmp_path / "bad.yaml"
    ext.write_text("audio:\n  sample_rate: -1\n")
    monkeypatch.setenv("AUDIO_CUT_TPU_CONFIG", str(ext))
    with pytest.raises(ValueError):
        ConfigManager()


def test_nested_helpers():
    d = {}
    set_nested(d, "a.b.c", 3)
    assert get_nested(d, "a.b.c") == 3
    assert get_nested(d, "a.x", "dflt") == "dflt"
    merged = deep_merge({"a": {"b": 1}}, {"a": {"c": 2}})
    assert merged == {"a": {"b": 1, "c": 2}}


def test_snapshot_restore():
    cm = ConfigManager()
    snap = cm.snapshot()
    cm.set_runtime({"audio.sample_rate": 8000})
    cm.restore(snap)
    assert cm.get("audio.sample_rate") == 44100
