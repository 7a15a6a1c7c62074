"""Config default invariants (parity: reference tests/contracts/test_config_contracts.py)."""

import pytest

from audio_cut_tpu.config.manager import ConfigManager


@pytest.fixture(scope="module")
def cfg():
    return ConfigManager()


def test_phrase_weight_positive_sum(cfg):
    weights = cfg.get("phrase_boundary.weights")
    positive = {k: v for k, v in weights.items() if not k.endswith("_penalty")}
    assert abs(sum(positive.values()) - 1.0) < 1e-6, positive


def test_alignment_pole_sums(cfg):
    # pole sums match the reference values: lyric 1.04, beat 0.94
    expected = {"lyric": 1.04, "beat": 0.94}
    for pole, target in expected.items():
        weights = cfg.get(f"phrase_boundary.alignment_poles.{pole}")
        positive = {k: v for k, v in weights.items() if not k.endswith("_penalty")}
        assert abs(sum(positive.values()) - target) < 1e-6, (pole, positive)


def test_planner_band_inside_hard_limits(cfg):
    g = cfg.get("global_planner")
    assert g["hard_min_s"] < g["target_min_s"] < g["target_max_s"] < g["hard_max_s"]


def test_layout_band_consistent(cfg):
    layout = cfg.get("v2_mdd.segment_layout")
    assert layout["micro_merge_s"] <= layout["soft_min_s"] <= layout["soft_max_s"]


def test_guard_config_sane(cfg):
    eqc = cfg.get("v2_mdd.quality_control.enforce_quiet_cut")
    assert eqc["search_right_ms"] >= 100
    assert 0 < eqc["guard_db"] <= 6


def test_removed_legacy_keys_absent(cfg):
    # keys the v3 schema removed must not resurface in defaults
    assert cfg.get("v2_mdd.advanced_vad.bpm_adaptive_thresholds") is None
    assert cfg.get("vocal_pause_splitting.voice_threshold") is not None  # still supported


def test_mode_defaults(cfg):
    assert cfg.get("global.default_mode") == "vpbd_asr"
    assert cfg.get("vpbd.fallback_mode") == "vpbd_acoustic"
    assert cfg.get("vpbd.breath_score_scale") == 0.6
