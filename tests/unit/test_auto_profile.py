import numpy as np
import pytest

from audio_cut_tpu.config.auto_profile import (
    ALIGNMENT_STOPS,
    SEGMENT_DURATION_STOPS,
    StyleEstimate,
    build_auto_profile_overrides,
    derive_alignment_overrides,
    derive_smart_cut_overrides,
    estimate_style,
    profile_override_map,
    resolve_alignment,
    resolve_segment_duration,
    resolve_smart_cut_intent,
)
from audio_cut_tpu.config.migrate import migrate_v2_config


class TestIntent:
    def test_alignment_stops(self):
        assert resolve_alignment("lyric") == 0.0
        assert resolve_alignment("beat") == 1.0
        assert resolve_alignment("balanced") == 0.5
        assert resolve_alignment(0.75) == 0.75
        assert resolve_alignment(None) == 0.5
        with pytest.raises(ValueError):
            resolve_alignment("nonsense")
        with pytest.raises(ValueError):
            resolve_alignment(1.5)

    def test_segment_stops(self):
        assert resolve_segment_duration("few") == (10.0, 18.0)
        assert resolve_segment_duration("many") == (3.0, 8.0)
        assert resolve_segment_duration([6, 14]) == (6.0, 14.0)
        with pytest.raises(ValueError):
            resolve_segment_duration("lots")

    def test_resolve_intent_defaults(self):
        intent = resolve_smart_cut_intent({})
        assert intent["segments"] == "medium"
        assert intent["alignment"] == 0.5
        assert intent["target_duration_s"] == [5.0, 12.0]

    def test_deprecated_cut_style(self):
        with pytest.warns(DeprecationWarning):
            intent = resolve_smart_cut_intent({"cut_style": "rhythmic"})
        assert intent["alignment"] == 0.7
        with pytest.warns(DeprecationWarning):
            intent = resolve_smart_cut_intent({"cut_style": "dense"})
        assert intent["segments"] == "many"

    def test_explicit_target_wins(self):
        intent = resolve_smart_cut_intent({"segments": "few", "target_duration_s": [4, 9]})
        assert intent["target_duration_s"] == [4.0, 9.0]


class TestAlignmentOverrides:
    def test_balanced_is_noop(self):
        assert derive_alignment_overrides(0.5, {}) == {}

    def test_beat_pole_raises_beat_affinity(self):
        base = {"beat_affinity": 0.08, "acoustic_pause": 0.35}
        ov = derive_alignment_overrides(1.0, base)
        assert ov["phrase_boundary.weights.beat_affinity"] == 0.32
        assert ov["vpbd.beat_candidates.base_score"] == 0.65
        assert ov["global_planner.beat_conflict_weight"] == 0.30

    def test_lyric_pole(self):
        ov = derive_alignment_overrides(0.0, {})
        assert ov["phrase_boundary.weights.asr_gap"] == 0.26
        assert ov["vpbd.beat_candidates.base_score"] == 0.0

    def test_duration_knobs(self):
        ov = derive_smart_cut_overrides({"segments": "many"})
        assert ov["global_planner.target_min_s"] == 3.0
        assert ov["global_planner.target_max_s"] == 8.0
        assert ov["global_planner.hard_max_s"] == 12.0
        assert ov["v2_mdd.segment_layout.soft_max_s"] == 8.0


class _Feats:
    def __init__(self, bpm, cv, mdd=0.4, coverage=0.6, strength=0.8):
        n = 100
        rng = np.random.default_rng(0)
        base = np.abs(rng.standard_normal(n)) * cv + 1.0
        self.rms = (base / base.mean() * 0.2).astype(np.float32)
        self.mdd = np.full(n, mdd, np.float32)
        self.bpm = bpm
        self.tempo_strength = strength
        self.extras = {"vocal_coverage_ratio": coverage}


class TestStyleEstimate:
    def test_ballad(self):
        est = estimate_style(_Feats(bpm=70, cv=0.1))
        assert est.profile == "ballad"

    def test_pop_default(self):
        est = estimate_style(_Feats(bpm=105, cv=0.3))
        assert est.profile == "pop"

    def test_zero_bpm_low_confidence(self):
        est = estimate_style(_Feats(bpm=0, cv=0.3))
        assert est.profile == "pop" and est.confidence == 0.25
        assert est.fallback_reason == "low_confidence"

    def test_auto_profile_overrides_interpolate(self):
        est = StyleEstimate("pop", 0.7, {"bpm": 95.0, "global_mdd": 0.4,
                                         "energy_cv": 0.3, "vocal_coverage_ratio": 0.6})
        ov = build_auto_profile_overrides(est)
        meta = ov["meta.auto_profile"]
        assert set(meta["anchor_weights"]) <= {"ballad", "pop", "rap", "edm"}
        assert abs(sum(meta["anchor_weights"].values()) - 1.0) < 1e-6
        assert "phrase_boundary.weights.acoustic_pause" in ov

    def test_low_confidence_anchors_pop(self):
        est = StyleEstimate("edm", 0.5, {"bpm": 150.0})
        ov = build_auto_profile_overrides(est)
        assert ov["meta.auto_profile"]["anchor_weights"] == {"pop": 1.0}


class TestProfilesAndMigration:
    @pytest.mark.parametrize("name", ["ballad", "pop", "edm", "rap"])
    def test_profile_maps(self, name):
        ov = profile_override_map(name)
        assert any(k.startswith("v2_mdd.pure_vocal_detection") for k in ov)

    def test_migrate_v2(self):
        legacy = {
            "audio": {"sample_rate": 48000},
            "pure_vocal_detection": {
                "min_pause_duration": 0.4,
                "peak_relative_threshold_ratio": 0.3,
                "f0_weight": 0.3,  # removed key -> warn
            },
            "quality_control": {"min_split_gap": 1.5},
        }
        with pytest.warns(DeprecationWarning):
            schema, report = migrate_v2_config(legacy)
        assert schema.sample_rate == 48000
        assert schema.min_pause_s == 0.4
        assert schema.min_gap_s == 1.5
        assert any("f0_weight" in k for k in report["removed"])
