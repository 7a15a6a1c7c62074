import numpy as np
import pytest

from audio_cut_tpu.analysis.features import build_track_features
from audio_cut_tpu.config.derive import (
    AdaptStats,
    SchemaV3Config,
    build_runtime_override_map,
    resolve_min_pause,
    resolve_threshold,
)
from audio_cut_tpu.detection.pause_detector import PureVocalPauseDetector
from audio_cut_tpu.detection.vad import EnergyGateDetector, gap_windows, to_focus_windows


class TestDerive:
    def test_slow_bpm_raises_threshold(self):
        base = 0.26
        d_slow = resolve_threshold(base, {}, AdaptStats(bpm=70))
        d_med = resolve_threshold(base, {}, AdaptStats(bpm=120))
        d_fast = resolve_threshold(base, {}, AdaptStats(bpm=170))
        assert d_slow.peak_ratio > d_med.peak_ratio > d_fast.peak_ratio
        assert abs(d_med.peak_ratio - base) < 1e-9

    def test_rms_ratio_above_peak(self):
        d = resolve_threshold(0.26, {}, AdaptStats(bpm=120, global_mdd=0.8))
        assert d.rms_ratio >= d.peak_ratio + 0.02

    def test_mdd_gain(self):
        lo = resolve_threshold(0.26, {}, AdaptStats(bpm=120, global_mdd=0.0))
        hi = resolve_threshold(0.26, {}, AdaptStats(bpm=120, global_mdd=1.0))
        assert hi.peak_ratio > lo.peak_ratio

    def test_min_pause_adapts(self):
        assert resolve_min_pause(0.5, 1.0, AdaptStats(bpm=180)) < 0.5
        assert resolve_min_pause(0.5, 1.0, AdaptStats(bpm=60)) > 0.5
        assert resolve_min_pause(0.5, 1.0, AdaptStats(bpm=None)) == 0.5

    def test_schema_v3_expansion(self):
        schema = SchemaV3Config(min_pause_s=0.4, threshold_base_ratio=0.3, nms_topk=3)
        flat = build_runtime_override_map(schema)
        assert flat["v2_mdd.pure_vocal_detection.min_pause_duration"] == 0.4
        assert abs(flat["v2_mdd.pure_vocal_detection.rms_relative_threshold_ratio"] - 0.36) < 1e-9
        assert flat["v2_mdd.quality_control.nms_topk_per_10s"] == 3


class TestVAD:
    def test_energy_gate_finds_speech(self, sine_audio):
        audio, sr = sine_audio
        res = EnergyGateDetector(sr).detect(audio)
        assert len(res.segments) >= 3  # sine split by 3 silences -> 4 runs (edges may merge)
        covered = sum(b - a for a, b in res.segments)
        assert 6.0 < covered < 9.0  # 10s minus ~2.3s of gaps

    def test_focus_windows_merge(self):
        wins = to_focus_windows([(0.0, 1.0), (1.1, 2.0), (5.0, 6.0)], 10.0, pad_s=0.2, merge_gap_s=0.12)
        assert len(wins) == 2
        assert wins[0][0] == 0.0 and abs(wins[0][1] - 2.2) < 1e-9

    def test_gap_windows(self):
        gaps = gap_windows([(1.0, 2.0), (3.0, 4.0)], 5.0, pad_s=0.1)
        assert len(gaps) == 3  # head, middle, tail


class TestPauseDetector:
    def test_detects_gaps_in_sine(self, sine_audio):
        audio, sr = sine_audio
        feats = build_track_features(audio, sr)
        det = PureVocalPauseDetector(sr)
        pauses = det.detect_pure_vocal_pauses(audio, features=feats, enable_mdd=True)
        assert len(pauses) >= 3
        gap_centers = [2.4, 5.3, 7.95]
        for center in gap_centers:
            assert any(p.start_time - 0.3 < center < p.end_time + 0.3 for p in pauses), center
        # cut points must land inside their pause interval
        for p in pauses:
            assert p.start_time - 0.2 <= p.cut_point <= p.end_time + 0.2
        # pause types should be MDD-enhanced
        assert all(p.pause_type.endswith("_mdd") for p in pauses)

    def test_cut_point_in_quiet_zone(self, sine_audio):
        audio, sr = sine_audio
        det = PureVocalPauseDetector(sr)
        pauses = det.detect_pure_vocal_pauses(audio, features=None, enable_mdd=False)
        for p in pauses:
            i = int(p.cut_point * sr)
            window = audio[max(0, i - 200):i + 200]
            assert np.abs(window).max() < 0.1, f"cut at {p.cut_point} not quiet"

    def test_focus_windows_restrict(self, sine_audio):
        audio, sr = sine_audio
        det = PureVocalPauseDetector(sr)
        pauses = det.detect_pure_vocal_pauses(
            audio, features=None, focus_windows=[(0.0, 4.0)], enable_mdd=False
        )
        assert all(p.start_time < 4.2 for p in pauses)

    def test_empty_audio(self):
        det = PureVocalPauseDetector(44100)
        assert det.detect_pure_vocal_pauses(np.zeros(0, np.float32)) == []

    def test_vpp_multiplier_returns_valid(self, song_audio):
        import jax.numpy as jnp

        from audio_cut_tpu.ops.frames import frame_rms

        audio, sr = song_audio
        det = PureVocalPauseDetector(sr)
        rms = np.asarray(frame_rms(jnp.asarray(audio), det.frame, det.hop))
        cfg = {"pause_stats_adaptation": {"enable": True}, "relative_threshold_adaptation": {}}
        mult, log = det._estimate_vpp_multiplier(rms, sr / det.hop, cfg, None)
        assert 0.8 <= mult <= 1.2
        assert log.startswith("VPP{")
