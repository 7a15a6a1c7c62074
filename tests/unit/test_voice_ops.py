"""ops/voice: YIN F0 tracking + LPC formant analysis.

Mirrors the evidence the reference's legacy pyin/LPC pause mode relies on
(reference pure_vocal_pause_detector.py:410-459, 618-844).
"""

import numpy as np
import pytest

from audio_cut_tpu.ops.voice import (
    lpc_formant_frequencies,
    lpc_formant_strength,
    yin_f0,
)

SR = 44100


def _harmonic(f0: float, dur: float, sr: int = SR, vibrato: float = 0.0) -> np.ndarray:
    t = np.arange(int(dur * sr)) / sr
    f = f0 * (1 + vibrato * np.sin(2 * np.pi * 5.5 * t))
    x = np.zeros(t.size)
    for h in range(1, 6):
        x += np.sin(2 * np.pi * h * np.cumsum(f) / sr) / h
    return (0.4 * x).astype(np.float32)


class TestYin:
    def test_pure_tone_f0(self):
        f0, voicing = yin_f0(_harmonic(220.0, 1.0), SR)
        mid = slice(f0.size // 4, 3 * f0.size // 4)
        assert np.median(voicing[mid]) > 0.8
        assert abs(np.median(f0[mid]) - 220.0) / 220.0 < 0.03

    def test_vibrato_tracked(self):
        f0, voicing = yin_f0(_harmonic(300.0, 1.0, vibrato=0.02), SR)
        mid = slice(f0.size // 4, 3 * f0.size // 4)
        assert np.median(voicing[mid]) > 0.7
        assert abs(np.median(f0[mid]) - 300.0) / 300.0 < 0.05

    def test_noise_is_unvoiced(self):
        rng = np.random.default_rng(0)
        _, voicing = yin_f0(rng.standard_normal(SR).astype(np.float32) * 0.2, SR)
        assert np.median(voicing) < 0.45

    def test_silence_is_unvoiced(self):
        _, voicing = yin_f0(np.zeros(SR, np.float32), SR)
        assert voicing.size == 0 or np.all(voicing <= 1.0)

    def test_viterbi_bridges_dropout(self):
        """A short gap in an otherwise steady tone should not yank the
        smoothed track across octaves."""
        x = _harmonic(220.0, 1.0)
        x[int(0.45 * SR):int(0.5 * SR)] = 0.0
        f0, _ = yin_f0(x, SR)
        voiced = f0[(f0 > 0)]
        # the dominant track stays near 220 (no persistent octave error)
        near = np.abs(voiced - 220.0) / 220.0 < 0.1
        assert near.mean() > 0.6

    def test_short_input(self):
        f0, voicing = yin_f0(np.zeros(100, np.float32), SR)
        assert f0.size == 0 and voicing.size == 0


class TestLPC:
    def test_voiced_has_high_formant_strength(self):
        strength = lpc_formant_strength(_harmonic(180.0, 0.8), SR)
        assert np.median(strength) > 0.8

    def test_noise_has_lower_strength_than_voice(self):
        rng = np.random.default_rng(1)
        noise = rng.standard_normal(int(0.8 * SR)).astype(np.float32) * 0.2
        s_noise = np.median(lpc_formant_strength(noise, SR))
        s_voice = np.median(lpc_formant_strength(_harmonic(180.0, 0.8), SR))
        assert s_voice > s_noise + 0.2

    def test_formant_frequencies_near_resonance(self):
        """Noise through a resonator shows a formant near the pole."""
        from scipy.signal import lfilter

        rng = np.random.default_rng(2)
        noise = rng.standard_normal(SR // 2)
        fc, bw = 900.0, 120.0
        r = np.exp(-np.pi * bw / SR)
        theta = 2 * np.pi * fc / SR
        y = lfilter([1.0], [1.0, -2 * r * np.cos(theta), r * r], noise)
        freqs = lpc_formant_frequencies(y.astype(np.float32), SR)
        assert freqs.size >= 1
        assert np.min(np.abs(freqs - fc)) < 150.0

    def test_formant_frequencies_empty_on_silence(self):
        assert lpc_formant_frequencies(np.zeros(4000, np.float32), SR).size == 0


class TestMultiFeatureMode:
    def test_legacy_mode_scores_with_f0_and_formants(self):
        """End-to-end: legacy mode rescoring attaches f0/formant evidence and
        rates a true silent pause higher than a voiced 'pause'."""
        from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
        from audio_cut_tpu.detection.pause_detector import PureVocalPauseDetector

        sr = SR
        parts = [
            _harmonic(220.0, 1.2),
            np.zeros(int(0.8 * sr), np.float32),     # true pause
            _harmonic(260.0, 1.2),
        ]
        audio = np.concatenate(parts)
        set_runtime_config({
            "v2_mdd.pure_vocal_detection.enable_relative_energy_mode": False,
            "v2_mdd.pure_vocal_detection.pause_stats_adaptation.enable": False,
        })
        try:
            det = PureVocalPauseDetector(sr)
            pauses = det.detect_pure_vocal_pauses(audio, enable_mdd=False)
        finally:
            reset_runtime_config()
        assert pauses, "expected at least the true pause"
        target = [p for p in pauses if p.start_time < 1.5 < p.end_time or
                  (p.start_time > 1.0 and p.end_time < 2.2)]
        assert target, f"no pause found in the silent gap: {[(p.start_time, p.end_time) for p in pauses]}"
        p = target[0]
        assert p.pause_type == "multi_feature"
        assert p.features["f0_score"] > 0.7          # no voicing inside the pause
        assert p.features["formant_score"] > 0.5     # no resonance inside the pause
