"""Beat/bar analysis for hybrid beat-aligned cutting.

Parity: reference src/audio_cut/analysis/beat_analyzer.py:21-334 — BPM + bar
boundaries (beats grouped by time signature), per-bar energy statistics and a
high-energy bar set by percentile; reuses the TrackFeatures beat grid/BPM
instead of re-running beat tracking.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from audio_cut_tpu.analysis.chorus import ChorusRegion, detect_chorus_regions
from audio_cut_tpu.analysis.features import TrackFeatures


@dataclass
class BeatAnalysisResult:
    bpm: float
    beat_times: np.ndarray
    bar_times: np.ndarray           # bar START times (incl. the grid end point)
    bar_energies: np.ndarray
    high_energy_mask: np.ndarray    # per bar
    chorus_regions: List[ChorusRegion] = field(default_factory=list)
    time_signature: int = 4

    def to_meta(self) -> Dict[str, object]:
        return {
            "bpm": float(self.bpm),
            "beat_count": int(self.beat_times.size),
            "bar_count": max(0, int(self.bar_times.size) - 1),
            "high_energy_bars": int(self.high_energy_mask.sum()),
            "time_signature": self.time_signature,
            "chorus_regions": [
                {"start_s": r.start_s, "end_s": r.end_s} for r in self.chorus_regions
            ],
        }


class BeatAnalyzer:
    def __init__(self, time_signature: int = 4, energy_percentile: float = 60.0) -> None:
        self.time_signature = int(time_signature)
        self.energy_percentile = float(energy_percentile)

    def analyze(self, features: TrackFeatures) -> BeatAnalysisResult:
        beats = np.asarray(features.beat_times, dtype=np.float64)
        if beats.size < self.time_signature + 1:
            return BeatAnalysisResult(
                bpm=features.bpm,
                beat_times=beats,
                bar_times=np.zeros(0),
                bar_energies=np.zeros(0),
                high_energy_mask=np.zeros(0, dtype=bool),
                time_signature=self.time_signature,
            )
        bar_times = beats[::self.time_signature]
        if bar_times[-1] < features.duration_s - 1e-6:
            bar_times = np.append(bar_times, features.duration_s)

        n_bars = bar_times.size - 1
        energies = np.zeros(n_bars)
        for i in range(n_bars):
            sl = features.frame_slice(float(bar_times[i]), float(bar_times[i + 1]))
            energies[i] = float(features.rms[sl].mean()) if sl.stop > sl.start else 0.0

        regions, high_mask = detect_chorus_regions(
            features, bar_times, energy_percentile=self.energy_percentile
        )
        return BeatAnalysisResult(
            bpm=features.bpm,
            beat_times=beats,
            bar_times=bar_times,
            bar_energies=energies,
            high_energy_mask=high_mask,
            chorus_regions=regions,
            time_signature=self.time_signature,
        )
