"""Voice-activity detection.

Two tiers, matching the reference seam:

* EnergyGateDetector — deterministic RMS-dB gate with min-voice/min-silence
  hysteresis (parity: reference src/audio_cut/detectors/energy_gate.py:27).
  This is the default production VAD here until a learned VAD checkpoint is
  provided; the envelope is computed on device in one pass.
* ConvVAD (models/vad.py) — Silero-class learned VAD seam (reference
  vocal_pause_detector.py:55) for when weights exist.

Focus windows (parity: silero_chunk_vad.py:152 to_focus_windows): padded
speech intervals merged across small gaps — downstream detectors scan only
inside these.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from audio_cut_tpu.ops.frames import frame_rms


@dataclass
class VadResult:
    segments: List[Tuple[float, float]] = field(default_factory=list)  # speech (start_s, end_s)
    frame_rate: float = 100.0


def _runs_from_mask(mask: np.ndarray) -> np.ndarray:
    """[n_runs, 2] start/end frame indices of True runs."""
    edges = np.diff(mask.astype(np.int8), prepend=0, append=0)
    starts = np.nonzero(edges == 1)[0]
    ends = np.nonzero(edges == -1)[0]
    return np.stack([starts, ends], axis=1) if starts.size else np.zeros((0, 2), dtype=np.int64)


def merge_intervals(intervals: List[Tuple[float, float]], max_gap: float) -> List[Tuple[float, float]]:
    if not intervals:
        return []
    out: List[Tuple[float, float]] = []
    for a, b in sorted(intervals):
        if out and a - out[-1][1] <= max_gap:
            out[-1] = (out[-1][0], max(out[-1][1], b))
        else:
            out.append((a, b))
    return out


class EnergyGateDetector:
    def __init__(
        self,
        sample_rate: int,
        threshold_db: float = -40.0,
        min_voice_s: float = 0.1,
        min_silence_s: float = 0.15,
        hop_s: float = 0.01,
        frame_s: float = 0.025,
        relative_floor_db: Optional[float] = 20.0,
    ) -> None:
        self.sr = int(sample_rate)
        self.threshold_db = float(threshold_db)
        self.min_voice_s = float(min_voice_s)
        self.min_silence_s = float(min_silence_s)
        self.hop = max(1, int(round(hop_s * sample_rate)))
        self.frame = max(self.hop, int(round(frame_s * sample_rate)))
        self.relative_floor_db = relative_floor_db

    def detect(self, audio: Optional[np.ndarray], rms_env: Optional[np.ndarray] = None) -> VadResult:
        # waveform-free when an envelope is supplied: the audio arg is only
        # the RMS source, so callers with a bundle envelope need not download
        # the stem (ADVICE r2)
        if rms_env is not None:
            rms = np.asarray(rms_env)
            if rms.size == 0:
                return VadResult([], self.sr / self.hop)
        elif audio is None or audio.size == 0:
            return VadResult([], self.sr / self.hop)
        else:
            rms = np.asarray(frame_rms(jnp.asarray(audio, dtype=jnp.float32), self.frame, self.hop))
        db = 20.0 * np.log10(rms + 1e-12)
        thr = self.threshold_db
        if self.relative_floor_db is not None:
            # adaptive: at least `relative_floor_db` above the quietest decile
            floor = float(np.percentile(db, 10))
            thr = max(thr, floor + self.relative_floor_db)
        mask = db > thr

        fps = self.sr / self.hop
        min_sil = max(1, int(round(self.min_silence_s * fps)))
        min_voice = max(1, int(round(self.min_voice_s * fps)))

        # close short silences, then drop short voice runs
        for start, end in _runs_from_mask(~mask):
            if end - start <= min_sil:
                mask[start:end] = True
        segments: List[Tuple[float, float]] = []
        for start, end in _runs_from_mask(mask):
            if end - start >= min_voice:
                segments.append((start / fps, end / fps))
        return VadResult(segments, fps)


def to_focus_windows(
    segments: List[Tuple[float, float]],
    duration_s: float,
    pad_s: float = 0.2,
    merge_gap_s: float = 0.12,
    min_width_s: float = 0.0,
) -> List[Tuple[float, float]]:
    """Padded + merged speech windows for downstream valley scanning."""
    padded = [
        (max(0.0, a - pad_s), min(duration_s, b + pad_s))
        for a, b in segments
        if b > a
    ]
    merged = merge_intervals(padded, merge_gap_s)
    return [(a, b) for a, b in merged if b - a >= min_width_s]


def gap_windows(
    segments: List[Tuple[float, float]],
    duration_s: float,
    pad_s: float = 0.2,
) -> List[Tuple[float, float]]:
    """Complement windows around speech gaps (gap-oriented focus)."""
    if not segments:
        return [(0.0, duration_s)]
    out: List[Tuple[float, float]] = []
    prev_end = 0.0
    for a, b in sorted(segments):
        if a - prev_end > 1e-6:
            out.append((max(0.0, prev_end - pad_s), min(duration_s, a + pad_s)))
        prev_end = max(prev_end, b)
    if duration_s - prev_end > 1e-6:
        out.append((max(0.0, prev_end - pad_s), duration_s))
    return out
