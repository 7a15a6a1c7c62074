"""SmartSplitter: the mode-dispatch orchestrator.

Parity: reference src/vocal_smart_splitter/core/seamless_splitter.py:155-236
(SeamlessSplitter.split_audio_seamlessly). Modes:

  vocal_separation  stems only (requires separation engine)
  v2.2_mdd          pure-vocal pause detection + MDD + guards (default legacy)
  librosa_onset     model-free BPM/bar/energy/silence segmentation (this file)
  hybrid_mdd        v2.2 cuts + beat-snap strategies
  vpbd_acoustic     unified candidate pool, acoustic only
  vpbd_asr          unified pool + ASR lyric priors

The TPU redesign keeps the orchestrator as a thin imperative shell: all
framewise math lives in ops/ and analysis/ (single fused device programs);
everything here is host logic over small arrays.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from audio_cut_tpu.config import get_config
from audio_cut_tpu.analysis.features import build_track_features
from audio_cut_tpu.io.audio import load_audio
from audio_cut_tpu.io.segment_export import ExportResult, SegmentExporter
from audio_cut_tpu.pipeline.result import ResultBuilder
from audio_cut_tpu.pipeline.split import split_at_sample_level

logger = logging.getLogger(__name__)

KNOWN_MODES = (
    "vocal_separation",
    "v2.2_mdd",
    "librosa_onset",
    "hybrid_mdd",
    "vpbd_acoustic",
    "vpbd_asr",
)

_DENSITY_MAP = {
    "low": {"verse_bars": 8, "chorus_bars": 4},
    "medium": {"verse_bars": 4, "chorus_bars": 2},
    "high": {"verse_bars": 2, "chorus_bars": 1},
}


class SmartSplitter:
    def __init__(self, sample_rate: Optional[int] = None) -> None:
        from audio_cut_tpu.utils.device import configure_jax

        configure_jax()  # persistent XLA cache: cold compiles amortise across processes
        self.sample_rate = int(sample_rate or get_config("audio.sample_rate", 44100))
        self.result_builder = ResultBuilder()
        self.segment_exporter = SegmentExporter(self.sample_rate)
        self._export_format = str(get_config("output.format", "wav"))
        self._export_options = dict(get_config("output.wav", {}) or {})
        self._separator = None  # lazy: created on first separation-needing mode

    # -- public ----------------------------------------------------------

    def split_audio_seamlessly(
        self,
        input_path: str,
        output_dir: str,
        mode: str = "v2.2_mdd",
        export_format: Optional[str] = None,
        export_options: Optional[Dict[str, Any]] = None,
        export_plan: Optional[Sequence[str]] = None,
    ) -> Dict[str, Any]:
        if mode not in KNOWN_MODES:
            raise ValueError(f"unknown mode {mode!r}; expected one of {KNOWN_MODES}")
        if export_format:
            self._export_format = export_format
        if export_options:
            self._export_options.update(export_options)
        Path(output_dir).mkdir(parents=True, exist_ok=True)

        if mode == "librosa_onset":
            return self._process_librosa_onset(input_path, output_dir, export_plan=export_plan)
        if mode == "vocal_separation":
            return self._process_vocal_separation(input_path, output_dir, export_plan=export_plan)
        if mode in ("v2.2_mdd", "vpbd_acoustic", "vpbd_asr"):
            return self._process_pure_vocal_split(input_path, output_dir, mode=mode, export_plan=export_plan)
        if mode == "hybrid_mdd":
            return self._process_hybrid_mdd(input_path, output_dir, export_plan=export_plan)
        raise AssertionError(mode)

    # -- helpers ---------------------------------------------------------

    @property
    def separator(self):
        if self._separator is None:
            from audio_cut_tpu.separation.engine import SeparationEngine

            self._separator = SeparationEngine(sample_rate=self.sample_rate)
        return self._separator

    def _load(self, input_path: str) -> np.ndarray:
        audio, _sr = load_audio(input_path, target_sr=self.sample_rate, mono=True)
        return audio

    @staticmethod
    def _normalize_export_plan(
        export_plan: Optional[Sequence[str]], default: Sequence[str]
    ) -> set:
        if export_plan is None:
            return set(default)
        plan = {str(p) for p in export_plan}
        if "none" in plan:
            return set()
        return plan

    # -- librosa_onset (smart segment v2) ---------------------------------

    def _process_librosa_onset(
        self,
        input_path: str,
        output_dir: str,
        *,
        export_plan: Optional[Sequence[str]] = None,
    ) -> Dict[str, Any]:
        """Emotion-aware model-free segmentation.

        Behavior parity: reference seamless_splitter.py:1038-1349 —
        BPM + bar grid, per-bar energy -> chorus/verse classes by percentile,
        silence midpoints as forced cuts, density-controlled bar cuts,
        short-merge, sample-exact split, human/music flags from vocal RMS.
        """
        t0 = time.time()
        cfg = get_config("librosa_onset", {}) or {}
        audio = self._load(input_path)
        sr = self.sample_rate
        duration = len(audio) / float(sr)

        # optional separation for classification
        vocal = instrumental = None
        separation_result = None
        if cfg.get("use_vocal_separation", True):
            try:
                separation_result = self.separator.separate_for_detection(
                    audio, need_instrumental=False
                )
                vocal = separation_result.vocal_track
                # host complement: one stem transfer instead of a stacked two
                instrumental = separation_result.complement_instrumental(audio)
            except Exception as exc:  # pragma: no cover - depends on backend avail
                logger.warning("vocal separation unavailable (%s); continuing without", exc)

        # device feature pass on the fine grid used by this mode
        hop_length = int(cfg.get("energy_analysis", {}).get("hop_length", 512))
        tf = build_track_features(audio, sr, hop_s=hop_length / float(sr))
        tempo = tf.bpm if tf.bpm > 1e-3 else 120.0
        time_signature = int(cfg.get("beat", {}).get("time_signature", 4))
        bar_duration = 60.0 / tempo * time_signature

        # per-bar mean RMS -> chorus/verse via percentiles
        bar_edges = np.arange(0.0, duration + bar_duration, bar_duration)
        frame_times = tf.times()
        n_bars = max(0, len(bar_edges) - 1)
        bar_energies = np.zeros(n_bars)
        for i in range(n_bars):
            m = (frame_times >= bar_edges[i]) & (frame_times < bar_edges[i + 1])
            bar_energies[i] = float(tf.rms[m].mean()) if m.any() else 0.0

        ea = cfg.get("energy_analysis", {})
        p_chorus = float(np.percentile(bar_energies, ea.get("chorus_percentile", 60))) if n_bars else 0.0
        p_peak = float(np.percentile(bar_energies, ea.get("chorus_peak_percentile", 80))) if n_bars else 0.0
        bar_types = [
            "chorus_peak" if e >= p_peak else ("chorus" if e >= p_chorus else "verse")
            for e in bar_energies
        ]

        # silence midpoints
        sil = cfg.get("silence", {})
        thr_db = float(sil.get("threshold_db", -40))
        min_dur = float(sil.get("min_duration", 0.3))
        rms_db = 20.0 * np.log10(tf.rms + 1e-10)
        silence_boundaries = _silence_midpoints(rms_db, frame_times, thr_db, min_dur)

        # density
        density = str(cfg.get("density", "low"))
        custom = cfg.get("density_custom", {}) or {}
        if custom.get("enable", False):
            dens = {
                "verse_bars": int(custom.get("verse_bars", 4)),
                "chorus_bars": int(custom.get("chorus_bars", 2)),
            }
        else:
            dens = _DENSITY_MAP.get(density, _DENSITY_MAP["medium"])

        # cuts: bar boundaries at density cadence, silence-forced
        cut_times: List[float] = [0.0]
        last_cut = 0.0
        bars_since = 0
        for bar_idx, bar_time in enumerate(bar_edges[1:]):
            bars_since += 1
            bar_type = bar_types[bar_idx] if bar_idx < len(bar_types) else "verse"
            required = dens["chorus_bars"] if "chorus" in bar_type else dens["verse_bars"]
            should = bars_since >= required
            if not should:
                should = any(last_cut < s <= bar_time for s in silence_boundaries)
            if should:
                cut_times.append(float(bar_time))
                last_cut = float(bar_time)
                bars_since = 0
        for s in silence_boundaries:
            if 0 < s < duration and s not in cut_times:
                cut_times.append(float(s))
        cut_times.append(duration)
        cut_times = sorted(set(cut_times))

        # merge too-short
        min_seg = float(get_config("v2_mdd.segment_layout.soft_min_s", 2.0))
        merged = [cut_times[0]]
        for t in cut_times[1:]:
            if t - merged[-1] >= min_seg:
                merged.append(t)
            elif t == cut_times[-1]:
                merged[-1] = t
        cut_times = merged

        # samples
        cut_samples = sorted({0, len(audio), *(
            int(t * sr) for t in cut_times[1:-1] if 0 < int(t * sr) < len(audio)
        )})

        # classify human/music
        flags: List[bool] = []
        for i in range(len(cut_samples) - 1):
            a, b = cut_samples[i], cut_samples[i + 1]
            if vocal is not None:
                v_rms = float(np.sqrt(np.mean(np.square(vocal[a:b])) + 1e-12))
                if instrumental is not None:
                    i_rms = float(np.sqrt(np.mean(np.square(instrumental[a:b])) + 1e-12))
                    flags.append(v_rms > i_rms * 0.3)
                else:
                    flags.append(v_rms > 0.01)
            else:
                flags.append(True)

        segments, flags_out, _ = split_at_sample_level(
            audio, cut_samples, sr, segment_flags=flags
        )
        if flags_out is None:
            flags_out = flags or [True] * len(segments)
        seg_durations = [len(s) / float(sr) for s in segments]

        export_flags = self._normalize_export_plan(export_plan, default=("mix_segments",))
        export_result = ExportResult()
        if "mix_segments" in export_flags:
            export_result.mix_segment_files = self.segment_exporter.export_segments(
                segments, output_dir,
                segment_is_vocal=flags_out,
                export_format=self._export_format,
                export_options=self._export_options,
            )
            export_result.saved_files.extend(export_result.mix_segment_files)
        if "vocal_segments" in export_flags and vocal is not None:
            vsegs, _, _ = split_at_sample_level(vocal, cut_samples, sr)
            export_result.vocal_segment_files = self.segment_exporter.export_segments(
                vsegs, output_dir,
                segment_is_vocal=flags_out,
                export_format=self._export_format,
                export_options=self._export_options,
                subdir="segments_vocal",
                file_suffix="_vocal",
            )
            export_result.saved_files.extend(export_result.vocal_segment_files)

        result = self.result_builder.build_base(
            method="smart_segment_v2",
            export_result=export_result,
            export_plan=sorted(export_flags),
            processing_time=time.time() - t0,
            input_path=input_path,
            output_dir=output_dir,
            cut_points_samples=list(cut_samples),
            cut_points_sec=[s / float(sr) for s in cut_samples],
            segment_durations=seg_durations,
            segment_vocal_flags=flags_out,
            precision_guard_ok=True,
        )
        result.update({
            "use_vocal_preprocessing": bool(cfg.get("use_vocal_separation", True)),
            "bpm": float(tempo),
            "bar_duration_s": float(bar_duration),
            "density": density,
            "silence_boundaries": [float(s) for s in silence_boundaries],
        })
        return self.result_builder.add_separation_metadata(result, separation_result)

    # -- stubs wired in later milestones -----------------------------------

    def _process_vocal_separation(self, input_path, output_dir, *, export_plan=None):
        from audio_cut_tpu.pipeline.modes.separation_mode import process_vocal_separation

        return process_vocal_separation(self, input_path, output_dir, export_plan=export_plan)

    def _process_pure_vocal_split(self, input_path, output_dir, *, mode, export_plan=None):
        from audio_cut_tpu.pipeline.modes.pure_vocal import process_pure_vocal_split

        return process_pure_vocal_split(self, input_path, output_dir, mode=mode, export_plan=export_plan)

    def _process_hybrid_mdd(self, input_path, output_dir, *, export_plan=None):
        from audio_cut_tpu.pipeline.modes.hybrid import process_hybrid_mdd

        return process_hybrid_mdd(self, input_path, output_dir, export_plan=export_plan)


def _silence_midpoints(
    rms_db: np.ndarray, frame_times: np.ndarray, threshold_db: float, min_duration: float
) -> List[float]:
    """Midpoints of silent runs >= min_duration (vectorised run detection)."""
    mask = rms_db < threshold_db
    if not mask.any():
        return []
    edges = np.diff(mask.astype(np.int8), prepend=0, append=0)
    starts = np.nonzero(edges == 1)[0]
    ends = np.nonzero(edges == -1)[0]
    out: List[float] = []
    for s, e in zip(starts, ends):
        t0 = frame_times[s]
        t1 = frame_times[min(e, len(frame_times) - 1)]
        if t1 - t0 >= min_duration:
            out.append(float(t0 + (t1 - t0) / 2.0))
    return out
