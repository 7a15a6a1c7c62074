"""Vocal Phrase Boundary Detector — unified candidate pool for vpbd_* modes.

Parity: reference src/vocal_smart_splitter/core/vocal_phrase_boundary_detector.py:
49-434 — optional lyrics provider over a 16 kHz detection copy (strict raises,
non-strict falls back to acoustic with fallback_reason recorded), acoustic
candidates incl. breaths scaled by vpbd.breath_score_scale, chorus-gated weak
beat candidates, +-120 ms pool clustering with meta.sources provenance,
vectorised feature extraction + weighted scoring, MDD valley anchor times,
DP planning, optional candidate debug JSON.
"""

from __future__ import annotations

import logging
import tempfile
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from audio_cut_tpu.analysis.boundary_features import BoundaryFeatureExtractor
from audio_cut_tpu.analysis.features import TrackFeatures
from audio_cut_tpu.config import get_config
from audio_cut_tpu.cutting.beat_candidates import generate_beat_candidates
from audio_cut_tpu.cutting.candidates import (
    CandidateSource,
    CutCandidate,
    adapt_acoustic_pauses,
    merge_candidate_pool,
)
from audio_cut_tpu.cutting.planner import (
    GlobalCutPlanner,
    GlobalCutPlannerConfig,
    GlobalCutPlanResult,
)
from audio_cut_tpu.cutting.scorer import PhraseBoundaryScorer, write_candidate_debug_json
from audio_cut_tpu.detection.pause_detector import PureVocalPauseDetector
from audio_cut_tpu.exceptions import LyricsAlignmentUnavailable
from audio_cut_tpu.lyrics.candidates import LyricsBoundaryCandidateGenerator
from audio_cut_tpu.lyrics.models import LyricsTimeline
from audio_cut_tpu.lyrics.providers import AlignRequest, NullLyricsProvider, build_lyrics_provider

logger = logging.getLogger(__name__)


@dataclass
class VPBDDetectionResult:
    selected: List[CutCandidate]
    suppressed: List[CutCandidate]
    plan: GlobalCutPlanResult
    candidate_counts: Dict[str, int] = field(default_factory=dict)
    timeline: Optional[LyricsTimeline] = None
    lyrics_alignment: Optional[Dict[str, Any]] = None
    note: Optional[str] = None

    def to_meta(self) -> Dict[str, Any]:
        return {
            "candidate_counts": dict(self.candidate_counts),
            "selected": [c.to_dict() for c in self.selected],
            "suppressed": [c.to_dict() for c in self.suppressed[:200]],
            "planner": dict(self.plan.metadata),
        }


class VocalPhraseBoundaryDetector:
    def __init__(self, sample_rate: int) -> None:
        self.sr = int(sample_rate)

    def detect(
        self,
        *,
        mode: str,
        vocal_audio: Optional[np.ndarray] = None,
        features: TrackFeatures,
        focus_windows: Optional[List[Tuple[float, float]]],
        duration_s: float,
        output_dir: Optional[str] = None,
        bundle=None,
        vocal_supplier=None,
        vocal_device=None,
    ) -> VPBDDetectionResult:
        """``vocal_audio`` may be omitted when a DetectionBundle and a lazy
        ``vocal_supplier`` are given: acoustic candidates and beat risk then
        run from device-computed envelopes, and the waveform is only
        materialised when the ASR copy genuinely needs it."""
        if vocal_supplier is None:
            vocal_supplier = lambda: vocal_audio  # noqa: E731

        effective_mode = mode
        timeline: Optional[LyricsTimeline] = None
        lyrics_meta: Optional[Dict[str, Any]] = None
        note: Optional[str] = None

        # -- lyrics priors (vpbd_asr only) -----------------------------------
        # the ASR copy is produced lazily AFTER the provider checks, and from
        # the device stem when one exists (resample+quantize on device, only
        # int16@16k crosses the tunnel) — the host waveform is a fallback
        if mode == "vpbd_asr":
            timeline, lyrics_meta, fallback_reason = self._align_lyrics(
                vocal_supplier, duration_s, vocal_device=vocal_device
            )
            if timeline is None:
                effective_mode = str(get_config("vpbd.fallback_mode", "vpbd_acoustic"))
                note = f"lyrics_unavailable:{fallback_reason}"
                logger.warning("vpbd_asr falling back to %s (%s)", effective_mode, fallback_reason)
        if timeline is None:
            timeline = LyricsTimeline()

        # -- candidate pools ---------------------------------------------------
        pause_detector = PureVocalPauseDetector(self.sr)
        pv_cfg = get_config("v2_mdd.pure_vocal_detection", {}) or {}
        wave_free = bundle is not None and bool(
            pv_cfg.get("enable_relative_energy_mode", True)
        )
        n_samples = int(duration_s * self.sr)
        pauses = pause_detector.detect_pure_vocal_pauses(
            None if wave_free else vocal_supplier(),
            features=features, focus_windows=focus_windows, enable_mdd=True,
            rms_env=bundle.vocal_rms_fine if bundle is not None else None,
            env_db_grid=bundle.vocal_db_fine if bundle is not None else None,
            env_db_stride=bundle.db_stride if bundle is not None else 1,
            n_samples=n_samples,
        )
        breath_range = tuple(get_config("v2_mdd.pure_vocal_detection.breath_duration_range", [0.1, 0.3]))
        acoustic = adapt_acoustic_pauses(
            pauses,
            breath_range=breath_range,  # type: ignore[arg-type]
            breath_score_scale=float(get_config("vpbd.breath_score_scale", 0.6)),
        )

        # rollback switch (reference scripts/vpbd_rollback_diff_gate.py):
        # candidate_pool=legacy pins the v2.6-era acoustic-only pool — no
        # weak-beat and no lyrics candidates enter the planner
        pool_mode = str(get_config("vpbd.candidate_pool", "unified"))

        beat_pool: List[CutCandidate] = []
        bc_cfg = get_config("vpbd.beat_candidates", {}) or {}
        if pool_mode != "legacy" and bc_cfg.get("enable", True):
            if bundle is not None:
                vocal_rms = bundle.vocal_rms_grid
            else:
                import jax.numpy as jnp

                from audio_cut_tpu.ops.frames import frame_rms

                hop = max(1, int(round(features.hop_s * self.sr)))
                vocal_rms = np.asarray(
                    frame_rms(jnp.asarray(vocal_supplier(), dtype=jnp.float32), 2048, hop)
                )
            beat_pool = generate_beat_candidates(
                features,
                vocal_rms=vocal_rms,
                bars_per_cut=int(bc_cfg.get("bars_per_cut", 2)),
                base_score=float(bc_cfg.get("base_score", 0.3)),
            )

        lyric_pool: List[CutCandidate] = []
        if (
            pool_mode != "legacy"
            and effective_mode == "vpbd_asr"
            and (timeline.words or timeline.sentences or timeline.vad_regions)
        ):
            lyric_pool = LyricsBoundaryCandidateGenerator().generate(timeline)

        pool = merge_candidate_pool([acoustic, beat_pool, lyric_pool], cluster_ms=120.0)
        counts = {
            "acoustic": len(acoustic),
            "beat": len(beat_pool),
            "lyrics": len(lyric_pool),
            "merged": len(pool),
            "pool_mode": pool_mode,
        }

        # -- scoring ------------------------------------------------------------
        mdd_times = self._mdd_valley_times(features)
        extractor = BoundaryFeatureExtractor(
            timeline=timeline,
            beat_times=features.beat_times,
            mdd_times=mdd_times,
            rms_series=features.rms,
            hop_s=features.hop_s,
            word_edge_tolerance_ms=float(get_config("phrase_boundary.word_edge_tolerance_ms", 60.0)),
        )
        acoustic_strength = [
            c.score if c.source in (CandidateSource.ACOUSTIC_PAUSE, CandidateSource.MDD_VALLEY) else 0.0
            for c in pool
        ]
        breath_strength = [c.score if c.source == CandidateSource.BREATH else 0.0 for c in pool]
        feats = extractor.extract_batch(
            [c.t for c in pool], acoustic_pause=acoustic_strength, breath=breath_strength
        )
        scorer = PhraseBoundaryScorer.from_config()
        scored = [scorer.score_candidate(c, f) for c, f in zip(pool, feats)]

        # -- planning -----------------------------------------------------------
        planner = GlobalCutPlanner(GlobalCutPlannerConfig.from_config())
        plan = planner.plan(scored, duration_s=duration_s)

        if output_dir and bool(get_config("vpbd.candidate_debug_json", True)):
            try:
                write_candidate_debug_json(scored, Path(output_dir) / "vpbd_candidates_debug.json")
            except OSError:
                logger.debug("candidate debug json write failed", exc_info=True)

        return VPBDDetectionResult(
            selected=plan.selected_candidates,
            suppressed=plan.suppressed_candidates,
            plan=plan,
            candidate_counts=counts,
            timeline=timeline,
            lyrics_alignment=lyrics_meta,
            note=note,
        )

    # -- helpers -------------------------------------------------------------

    def _align_lyrics(
        self, vocal_supplier, duration_s: float, vocal_device=None
    ) -> Tuple[Optional[LyricsTimeline], Optional[Dict[str, Any]], Optional[str]]:
        enabled = bool(get_config("lyrics_alignment.enabled", False))
        strict = bool(get_config("lyrics_alignment.strict", False))
        if not enabled:
            return None, None, "disabled"
        provider = build_lyrics_provider(strict=strict)
        if isinstance(provider, NullLyricsProvider) and not strict:
            return None, {"provider": provider.name, "fallback_reason": "no_provider"}, "no_provider"
        try:
            if not provider.available():
                raise LyricsAlignmentUnavailable(f"provider {provider.name} unavailable")
            from audio_cut_tpu.io.audio import write_asr_copy, write_asr_copy_from_device

            with tempfile.TemporaryDirectory() as td:
                asr_path = str(Path(td) / "vocal_16k.wav")
                if vocal_device is not None:
                    # resample+quantize on device: the full float stem never
                    # crosses the tunnel for the ASR copy
                    try:
                        write_asr_copy_from_device(vocal_device, self.sr, asr_path)
                    except Exception:
                        logger.warning("device ASR copy failed; host path", exc_info=True)
                        write_asr_copy(vocal_supplier(), self.sr, asr_path)
                else:
                    write_asr_copy(vocal_supplier(), self.sr, asr_path)
                timeline = provider.align(AlignRequest(audio_path=asr_path, duration_s=duration_s))
            timeline.duration_s = timeline.duration_s or duration_s
            meta = {
                "provider": provider.name,
                "timeline": timeline.to_dict(),
                "word_count": len(timeline.words),
                "sentence_count": len(timeline.sentences),
            }
            return timeline, meta, None
        except LyricsAlignmentUnavailable:
            if strict:
                raise
            return None, {"provider": provider.name, "fallback_reason": "unavailable"}, "unavailable"
        except Exception as exc:  # provider crash: degrade, never fail the cut
            if strict:
                raise
            logger.warning("lyrics provider failed: %s", exc)
            return None, {"provider": provider.name, "fallback_reason": str(exc)[:200]}, "provider_error"

    @staticmethod
    def _mdd_valley_times(features: TrackFeatures) -> List[float]:
        """Local minima of the MDD series as soft anchors."""
        mdd = features.mdd
        if mdd.size < 3:
            return []
        interior = (mdd[1:-1] < mdd[:-2]) & (mdd[1:-1] <= mdd[2:])
        idx = np.nonzero(interior)[0] + 1
        # keep only reasonably low valleys
        low = mdd[idx] <= np.percentile(mdd, 40)
        return [float(i * features.hop_s) for i in idx[low]]
