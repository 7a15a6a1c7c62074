"""Segment layout refinement: duration shaping after guards.

Parity: reference src/audio_cut/cutting/segment_layout_refiner.py —
micro-merge of fragments (skipping beat/_lib cuts, :137-193), soft-min merge
with kind-aware neighbour cost (:196-254), soft-max rescue splits preferring
NMS-suppressed candidates scored by quietness + boundary affinity − inside-word
penalty with acoustic valley search fallback and optional midpoint (:313-470),
post-split micro merge (:257-310), min-gap enforcement (:492-537), beat snap
<= beat_snap_ms (:540-588), continuity restore (:623).

All searches run over the device-precomputed frame RMS (TrackFeatures) — no
waveform rescans here.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from audio_cut_tpu.analysis.features import TrackFeatures

logger = logging.getLogger(__name__)


@dataclass
class LayoutConfig:
    enable: bool = True
    micro_merge_s: float = 2.0
    soft_min_s: float = 5.0
    soft_max_s: float = 12.0
    min_gap_s: float = 1.0
    beat_snap_ms: float = 50.0
    allow_midpoint_fallback: bool = True
    edge_margin_s: float = 1.0   # rescue split must stay this far from edges

    @classmethod
    def from_mapping(cls, data: Optional[Dict[str, Any]]) -> "LayoutConfig":
        d = data or {}
        return cls(
            enable=bool(d.get("enable", True)),
            micro_merge_s=float(d.get("micro_merge_s", 2.0)),
            soft_min_s=float(d.get("soft_min_s", 5.0)),
            soft_max_s=float(d.get("soft_max_s", 12.0)),
            min_gap_s=float(d.get("min_gap_s", 1.0)),
            beat_snap_ms=float(d.get("beat_snap_ms", 50.0)),
            allow_midpoint_fallback=bool(d.get("allow_midpoint_fallback", True)),
        )


@dataclass
class RescueCandidate:
    t: float
    score: float
    inside_word: bool = False
    boundary_affinity: float = 0.0


@dataclass
class LayoutResult:
    cut_times: List[float]
    cut_kinds: List[str]
    meta: Dict[str, int] = field(default_factory=dict)


def _segments(cuts: Sequence[float], duration: float) -> List[Tuple[float, float]]:
    pts = [0.0, *cuts, duration]
    return list(zip(pts[:-1], pts[1:]))


def _word_hit(t: float, word_intervals: Optional[Sequence[Tuple[float, float]]]) -> bool:
    if not word_intervals:
        return False
    return any(a < t < b for a, b in word_intervals)


class LayoutRefiner:
    def __init__(
        self,
        config: LayoutConfig,
        duration_s: float,
        features: Optional[TrackFeatures] = None,
        vocal_rms_db: Optional[np.ndarray] = None,   # on the features frame grid
        beat_times: Optional[np.ndarray] = None,
        word_intervals: Optional[Sequence[Tuple[float, float]]] = None,
        asr_boundaries: Optional[Sequence[float]] = None,
    ) -> None:
        self.cfg = config
        self.duration = float(duration_s)
        self.features = features
        self.vocal_rms_db = vocal_rms_db
        self.beat_times = np.asarray(beat_times) if beat_times is not None else None
        self.word_intervals = list(word_intervals or [])
        self.asr_boundaries = np.asarray(list(asr_boundaries or []), dtype=np.float64)

    # -- public -------------------------------------------------------------

    def refine(
        self,
        cut_times: Sequence[float],
        cut_kinds: Optional[Sequence[str]] = None,
        suppressed: Optional[Sequence[RescueCandidate]] = None,
    ) -> LayoutResult:
        cuts = sorted(float(t) for t in cut_times if 0.0 < t < self.duration)
        kinds = list(cut_kinds) if cut_kinds and len(cut_kinds) == len(cuts) else ["pause"] * len(cuts)
        meta = {"micro_merged": 0, "soft_min_merged": 0, "rescued": 0, "min_gap_dropped": 0, "beat_snapped": 0}
        if not self.cfg.enable:
            return LayoutResult(cuts, kinds, meta)

        cuts, kinds, n = self._micro_merge(cuts, kinds, self.cfg.micro_merge_s)
        meta["micro_merged"] += n
        cuts, kinds, n = self._soft_min_merge(cuts, kinds)
        meta["soft_min_merged"] += n
        cuts, kinds, n = self._soft_max_rescue(cuts, kinds, suppressed or [])
        meta["rescued"] += n
        cuts, kinds, n = self._micro_merge(cuts, kinds, self.cfg.micro_merge_s)
        meta["micro_merged"] += n
        cuts, kinds, n = self._enforce_min_gap(cuts, kinds)
        meta["min_gap_dropped"] += n
        cuts, kinds, n = self._beat_snap(cuts, kinds)
        meta["beat_snapped"] += n
        return LayoutResult(cuts, kinds, meta)

    # -- passes ---------------------------------------------------------------

    def _micro_merge(self, cuts: List[float], kinds: List[str], limit: float):
        """Remove the cut bounding any fragment shorter than `limit`
        (never removing beat/_lib cuts)."""
        merged = 0
        changed = True
        while changed and cuts:
            changed = False
            segs = _segments(cuts, self.duration)
            for i, (a, b) in enumerate(segs):
                if b - a >= limit:
                    continue
                # candidate cuts bounding this fragment: i-1 (left) and i (right)
                options = []
                if i - 1 >= 0 and kinds[i - 1] != "beat":
                    options.append(i - 1)
                if i < len(cuts) and kinds[i] != "beat":
                    options.append(i)
                if not options:
                    continue
                # drop the cut adjoining the shorter neighbour segment
                def neighbour_len(ci: int) -> float:
                    if ci == i - 1:  # merging left
                        return segs[i - 1][1] - segs[i - 1][0] if i - 1 >= 0 else np.inf
                    return segs[i + 1][1] - segs[i + 1][0] if i + 1 < len(segs) else np.inf

                drop = min(options, key=neighbour_len)
                del cuts[drop]
                del kinds[drop]
                merged += 1
                changed = True
                break
        return cuts, kinds, merged

    def _soft_min_merge(self, cuts: List[float], kinds: List[str]):
        """Merge sub-soft-min segments into the neighbour with lower cost."""
        merged = 0
        changed = True
        while changed and cuts:
            changed = False
            segs = _segments(cuts, self.duration)
            for i, (a, b) in enumerate(segs):
                dur = b - a
                if dur >= self.cfg.soft_min_s or dur < 1e-9:
                    continue
                costs = []
                if i - 1 >= 0 and kinds[i - 1] != "beat":
                    left_len = segs[i - 1][1] - segs[i - 1][0]
                    cost = (left_len + dur) - self.cfg.soft_max_s
                    costs.append((max(cost, 0.0) + 0.1 * left_len, i - 1))
                if i < len(cuts) and kinds[i] != "beat":
                    right_len = segs[i + 1][1] - segs[i + 1][0]
                    cost = (right_len + dur) - self.cfg.soft_max_s
                    costs.append((max(cost, 0.0) + 0.1 * right_len, i))
                if not costs:
                    continue
                _, drop = min(costs)
                del cuts[drop]
                del kinds[drop]
                merged += 1
                changed = True
                break
        return cuts, kinds, merged

    def _soft_max_rescue(
        self, cuts: List[float], kinds: List[str], suppressed: Sequence[RescueCandidate]
    ):
        """Split over-long segments at rescued candidates / acoustic valleys."""
        rescued = 0
        changed = True
        guard = 0
        while changed and guard < 256:
            changed = False
            guard += 1
            segs = _segments(cuts, self.duration)
            for a, b in segs:
                if b - a <= self.cfg.soft_max_s:
                    continue
                t = self._pick_split(a, b, suppressed)
                if t is None:
                    continue
                idx = int(np.searchsorted(cuts, t))
                cuts.insert(idx, t)
                kinds.insert(idx, "rescue")
                rescued += 1
                changed = True
                break
        return cuts, kinds, rescued

    def _pick_split(
        self, a: float, b: float, suppressed: Sequence[RescueCandidate]
    ) -> Optional[float]:
        lo = a + max(self.cfg.edge_margin_s, self.cfg.min_gap_s)
        hi = b - max(self.cfg.edge_margin_s, self.cfg.min_gap_s)
        if hi <= lo:
            return None

        # 1) best suppressed candidate: quiet + boundary affinity - inside-word
        best: Optional[Tuple[float, float]] = None
        for cand in suppressed:
            if not (lo <= cand.t <= hi):
                continue
            score = cand.score + 0.3 * cand.boundary_affinity
            if self.asr_boundaries.size:
                d = float(np.min(np.abs(self.asr_boundaries - cand.t)))
                score += 0.3 * max(0.0, 1.0 - d / 0.5)
            if cand.inside_word or _word_hit(cand.t, self.word_intervals):
                score -= 0.8
            score += self._quietness(cand.t)
            if best is None or score > best[1]:
                best = (cand.t, score)
        if best is not None and best[1] > 0.2:
            return best[0]

        # 2) acoustic valley on the cached RMS grid
        t = self._valley_in(lo, hi)
        if t is not None:
            return t

        # 3) midpoint fallback
        if self.cfg.allow_midpoint_fallback:
            return (a + b) / 2.0
        return None

    def _quietness(self, t: float) -> float:
        if self.vocal_rms_db is None or self.features is None:
            return 0.0
        i = self.features.frame_index(t)
        db = float(self.vocal_rms_db[min(i, self.vocal_rms_db.size - 1)])
        floor = float(np.percentile(self.vocal_rms_db, 5))
        span = float(np.percentile(self.vocal_rms_db, 95)) - floor
        if span <= 0:
            return 0.0
        return float(np.clip(1.0 - (db - floor) / span, 0.0, 1.0)) * 0.5

    def _valley_in(self, lo: float, hi: float) -> Optional[float]:
        feats = self.features
        if feats is None or feats.rms.size == 0:
            return None
        sl = feats.frame_slice(lo, hi)
        window = feats.rms[sl]
        if window.size == 0:
            return None
        rel = int(np.argmin(window))
        t = (sl.start + rel) * feats.hop_s
        # a valley is only acceptable if meaningfully quieter than the segment
        if window[rel] > 0.5 * float(np.median(window) + 1e-12):
            return None
        return float(np.clip(t, lo, hi))

    def _enforce_min_gap(self, cuts: List[float], kinds: List[str]):
        dropped = 0
        out_c: List[float] = []
        out_k: List[str] = []
        prev = 0.0
        for t, k in zip(cuts, kinds):
            if t - prev < self.cfg.min_gap_s or self.duration - t < self.cfg.min_gap_s:
                dropped += 1
                continue
            out_c.append(t)
            out_k.append(k)
            prev = t
        return out_c, out_k, dropped

    def _beat_snap(self, cuts: List[float], kinds: List[str]):
        if self.beat_times is None or self.beat_times.size == 0 or self.cfg.beat_snap_ms <= 0:
            return cuts, kinds, 0
        tol = self.cfg.beat_snap_ms / 1000.0
        snapped = 0
        for i, t in enumerate(cuts):
            j = int(np.argmin(np.abs(self.beat_times - t)))
            bt = float(self.beat_times[j])
            if 0 < abs(bt - t) <= tol and 0.0 < bt < self.duration:
                cuts[i] = bt
                snapped += 1
        # snapping can reorder/duplicate; restore continuity
        order = np.argsort(cuts)
        cuts = [cuts[i] for i in order]
        kinds = [kinds[i] for i in order]
        dedup_c: List[float] = []
        dedup_k: List[str] = []
        for t, k in zip(cuts, kinds):
            if not dedup_c or t - dedup_c[-1] > 1e-6:
                dedup_c.append(t)
                dedup_k.append(k)
        return dedup_c, dedup_k, snapped


def refine_layout(
    cut_times: Sequence[float],
    duration_s: float,
    config: Optional[Dict[str, Any]] = None,
    features: Optional[TrackFeatures] = None,
    vocal_rms_db: Optional[np.ndarray] = None,
    beat_times: Optional[np.ndarray] = None,
    suppressed: Optional[Sequence[RescueCandidate]] = None,
    cut_kinds: Optional[Sequence[str]] = None,
    word_intervals: Optional[Sequence[Tuple[float, float]]] = None,
    asr_boundaries: Optional[Sequence[float]] = None,
) -> LayoutResult:
    refiner = LayoutRefiner(
        LayoutConfig.from_mapping(config),
        duration_s,
        features=features,
        vocal_rms_db=vocal_rms_db,
        beat_times=beat_times,
        word_intervals=word_intervals,
        asr_boundaries=asr_boundaries,
    )
    return refiner.refine(cut_times, cut_kinds=cut_kinds, suppressed=suppressed)
