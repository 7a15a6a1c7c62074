"""Pure-vocal pause detection — the main v2.2_mdd detector.

Behavior parity with reference
src/vocal_smart_splitter/core/pure_vocal_pause_detector.py:

* relative-energy-valley mode (default): dynamic threshold =
  min(peak_energy*peak_ratio, avg_energy*rms_ratio) over a 25 ms / 10 ms RMS
  envelope, valleys gated by VAD focus windows, valley scoring
  w_len/w_quiet/w_flat (:1176-1201);
* BPM/MDD threshold derivation via resolve_threshold (:220-240) and the VPP
  (vocal pause profile) multiplier from in-song rest statistics with
  morphological close/open and singing-block extraction (:1389-1532);
* merge-close + max_raw cap (:503-547) and the total-valley cap
  duration/segment_min (:461-501);
* MDD confidence enhancement from the shared feature grid (:1237-1368);
* precise cut point = RMS-envelope argmin + lookahead guard + silence-floor
  midpoint fallback (:1020-1094).

TPU redesign: every envelope is ONE device kernel over the whole track
(ops.frames.frame_rms); run detection / morphology / statistics are
vectorised numpy over boolean run tables — no per-frame Python loops.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from audio_cut_tpu.config import get_config
from audio_cut_tpu.config.derive import (
    AdaptStats,
    resolve_min_pause,
    resolve_pause_stats_multiplier,
    resolve_threshold,
)
from audio_cut_tpu.analysis.features import TrackFeatures
from audio_cut_tpu.ops.frames import frame_rms

logger = logging.getLogger(__name__)


@dataclass
class PureVocalPause:
    start_time: float
    end_time: float
    duration: float
    pause_type: str
    confidence: float
    features: Dict[str, Any] = field(default_factory=dict)
    cut_point: float = 0.0
    quality_grade: str = "A"


def _runs(mask: np.ndarray) -> np.ndarray:
    edges = np.diff(mask.astype(np.int8), prepend=0, append=0)
    starts = np.nonzero(edges == 1)[0]
    ends = np.nonzero(edges == -1)[0]
    return np.stack([starts, ends], axis=1) if starts.size else np.zeros((0, 2), dtype=np.int64)


def _fill_short_false_runs(mask: np.ndarray, max_len: int) -> np.ndarray:
    out = mask.copy()
    for s, e in _runs(~mask):
        if e - s <= max_len:
            out[s:e] = True
    return out


def _drop_short_true_runs(mask: np.ndarray, max_len: int) -> np.ndarray:
    out = mask.copy()
    for s, e in _runs(mask):
        if e - s <= max_len:
            out[s:e] = False
    return out


def _focus_mask(n: int, fps: float, windows: Optional[List[Tuple[float, float]]]) -> Optional[np.ndarray]:
    if not windows:
        return None
    t = np.arange(n) / fps
    m = np.zeros(n, dtype=bool)
    for a, b in windows:
        if b > a:
            m |= (t >= a) & (t <= b)
    return m if m.any() else None


class PureVocalPauseDetector:
    VALLEY_HOP_S = 0.01
    VALLEY_FRAME_S = 0.025
    VALLEY_MIN_PAUSE_S = 0.2  # scan-level floor; config min_pause applied later

    def __init__(self, sample_rate: int) -> None:
        self.sr = int(sample_rate)
        self.hop = max(1, int(round(self.VALLEY_HOP_S * self.sr)))
        self.frame = max(self.hop, int(round(self.VALLEY_FRAME_S * self.sr)))

    # -- public ------------------------------------------------------------

    def detect_pure_vocal_pauses(
        self,
        vocal_audio: Optional[np.ndarray],
        features: Optional[TrackFeatures] = None,
        focus_windows: Optional[List[Tuple[float, float]]] = None,
        enable_mdd: bool = True,
        rms_env: Optional[np.ndarray] = None,
        env_db_grid: Optional[np.ndarray] = None,
        env_db_stride: int = 1,
        n_samples: Optional[int] = None,
    ) -> List[PureVocalPause]:
        """``rms_env`` (10 ms grid) and ``env_db_grid`` (decimated fine dB)
        may be supplied by the fused DetectionBundle to avoid re-running
        the envelope kernels. With both supplied, ``vocal_audio`` may be
        None (pass ``n_samples``): the whole detector then runs from
        device-computed envelopes without a host waveform copy."""
        cfg = get_config("v2_mdd.pure_vocal_detection", {}) or {}
        n_wave = int(n_samples) if n_samples is not None else (
            vocal_audio.size if vocal_audio is not None else 0
        )
        if not cfg.get("enable", True) or n_wave == 0:
            return []
        if vocal_audio is None and (rms_env is None or env_db_grid is None):
            raise ValueError("vocal_audio=None requires rms_env and env_db_grid")

        stats = AdaptStats(
            bpm=features.bpm if features else None,
            global_mdd=float(np.mean(features.mdd)) if features is not None and features.mdd.size else None,
        )
        thresholds = resolve_threshold(
            float(cfg.get("peak_relative_threshold_ratio", 0.26)),
            cfg.get("relative_threshold_adaptation", {}),
            stats,
        )

        # device pass: whole-track fine-grained RMS envelope (or reuse bundle)
        if rms_env is not None:
            rms = np.asarray(rms_env)
        else:
            rms = np.asarray(frame_rms(jnp.asarray(vocal_audio, dtype=jnp.float32), self.frame, self.hop))
        fps = self.sr / self.hop

        # VPP multiplier from in-song rest statistics
        vpp_mult, vpp_log = (1.0, "VPP{disabled}")
        if (cfg.get("pause_stats_adaptation", {}) or {}).get("enable", True):
            vpp_mult, vpp_log = self._estimate_vpp_multiplier(rms, fps, cfg, focus_windows)
        logger.info("%s -> multiplier %.3f", vpp_log, vpp_mult)

        peak_ratio = float(np.clip(thresholds.peak_ratio * vpp_mult, 0.05, 0.6))
        rms_ratio = float(np.clip(thresholds.rms_ratio * vpp_mult, peak_ratio + 0.02, 0.72))

        pauses = self._detect_energy_valleys(rms, fps, peak_ratio, rms_ratio, cfg, features, focus_windows)
        if not cfg.get("enable_relative_energy_mode", True) and vocal_audio is None:
            raise ValueError(
                "legacy multi-feature mode (enable_relative_energy_mode=false) "
                "needs the vocal waveform; pass vocal_audio"
            )
        if not cfg.get("enable_relative_energy_mode", True):
            # legacy multi-feature mode: rescore valleys by voicing/formant/
            # spectral/duration evidence (reference pure_vocal_pause_detector
            # :410-459, 618-844 — pyin F0 + LPC formants + centroid +
            # harmonic ratio; here the voicing/formant evidence comes from
            # the spectral flatness + band statistics already in features)
            pauses = self._apply_multi_feature_scoring(pauses, vocal_audio, cfg, features)
        pauses = self._compress(pauses, cfg)
        pauses = self._total_valley_cap(pauses, n_wave / self.sr)
        if enable_mdd and features is not None:
            pauses = self._apply_mdd_enhancement(pauses, features, focus_windows)
        pauses = self._calculate_precise_cut_points(
            pauses, vocal_audio, env_db_grid=env_db_grid, env_db_stride=env_db_stride,
            n_samples=n_wave,
        )
        # final min-pause filter at the configured duration
        min_pause = resolve_min_pause(
            float(cfg.get("min_pause_duration", 0.5)), 1.0, stats
        )
        return [p for p in pauses if p.duration >= min(min_pause, 0.5) or p.pause_type.startswith("energy_valley")]

    # -- valley scan ---------------------------------------------------------

    def _detect_energy_valleys(
        self,
        rms: np.ndarray,
        fps: float,
        peak_ratio: float,
        rms_ratio: float,
        cfg: Dict[str, Any],
        features: Optional[TrackFeatures],
        focus_windows: Optional[List[Tuple[float, float]]],
    ) -> List[PureVocalPause]:
        if rms.size == 0:
            return []
        peak_thr = float(rms.max()) * peak_ratio
        avg_thr = float(rms.mean()) * rms_ratio
        threshold = min(peak_thr, avg_thr)

        low = rms < threshold
        fmask = _focus_mask(low.size, fps, focus_windows)
        if fmask is not None:
            low &= fmask

        vs = cfg.get("valley_scoring", {}) or {}
        w_len = float(vs.get("w_len", 0.7))
        w_quiet = float(vs.get("w_quiet", 0.3))
        w_flat = float(vs.get("w_flat", 0.5))

        min_frames = max(1, int(round(self.VALLEY_MIN_PAUSE_S * fps)))
        pauses: List[PureVocalPause] = []
        for s, e in _runs(low):
            if e - s < min_frames:
                continue
            start_t, end_t = s / fps, e / fps
            duration = end_t - start_t
            valley_energy = float(rms[s:e].mean())

            len_score = float(np.clip((duration - 0.20) / (1.50 - 0.20), 0.0, 1.0))
            quiet_score = float(np.clip(1.0 - valley_energy / max(threshold, 1e-12), 0.0, 1.0))
            flat_hint = 0.5
            if features is not None and features.flatness.size:
                st = features.window_stats("flatness", start_t, end_t)
                flat_hint = float(np.clip(1.0 - st["mean"], 0.0, 1.0))
            confidence = float(np.clip(w_len * len_score + w_quiet * quiet_score + w_flat * flat_hint, 0.1, 0.99))

            pauses.append(PureVocalPause(
                start_time=start_t,
                end_time=end_t,
                duration=duration,
                pause_type="energy_valley",
                confidence=confidence,
                features={"energy": valley_energy, "threshold": threshold},
                cut_point=(start_t + end_t) / 2.0,
            ))
        return pauses

    def _apply_multi_feature_scoring(
        self,
        pauses: List[PureVocalPause],
        vocal_audio: np.ndarray,
        cfg: Dict[str, Any],
        features: Optional[TrackFeatures],
    ) -> List[PureVocalPause]:
        """Legacy weighted multi-feature confidence.

        Feature parity with the reference's pyin/LPC mode (reference
        pure_vocal_pause_detector.py:410-459, 618-844):
        f0 evidence = absence of VOICED frames inside the pause (batched YIN
        with Viterbi pitch tracking, ops/voice.yin_f0), formant evidence =
        absence of vocal-tract resonance (LPC residual via Levinson-Durbin,
        ops/voice.lpc_formant_strength), spectral evidence = how noise-like
        (flat) the pause is, duration evidence = longer pauses cut better.
        Both device kernels run ONCE over the whole track, not per pause.
        """
        if not pauses:
            return pauses
        from audio_cut_tpu.ops.voice import (  # noqa: PLC0415 (lazy: legacy mode only)
            lpc_formant_frequencies,
            lpc_formant_strength,
            yin_f0,
        )

        w_f0 = float(cfg.get("f0_weight", 0.3))
        w_formant = float(cfg.get("formant_weight", 0.25))
        w_spectral = float(cfg.get("spectral_weight", 0.25))
        w_duration = float(cfg.get("duration_weight", 0.2))
        voiced_thr = float(cfg.get("voicing_threshold", 0.55))
        sr = self.sr

        hop_s = self.VALLEY_HOP_S
        _, voicing = yin_f0(vocal_audio, sr, hop_s=hop_s)
        formant = lpc_formant_strength(vocal_audio, sr, hop_s=hop_s)
        vfps = 1.0 / hop_s

        out: List[PureVocalPause] = []
        for p in pauses:
            a = max(0, int(p.start_time * sr))
            b = min(vocal_audio.size, int(p.end_time * sr))
            if b - a < 256:
                out.append(p)
                continue
            fa = int(p.start_time * vfps)
            fb = int(p.end_time * vfps)
            v_seg = voicing[fa:min(fb, voicing.size)]
            f_seg = formant[fa:min(fb, formant.size)]
            # fraction of pause frames where YIN finds a confident pitch
            voiced_frac = float(np.mean(v_seg >= voiced_thr)) if v_seg.size else 0.0
            f0_score = float(np.clip(1.0 - voiced_frac, 0.0, 1.0))
            # vocal-tract resonance left in the pause
            formant_score = float(np.clip(1.0 - f_seg.mean(), 0.0, 1.0)) if f_seg.size else 0.5

            flat_score = 0.5
            if features is not None and features.flatness.size:
                st = features.window_stats("flatness", p.start_time, p.end_time)
                flat_score = float(np.clip(st["mean"], 0.0, 1.0))  # noise-like pause
            dur_score = float(np.clip((p.duration - 0.2) / 1.3, 0.0, 1.0))

            confidence = float(np.clip(
                w_f0 * f0_score + w_formant * formant_score + w_spectral * flat_score
                + w_duration * dur_score,
                0.1, 0.99,
            ))
            feats = {**p.features, "f0_score": f0_score, "formant_score": formant_score,
                     "flatness_score": flat_score, "duration_score": dur_score}
            if formant_score < 0.5:
                # suspicious pause (resonance present): record the resonances
                # for debugging, as the reference logs formant tracks
                feats["formant_freqs_hz"] = [
                    round(float(f), 1)
                    for f in lpc_formant_frequencies(vocal_audio[a:b], sr)[:4]
                ]
            out.append(PureVocalPause(
                start_time=p.start_time, end_time=p.end_time, duration=p.duration,
                pause_type="multi_feature", confidence=confidence,
                features=feats,
                cut_point=p.cut_point, quality_grade=p.quality_grade,
            ))
        return out

    # -- compression / caps ---------------------------------------------------

    @staticmethod
    def _compress(pauses: List[PureVocalPause], cfg: Dict[str, Any]) -> List[PureVocalPause]:
        if not pauses:
            return pauses
        vs = cfg.get("valley_scoring", {}) or {}
        merge_gap = float(vs.get("merge_close_ms", 450)) / 1000.0
        max_raw = int(vs.get("max_raw_candidates", 1200))

        merged: List[PureVocalPause] = []
        for p in sorted(pauses, key=lambda x: x.start_time):
            if merged and p.start_time - merged[-1].end_time <= merge_gap:
                prev = merged[-1]
                end = max(prev.end_time, p.end_time)
                merged[-1] = PureVocalPause(
                    start_time=prev.start_time,
                    end_time=end,
                    duration=end - prev.start_time,
                    pause_type=prev.pause_type,
                    confidence=max(prev.confidence, p.confidence),
                    features=prev.features,
                )
            else:
                merged.append(p)

        if len(merged) > max_raw:
            merged = sorted(merged, key=lambda x: x.confidence, reverse=True)[:max_raw]
            merged.sort(key=lambda x: x.start_time)
        return merged

    @staticmethod
    def _total_valley_cap(pauses: List[PureVocalPause], duration_s: float) -> List[PureVocalPause]:
        """Keep at most duration/segment_min of the quietest valleys."""
        if not pauses:
            return pauses
        seg_min = float(get_config("v2_mdd.quality_control.segment_min_duration", 2.0)) or 2.0
        cap = max(1, int(duration_s // max(seg_min, 1e-6)))
        if len(pauses) <= cap:
            return pauses

        def quietness(p: PureVocalPause) -> Tuple[float, float]:
            thr = float(p.features.get("threshold", 0.0))
            eng = float(p.features.get("energy", 0.0))
            q = thr - eng
            return (q if np.isfinite(q) else 0.0, p.confidence)

        kept = sorted(pauses, key=quietness, reverse=True)[:cap]
        kept.sort(key=lambda p: p.start_time)
        return kept

    # -- MDD enhancement -------------------------------------------------------

    @staticmethod
    def _apply_mdd_enhancement(
        pauses: List[PureVocalPause],
        features: TrackFeatures,
        focus_windows: Optional[List[Tuple[float, float]]] = None,
    ) -> List[PureVocalPause]:
        if not pauses or features.rms.size == 0:
            return pauses
        mcfg = get_config("v2_mdd.musical_dynamic_density", {}) or {}
        w_e = float(mcfg.get("energy_weight", 0.5))
        w_s = float(mcfg.get("spectral_weight", 0.3))
        w_o = float(mcfg.get("onset_weight", 0.2))
        t_mult = float(mcfg.get("threshold_multiplier", 0.2))
        max_mult = float(mcfg.get("max_multiplier", 1.4))
        min_mult = float(mcfg.get("min_multiplier", 0.6))

        rms_max = float(features.rms.max()) or 1.0
        onset_med = float(np.median(features.onset)) + 1e-12
        pad_frames = 10

        fmask = _focus_mask(features.n_frames, features.fps, focus_windows)

        out: List[PureVocalPause] = []
        for p in pauses:
            lo = max(0, features.frame_index(p.start_time) - pad_frames)
            hi = min(features.n_frames, features.frame_index(p.end_time) + pad_frames)
            idx = np.arange(lo, hi)
            if fmask is not None:
                idx = idx[fmask[lo:hi]]
            if idx.size == 0:
                out.append(p)
                continue
            energy_score = float(features.rms[idx].mean()) / rms_max
            spectral_score = 1.0 - float(features.flatness[idx].mean())
            # onset density: count of frames whose onset strength is a clear
            # peak (> 3x median) within the window, saturating at 5
            onset_count = int(np.sum(features.onset[idx] > 3.0 * onset_med))
            onset_score = min(1.0, onset_count / 5.0)

            mdd_score = energy_score * w_e + spectral_score * w_s + onset_score * w_o
            mult = float(np.clip(1.0 + mdd_score * t_mult, min_mult, max_mult))
            out.append(PureVocalPause(
                start_time=p.start_time,
                end_time=p.end_time,
                duration=p.duration,
                pause_type=f"{p.pause_type}_mdd",
                confidence=p.confidence * mult,
                features={**p.features, "mdd_score": mdd_score, "confidence_multiplier": mult},
                cut_point=p.cut_point,
                quality_grade=p.quality_grade,
            ))
        return out

    # -- precise cut points -----------------------------------------------------

    def _calculate_precise_cut_points(
        self,
        pauses: List[PureVocalPause],
        vocal_audio: Optional[np.ndarray],
        env_db_grid: Optional[np.ndarray] = None,
        env_db_stride: int = 1,
        n_samples: Optional[int] = None,
    ) -> List[PureVocalPause]:
        n_wave = int(n_samples) if n_samples is not None else (
            vocal_audio.size if vocal_audio is not None else 0
        )
        if not pauses or n_wave == 0:
            return pauses
        if vocal_audio is None and env_db_grid is None:
            return pauses
        sr = self.sr
        local_ms = float(get_config("vocal_pause_splitting.local_rms_window_ms", 25))
        guard_ms = float(get_config("vocal_pause_splitting.lookahead_guard_ms", 120))
        floor_pct = float(get_config("vocal_pause_splitting.silence_floor_percentile", 5))
        floor_allow = float(get_config("vocal_pause_splitting.silence_floor_allowance", 0.0)) or 1.5

        win = max(1, int(local_ms / 1000.0 * sr))

        if env_db_grid is not None:
            env_db = np.asarray(env_db_grid)
            stride = int(env_db_stride)
        else:
            from audio_cut_tpu.ops.frames import moving_rms_db  # noqa: PLC0415

            env_db = np.asarray(moving_rms_db(jnp.asarray(vocal_audio, dtype=jnp.float32), win))
            stride = 1
        grid_sr = sr / stride
        guard = max(0, int(guard_ms / 1000.0 * grid_sr))
        # 8x-decimated |x| for the silence-floor percentile: pauses span
        # seconds, so full-rate percentiles cost ~0.25 s per track while the
        # decimated distribution is statistically identical for a floor
        dec = 8
        abs_dec = np.abs(vocal_audio[::dec]) if vocal_audio is not None else None
        n_grid = env_db.size
        floor_allow_db = 20.0 * np.log10(max(float(floor_allow), 1e-6))

        for p in pauses:
            a = max(0, int(round(p.start_time * grid_sr)))
            b = min(n_grid, int(round(p.end_time * grid_sr)))
            if b - a <= 1:
                continue
            cut = a + int(np.argmin(env_db[a:b]))
            if guard > 0:
                g_end = min(n_grid, cut + guard)
                if g_end > cut:
                    cut = cut + int(np.argmin(env_db[cut:g_end]))
            cut_sample = min(n_wave - 1, cut * stride)
            if abs_dec is not None:
                da = max(0, int(round(p.start_time * sr / dec)))
                db_ = min(abs_dec.size, int(round(p.end_time * sr / dec)))
                floor_val = float(np.percentile(abs_dec[da:db_], floor_pct)) if db_ > da else 0.0
                fallback = floor_val > 0.0 and abs(float(vocal_audio[cut_sample])) > floor_val * floor_allow
            else:
                # waveform-free path: the same silence-floor check in the dB
                # domain over the decimated envelope — "is the chosen cut
                # quiet relative to this pause's own noise floor" — using the
                # short-window RMS at the cut instead of the instantaneous
                # sample (more robust near zero crossings of loud regions)
                floor_db = float(np.percentile(env_db[a:b], floor_pct))
                fallback = float(env_db[cut]) > floor_db + floor_allow_db
            if fallback:
                sa = max(0, int(round(p.start_time * sr)))
                sb = min(n_wave, int(round(p.end_time * sr)))
                cut_sample = sa + (sb - sa) // 2
            p.cut_point = cut_sample / float(sr)
            p.quality_grade = "B" if fallback else "A"
        return pauses

    # -- VPP ---------------------------------------------------------------------

    def _estimate_vpp_multiplier(
        self,
        rms: np.ndarray,
        fps: float,
        cfg: Dict[str, Any],
        focus_windows: Optional[List[Tuple[float, float]]],
    ) -> Tuple[float, str]:
        """Vocal Pause Profile: classify the song's rest cadence inside
        singing blocks and derive a threshold multiplier."""
        pcfg = cfg.get("pause_stats_adaptation", {}) or {}
        db = 20.0 * np.log10(rms + 1e-12)
        floor_pct = float(get_config("v2_mdd.quality_control.enforce_quiet_cut.floor_percentile", 0.5))
        thr_db = float(np.percentile(db, max(floor_pct, 5.0))) + float(pcfg.get("delta_db", 3.0))
        mask = db > thr_db
        frame_s = 1.0 / fps

        fmask = _focus_mask(mask.size, fps, focus_windows)
        if fmask is not None:
            mask &= fmask
        if not mask.any():
            return 1.0, "VPP{no_active_frames}"

        close_k = max(1, int(float(pcfg.get("morph_close_ms", 150)) / 1000.0 / frame_s))
        open_k = max(1, int(float(pcfg.get("morph_open_ms", 50)) / 1000.0 / frame_s))
        mask = _fill_short_false_runs(mask, close_k)
        mask = _drop_short_true_runs(mask, open_k)

        block_min = max(1, int(float(pcfg.get("sing_block_min_s", 2.0)) / frame_s))
        blocks = [(s, e) for s, e in _runs(mask) if e - s >= block_min]
        if not blocks:
            return 1.0, "VPP{no_singing_blocks}"

        interlude_min = int(float(pcfg.get("interlude_min_s", 4.0)) / frame_s)
        rests: List[float] = []
        total_frames = 0
        for a, b in blocks:
            total_frames += b - a
            for s, e in _runs(~mask[a:b]):
                span = e - s
                if span >= interlude_min:
                    continue
                rests.append(span * frame_s)
        if not rests or total_frames == 0:
            return 1.0, "VPP{no_rests}"

        rests_arr = np.asarray(rests)
        block_minutes = total_frames * frame_s / 60.0
        mpd = float(np.median(rests_arr))
        p95 = float(np.percentile(rests_arr, 95))
        pr = float(rests_arr.size / max(block_minutes, 1e-9))
        rr = float(rests_arr.sum() / (total_frames * frame_s))

        th = pcfg.get("classify_thresholds", {}) or {}
        slow_th = th.get("slow", {"mpd": 0.6, "p95": 1.2, "rr": 0.35})
        fast_th = th.get("fast", {"mpd": 0.25, "pr": 18, "rr": 0.15})
        if mpd >= slow_th.get("mpd", 0.6) or p95 >= slow_th.get("p95", 1.2) or rr >= slow_th.get("rr", 0.35):
            cls = "slow"
        elif (
            mpd <= fast_th.get("mpd", 0.25)
            and pr >= fast_th.get("pr", 18)
            and rr <= fast_th.get("rr", 0.15)
        ):
            cls = "fast"
        else:
            cls = "medium"

        adapt = cfg.get("relative_threshold_adaptation", {}) or {}
        mult = resolve_pause_stats_multiplier(cls, adapt.get("pause_stats_multipliers"))
        return mult, f"VPP{{cls={cls}, mpd={mpd:.2f}, p95={p95:.2f}, pr={pr:.1f}/min, rr={rr:.2f}}}"
