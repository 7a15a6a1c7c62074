"""v2.2_mdd / vpbd_* pipeline: pure-vocal pause detection -> guards -> layout.

Parity: reference seamless_splitter.py:261-770 (_process_pure_vocal_split):
separation -> VAD focus windows -> PureVocalPauseDetector (+MDD) -> pure-music
span injection -> finalize_cut_points (NMS/zero-cross/guards) -> segment
classification -> layout refinement -> local valley refine -> weak-tail merge
-> sample-exact split -> export -> result dict with guard stats + precision
guard.

vpbd_acoustic / vpbd_asr route candidate generation through the
VocalPhraseBoundaryDetector (unified pool + scorer + DP planner) before the
shared guard/layout/export tail.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from audio_cut_tpu.analysis.features import build_track_features
from audio_cut_tpu.config import get_config
from audio_cut_tpu.cutting.layout import RescueCandidate, refine_layout
from audio_cut_tpu.cutting.refine import (
    CutContext,
    CutPoint,
    finalize_cut_points,
    guard_shift_stats,
)
from audio_cut_tpu.detection.pause_detector import PureVocalPauseDetector
from audio_cut_tpu.detection.vad import EnergyGateDetector, to_focus_windows
from audio_cut_tpu.io.segment_export import ExportResult
from audio_cut_tpu.pipeline.classify import (
    classify_segments_vocal_presence,
    merge_weak_human_tails,
    pure_music_spans,
)
from audio_cut_tpu.pipeline.split import split_at_sample_level

logger = logging.getLogger(__name__)


def process_pure_vocal_split(
    splitter,
    input_path: str,
    output_dir: str,
    *,
    mode: str,
    export_plan: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    t0 = time.time()
    sr = splitter.sample_rate
    audio = splitter._load(input_path)
    duration = len(audio) / float(sr)

    # -- separation + detection envelopes -----------------------------------
    # the learned ConvVAD's resample+forward rides INSIDE the bundle program
    # (parity: reference Silero-first chain, vocal_pause_detector.py:74-123)
    from audio_cut_tpu.models.vad import ConvVAD, build_vad

    export_flags = splitter._normalize_export_plan(export_plan, default=("mix_segments",))
    vad_detector = build_vad(sr)
    vad_model = vad_detector if isinstance(vad_detector, ConvVAD) else None
    qc = get_config("v2_mdd.quality_control", {}) or {}
    eqc = qc.get("enforce_quiet_cut", {}) or {}
    lbr = qc.get("local_boundary_refine", {}) or {}

    # preferred: separation OLA + detection bundle as ONE device program
    # (one upload, one execution, one flat download); any failure falls back
    # to the staged two-program path with its retry/CPU-rebuild chain
    sep = bundle = None
    if bool(get_config("device_pipeline.fused_program", True)):
        try:
            from audio_cut_tpu.separation.fused import separate_and_detect_fused

            sep, bundle = separate_and_detect_fused(
                splitter.separator, vad_model, audio,
                guard_win_ms=float(eqc.get("win_ms", 80)),
                refine_win_ms=float(lbr.get("window_ms", 5)),
            )
        except Exception as exc:
            logger.warning("fused single-program path unavailable (%s); staged path", exc)
            sep = bundle = None
    if sep is None:
        # stems stay device-resident even when full_instrumental is in the
        # export plan: the vocal downloads once (other exporters need it
        # anyway) and the instrumental is reconstructed host-side as
        # mix - vocal at export time (complement invariant; one transfer
        # instead of a stacked two-stem pull)
        sep = splitter.separator.separate_for_detection(audio, need_instrumental=False)
    vocal_dev = getattr(sep, "vocal_device", None)

    def vocal_host() -> np.ndarray:
        """Host copy of the vocal stem — LAZY. The default path runs from
        device-resident envelopes; only consumers that genuinely need the
        waveform (legacy detector mode, vocal export, ASR copies, fallback
        kernels) trigger the tunnel download, once."""
        return sep.vocal_track if sep.has_vocal else audio

    if bundle is None:
        bundle = _build_bundle(
            splitter, audio, vocal_host, sep, sr, eqc, lbr, vad_model=vad_model,
        )
    # one-shot share with an enclosing hybrid_mdd run: hybrid re-separates the
    # SAME file immediately after its v2.2_mdd sub-run (the reference's own
    # second separation pass, seamless_splitter.py:1351); stashing the device
    # pass halves hybrid's device work. Keyed by file identity; consumed
    # (popped) by hybrid so it can never go stale across calls. Only stashed
    # when hybrid asked for it — a standalone run must not pin the track's
    # stems in HBM after it returns.
    if getattr(splitter, "_want_fused_pass_memo", False):
        try:
            import os

            from audio_cut_tpu.config import get_config_manager

            st = os.stat(input_path)
            splitter._fused_pass_memo = (
                (os.path.realpath(input_path), st.st_mtime_ns, st.st_size,
                 get_config_manager().generation()),
                audio, sep, bundle,
            )
        except OSError:
            pass
    features = bundle.features if bundle is not None else _features_fallback(audio, sr)
    if bundle is not None and bundle.vocal_energy is not None and len(audio):
        # refresh confidence from the fused scalar (the engine skipped its
        # own round trip when the host stem stayed on device)
        e_mix = float(np.mean(np.square(audio))) + 1e-12
        ratio = bundle.vocal_energy / e_mix
        sep.separation_confidence = float(np.clip(1.0 - abs(ratio - 0.35) / 0.65, 0.1, 0.99))

    # -- VAD focus windows ----------------------------------------------------
    vad = None
    if isinstance(vad_detector, ConvVAD):
        if bundle is not None and bundle.vad_probs is not None:
            # probs came back in the bundle's flat transfer — zero extra trips
            vad = vad_detector.detect(None, probs=bundle.vad_probs, n_true=len(audio))
        elif vocal_dev is not None:
            # bundle unavailable: fused device program, only probs download
            try:
                vad = vad_detector.detect(None, audio_dev=vocal_dev, n_true=len(audio))
            except Exception as exc:
                logger.warning("device VAD failed (%s); using host waveform path", exc)
    if vad is None:
        # envelope-only when the bundle supplies it: EnergyGateDetector needs
        # no waveform then, so the stem stays device-resident (ADVICE r2)
        rms_env = bundle.vocal_rms_fine if bundle is not None else None
        vad = vad_detector.detect(
            None if rms_env is not None else vocal_host(), rms_env=rms_env
        )
    vad_backend = "conv" if not isinstance(vad_detector, EnergyGateDetector) else "energy_gate"
    acfg = get_config("v2_mdd.advanced_vad", {}) or {}
    focus = to_focus_windows(
        vad.segments,
        duration,
        pad_s=float(acfg.get("focus_window_pad_s", 0.2)),
        merge_gap_s=float(acfg.get("focus_merge_gap_s", 0.12)),
        min_width_s=float(acfg.get("focus_window_min_width_s", 0.0)),
    )
    # real vocal coverage feeds AutoProfile's style estimate (parity:
    # seamless_splitter.py:873 vocal-coverage attach)
    covered = sum(b - a for a, b in vad.segments)
    features.extras["vocal_coverage_ratio"] = min(1.0, covered / max(duration, 1e-9))

    # -- candidates -------------------------------------------------------------
    boundary_detection: Optional[Dict[str, Any]] = None
    lyrics_alignment: Optional[Dict[str, Any]] = None
    note: Optional[str] = None

    vres = None
    auto_profile_meta: Optional[Dict[str, Any]] = None
    if mode in ("vpbd_acoustic", "vpbd_asr"):
        auto_profile_meta = _apply_smart_cut_runtime(features)
        from audio_cut_tpu.detection.vpbd import VocalPhraseBoundaryDetector

        detector = VocalPhraseBoundaryDetector(sr)
        vres = detector.detect(
            mode=mode,
            features=features,
            focus_windows=focus,
            duration_s=duration,
            output_dir=output_dir,
            bundle=bundle,
            vocal_supplier=vocal_host,
            vocal_device=vocal_dev,
        )
        raw_points = [CutPoint(c.t, c.score, kind=c.source.value) for c in vres.selected]
        if not raw_points and vres.plan.rescue_points:
            # planner infeasible: even-division rescue times stand in
            raw_points = [CutPoint(t, 0.5, kind="rescue") for t in vres.plan.rescue_points]
        boundary_detection = vres.to_meta()
        lyrics_alignment = vres.lyrics_alignment
        note = vres.note
    else:
        detector = PureVocalPauseDetector(sr)
        # wave-free when the bundle's envelopes cover the default
        # relative-energy mode; the legacy multi-feature mode needs samples
        pv_cfg = get_config("v2_mdd.pure_vocal_detection", {}) or {}
        wave_free = bundle is not None and bool(
            pv_cfg.get("enable_relative_energy_mode", True)
        )
        pauses = detector.detect_pure_vocal_pauses(
            None if wave_free else vocal_host(),
            features=features, focus_windows=focus, enable_mdd=True,
            rms_env=bundle.vocal_rms_fine if bundle else None,
            env_db_grid=bundle.vocal_db_fine if bundle else None,
            env_db_stride=bundle.db_stride if bundle else 1,
            n_samples=len(audio),
        )
        raw_points = [
            CutPoint(p.cut_point if p.cut_point > 0 else (p.start_time + p.end_time) / 2.0,
                     float(np.clip(p.confidence, 0.0, 1.0)))
            for p in pauses
        ]

    # pure-music span boundaries as extra candidates (intro/interlude/outro)
    for span_start, span_end in pure_music_spans(
        None if bundle is not None else vocal_host(),
        sr, act_rms=bundle.act_rms if bundle else None
    ):
        for t in (span_start, span_end):
            if 0.5 < t < duration - 0.5:
                raw_points.append(CutPoint(float(t), 0.8, kind="music_span"))

    # pre-guard valley snap (vpbd): planner candidates from lyric gaps /
    # sentence ends / beats carry TEXT-derived times (gap midpoints,
    # candidates.py parity) — on separated stems with real vocal decay tails
    # the midpoint sits on the slope, and the quiet guard would drag the cut
    # hundreds of ms rightward (failing the PRD precision gate). Snapping each
    # candidate to the quietest point of the SAME dB grid the guard reads,
    # within the SAME radius the guard searches, leaves the guard provably
    # nothing quieter to find (shift 0) and places the cut at the true
    # acoustic minimum. Min-drop-gated: on clean stems (flat silence in the
    # gap) nothing moves, so pinned-baseline behavior is unchanged. Snapped
    # positions strictly inside recognised ASR words are rejected.
    if vres is not None and bundle is not None and raw_points:
        snap_ms = float(get_config("vpbd.candidate_valley_snap_ms", 450.0))
        if snap_ms > 0:
            wi_snap = None
            timeline_snap = getattr(vres, "timeline", None)
            if timeline_snap is not None and getattr(timeline_snap, "words", None):
                wi_snap = [(w.start_s, w.end_s) for w in timeline_snap.words]
            drop_cfg = get_config("vpbd.candidate_valley_snap_min_drop_db", None)
            raw_points = _valley_snap_points(
                raw_points, bundle.vocal_db_guard, sr, bundle.db_stride,
                radius_ms=snap_ms,
                min_drop_db=(
                    float(drop_cfg) if drop_cfg is not None
                    else float(eqc.get("guard_db", 1.5))
                ),
                word_intervals=wi_snap,
            )
            # keep the manifest self-consistent: downstream bookkeeping
            # (planner final_time_by_raw_time, guard shifts) keys on the
            # SNAPPED times, and api._build_final_cuts joins selected
            # candidates onto final cuts by that key — so the selected
            # entries must carry the snapped time too (original kept as
            # t_detected). raw_points[:len(selected)] is 1:1 with selected;
            # music-span extras sit at the tail.
            if boundary_detection and boundary_detection.get("selected"):
                for entry, pt in zip(boundary_detection["selected"], raw_points):
                    t_new = float(pt.t)
                    if abs(t_new - float(entry.get("t", t_new))) > 1e-9:
                        entry["t_detected"] = entry["t"]
                        entry["t"] = t_new

    # -- guard finalisation -------------------------------------------------------
    from audio_cut_tpu.cutting.refine import QuietLookup

    floor_pct = float(eqc.get("floor_percentile", 0.5))
    vcfg = get_config("v2_mdd.pure_vocal_detection.valley_scoring", {}) or {}
    vocal_lookup = mix_lookup = None
    if bundle is not None:
        vocal_lookup = QuietLookup(
            sr=sr, db_grid=bundle.vocal_db_guard, stride=bundle.db_stride,
            floor_db=eqc.get("floor_db_override"), floor_percentile=floor_pct,
        )
        mix_lookup = QuietLookup(
            sr=sr, db_grid=bundle.mix_db_guard, stride=bundle.db_stride,
            floor_db=eqc.get("floor_db_override"), floor_percentile=floor_pct,
        )
    refine_result = finalize_cut_points(
        # wave-free: the vocal quiet guard runs from the bundle's dB lookup;
        # zero-cross snap happens on the mix (the host input) either way
        CutContext(sr=sr, mix_wave=audio,
                   vocal_wave=None if bundle is not None else vocal_host()),
        raw_points,
        min_gap_s=float(qc.get("min_split_gap", 1.2)),
        max_keep=int(vcfg.get("max_kept_after_nms", 200)) or None,
        topk_per_10s=qc.get("nms_topk_per_10s"),
        guard_db=float(eqc.get("guard_db", 1.5)),
        search_right_ms=float(eqc.get("search_right_ms", 450)),
        guard_win_ms=float(eqc.get("win_ms", 80)),
        floor_db=eqc.get("floor_db_override"),
        floor_percentile=floor_pct,
        enable_mix_guard=bool(eqc.get("enable", True)),
        enable_vocal_guard=bool(eqc.get("enable", True)),
        vocal_lookup=vocal_lookup,
        mix_lookup=mix_lookup,
    )

    cut_times = [p.t for p in refine_result.final_points]
    suppressed_sec = [p.t for p in refine_result.suppressed_points]

    # vpbd_asr: undo guard moves that landed inside a recognised ASR word
    # (reference seamless_splitter.py:484-493 -> :1880-1947)
    if mode == "vpbd_asr" and vres is not None:
        timeline_w = getattr(vres, "timeline", None)
        if timeline_w is not None and getattr(timeline_w, "words", None):
            from audio_cut_tpu.cutting.refine import restore_guards_outside_words

            cut_times, restored_adj, n_restored = restore_guards_outside_words(
                cut_times,
                refine_result.adjustments,
                [(w.start_s, w.end_s) for w in timeline_w.words],
                duration_s=duration,
                sr=sr,
                min_gap_s=float(qc.get("min_split_gap", 1.2)),
            )
            if restored_adj is not None:
                refine_result.adjustments = restored_adj
                logger.info("guard restore outside ASR words: %d boundaries", n_restored)

    if vres is not None and boundary_detection is not None:
        from audio_cut_tpu.cutting.planner import apply_guard_shift_metadata

        plan_with_shifts = apply_guard_shift_metadata(vres.plan, refine_result.adjustments)
        boundary_detection["planner"] = dict(plan_with_shifts.metadata)

    # ASR priors shared by layout rescue scoring AND the local valley refine
    # (reference passes protected_intervals_s into both, :547-585, :619-629)
    word_intervals = None
    asr_boundaries = None
    timeline = getattr(vres, "timeline", None) if vres is not None else None
    if timeline is not None and getattr(timeline, "words", None):
        word_intervals = [(w.start_s, w.end_s) for w in timeline.words]
        asr_boundaries = sorted({
            *(s.start_s for s in timeline.sentences),
            *(s.end_s for s in timeline.sentences),
        })

    # -- layout refinement ------------------------------------------------------
    layout_cfg = get_config("v2_mdd.segment_layout", {}) or {}
    layout_applied = False
    if layout_cfg.get("enable", True) and cut_times:
        if bundle is not None:
            vocal_rms = bundle.vocal_rms_grid
        else:
            from audio_cut_tpu.ops.frames import frame_rms as _frame_rms  # noqa: PLC0415
            import jax.numpy as jnp  # noqa: PLC0415

            hop = max(1, int(round(features.hop_s * sr)))
            vocal_rms = np.asarray(_frame_rms(jnp.asarray(vocal_host(), dtype=jnp.float32), 2048, hop))
        vocal_rms_db = 20.0 * np.log10(vocal_rms + 1e-12)
        rescue_pool = [
            RescueCandidate(t=p.t, score=p.score) for p in refine_result.suppressed_points
        ]
        # pre-layout segment kinds feed the kind-aware merge costs (reference
        # classifies before layout: seamless_splitter.py:522 -> :552)
        pre_samples = sorted({0, len(audio), *(
            int(round(t * sr)) for t in cut_times if 0 < int(round(t * sr)) < len(audio)
        )})
        pre_flags, _ = classify_segments_vocal_presence(
            None if bundle is not None else vocal_host(), pre_samples, sr,
            act_rms=bundle.act_rms if bundle else None, n_samples=len(audio),
        )
        segment_kinds = ["human" if f else "music" for f in pre_flags]
        lres = refine_layout(
            cut_times,
            duration,
            config=layout_cfg,
            features=features,
            vocal_rms_db=vocal_rms_db,
            beat_times=features.beat_times,
            suppressed=rescue_pool,
            segment_kinds=segment_kinds,
            word_intervals=word_intervals,
            asr_boundaries=asr_boundaries,
        )
        cut_times = lres.cut_times
        layout_applied = True

    # -- local valley boundary refine ----------------------------------------------
    if lbr.get("enable", True) and cut_times:
        cut_times = _local_valley_refine(
            cut_times, audio, sr,
            radius_ms=float(lbr.get("search_radius_ms", 500)),
            window_ms=float(lbr.get("window_ms", 5)),
            min_drop_db=float(lbr.get("min_drop_db", 5.0)),
            db_grid=bundle.mix_db_refine if bundle else None,
            db_stride=bundle.db_stride if bundle else 1,
            # protect recognised words: a refined position must not move a
            # boundary (incl. just-restored ones) back inside a word
            # (reference _refine_boundaries_local_valley protected_intervals_s,
            # seamless_splitter.py:619-629; ADVICE r2)
            word_intervals=word_intervals,
        )

    # -- classification + weak-tail merge -------------------------------------------
    cut_samples = sorted({0, len(audio), *(
        int(round(t * sr)) for t in cut_times if 0 < int(round(t * sr)) < len(audio)
    )})
    flags, debug = classify_segments_vocal_presence(
        None if bundle is not None else vocal_host(), cut_samples, sr,
        act_rms=bundle.act_rms if bundle else None, n_samples=len(audio),
    )
    cut_samples, flags, debug = merge_weak_human_tails(list(cut_samples), flags, debug, sr)

    # single-segment fallback (reference :2682-2747)
    if len(cut_samples) < 3:
        cut_samples = [0, len(audio)]
        if not flags:
            flags = [True]
            debug = [{"index": 0, "decision": True, "reason": "single_segment_fallback"}]
        note = note or "single_segment_fallback"

    # -- split + export ---------------------------------------------------------------
    segments, flags_out, debug_out = split_at_sample_level(
        audio, cut_samples, sr, segment_flags=flags, debug_entries=debug
    )
    flags_out = flags_out or flags
    seg_durations = [len(s) / float(sr) for s in segments]

    export_result = ExportResult()
    if "mix_segments" in export_flags:
        export_result.mix_segment_files = splitter.segment_exporter.export_segments(
            segments, output_dir,
            segment_is_vocal=flags_out,
            export_format=splitter._export_format,
            export_options=splitter._export_options,
        )
        export_result.saved_files.extend(export_result.mix_segment_files)
    if "vocal_segments" in export_flags and sep.vocal_track is not None:
        vsegs, _, _ = split_at_sample_level(sep.vocal_track, cut_samples, sr)
        export_result.vocal_segment_files = splitter.segment_exporter.export_segments(
            vsegs, output_dir,
            segment_is_vocal=flags_out,
            export_format=splitter._export_format,
            export_options=splitter._export_options,
            subdir="segments_vocal",
            file_suffix="_vocal",
        )
        export_result.saved_files.extend(export_result.vocal_segment_files)
    if "full_vocal" in export_flags and sep.vocal_track is not None:
        dur = len(sep.vocal_track) / float(sr)
        export_result.full_vocal_file = splitter.segment_exporter.export_full_track(
            sep.vocal_track,
            Path(output_dir) / f"{Path(input_path).stem}_vocal_{dur:.1f}",
            export_format=splitter._export_format,
            export_options=splitter._export_options,
        )
        export_result.saved_files.append(export_result.full_vocal_file)
    if (
        "full_instrumental" in export_flags
        and sep.complement_instrumental(audio) is not None  # host mix - vocal
    ):
        instrumental = sep.instrumental_track
        dur = len(instrumental) / float(sr)
        export_result.full_instrumental_file = splitter.segment_exporter.export_full_track(
            instrumental,
            Path(output_dir) / f"{Path(input_path).stem}_instrumental_{dur:.1f}",
            export_format=splitter._export_format,
            export_options=splitter._export_options,
        )
        export_result.saved_files.append(export_result.full_instrumental_file)

    # -- result ----------------------------------------------------------------------
    stats = guard_shift_stats(refine_result.adjustments)
    precision_ok = splitter.result_builder.check_precision_guard(stats)

    result = splitter.result_builder.build_base(
        method=mode,
        export_result=export_result,
        export_plan=sorted(export_flags),
        processing_time=time.time() - t0,
        input_path=input_path,
        output_dir=output_dir,
        cut_points_samples=list(cut_samples),
        cut_points_sec=[s / float(sr) for s in cut_samples],
        segment_durations=seg_durations,
        segment_vocal_flags=flags_out,
        precision_guard_ok=precision_ok,
        include_precision_guard_threshold=True,
        guard_shift_stats=stats,
        guard_adjustments=[a.to_dict() for a in refine_result.adjustments],
        segment_classification_debug=debug_out,
        lyrics_alignment=lyrics_alignment,
        boundary_detection=boundary_detection,
        suppressed_cut_points_sec=suppressed_sec,
    )
    result["segment_layout_applied"] = layout_applied
    result["vad_backend"] = vad_backend
    if note:
        result["note"] = note
    if auto_profile_meta is not None:
        result["auto_profile"] = auto_profile_meta
    return splitter.result_builder.add_separation_metadata(result, sep)


def _apply_smart_cut_runtime(features) -> Optional[Dict[str, Any]]:
    """Resolve the v2.8 intent surface into runtime overrides.

    Parity: reference seamless_splitter.py:772-848 (_apply_smart_cut_runtime):
    intent resolve -> AutoProfile estimate_style (profile=auto) or explicit
    style profile -> alignment-pole lerp -> set_runtime_config.
    """
    from audio_cut_tpu.config import get_config, get_runtime_override_keys, set_runtime_config
    from audio_cut_tpu.config.auto_profile import (
        build_auto_profile_overrides,
        derive_alignment_overrides,
        derive_smart_cut_overrides,
        estimate_style,
        profile_override_map,
        resolve_smart_cut_intent,
    )

    smart_cut = get_config("smart_cut", {}) or {}
    explicit = get_runtime_override_keys()
    try:
        intent = resolve_smart_cut_intent(smart_cut, explicit_keys=explicit)
    except ValueError as exc:
        logger.warning("invalid smart_cut intent (%s); using defaults", exc)
        return None

    overrides: Dict[str, Any] = {}
    meta: Dict[str, Any] = {"intent": intent}

    profile = intent["profile"]
    if profile == "auto":
        est = estimate_style(features)
        auto = build_auto_profile_overrides(est, cut_style=str(smart_cut.get("cut_style", "natural")))
        meta["auto_profile"] = auto.pop("meta.auto_profile", {})
        auto.pop("meta.profile", None)
        overrides.update(auto)
    elif profile in ("ballad", "pop", "edm", "rap"):
        try:
            overrides.update(profile_override_map(profile))
            meta["profile"] = profile
        except FileNotFoundError:
            logger.warning("unknown style profile %r", profile)

    style_weights = get_config("phrase_boundary.weights", {}) or {}
    for key, value in list(overrides.items()):
        if key.startswith("phrase_boundary.weights."):
            style_weights[key.split(".")[-1]] = value
    overrides.update(derive_alignment_overrides(
        intent["alignment"], style_weights,
        alignment_poles=get_config("phrase_boundary.alignment_poles", {}),
    ))
    overrides.update(derive_smart_cut_overrides(smart_cut, explicit_keys=explicit))

    if overrides:
        set_runtime_config(overrides)
    meta["applied_override_count"] = len(overrides)
    return meta


def _features_fallback(audio: np.ndarray, sr: int):
    """Per-stage feature build when the fused bundle is unavailable.

    Mirrors the reference's whole-track fallback (features_cache.py:483
    build_feature_cache) with the same device-runtime resilience contract as
    the bundle itself: one retry, then CPU execution.
    """
    from audio_cut_tpu.utils.resilience import run_with_device_fallback

    return run_with_device_fallback(
        lambda: build_track_features(audio, sr), label="track_features"
    )


def _build_bundle(splitter, audio, vocal_supplier, sep, sr, eqc, lbr, vad_model=None):
    """Fused detection-envelope pass (see analysis/bundle.py).

    Failure handling (reference analog: ORT CUDA session failure -> CPU
    session rebuild, backends.py:234-244): first attempt reuses the device
    handles left in HBM by the separation OLA; on a device-runtime error the
    rebuild re-uploads FRESH host arrays (a poisoned handle from a wedged
    transfer must not be reused), retries once after a backoff, then runs the
    same program on CPU. Returns None only when every attempt failed — the
    caller then falls back to per-stage kernels.
    """
    from audio_cut_tpu.utils.resilience import is_device_runtime_error, run_with_device_fallback

    def attempt(use_sep_handles: bool):
        import jax.numpy as jnp  # noqa: PLC0415

        from audio_cut_tpu.analysis.bundle import build_detection_bundle
        from audio_cut_tpu.analysis.features import pad_to_bucket

        mix_dev = getattr(sep, "mix_device", None) if use_sep_handles else None
        vocal_dev = getattr(sep, "vocal_device", None) if use_sep_handles else None
        if vocal_dev is None:
            vocal_dev = jnp.asarray(pad_to_bucket(vocal_supplier(), sr))
        if mix_dev is None:
            mix_dev = jnp.asarray(pad_to_bucket(audio, sr))
        # both operands must share the padded length
        n_pad = max(mix_dev.shape[-1], vocal_dev.shape[-1])
        if mix_dev.shape[-1] != n_pad:
            mix_dev = jnp.pad(mix_dev, (0, n_pad - mix_dev.shape[-1]))
        if vocal_dev.shape[-1] != n_pad:
            vocal_dev = jnp.pad(vocal_dev, (0, n_pad - vocal_dev.shape[-1]))
        return build_detection_bundle(
            mix_dev, vocal_dev, sr, len(audio),
            guard_win_ms=float(eqc.get("win_ms", 80)),
            refine_win_ms=float(lbr.get("window_ms", 5)),
            vad_model=vad_model,
        )

    try:
        return attempt(True)
    except Exception as exc:
        logger.warning(
            "detection bundle failed (%s); rebuilding from host arrays",
            exc, exc_info=not is_device_runtime_error(exc),
        )
    try:
        return run_with_device_fallback(lambda: attempt(False), label="detection_bundle")
    except Exception:
        logger.warning("detection bundle unavailable; falling back to per-stage kernels", exc_info=True)
        return None


def _valley_snap_points(
    points,
    db_grid: np.ndarray,
    sr: int,
    db_stride: int,
    *,
    radius_ms: float,
    min_drop_db: float,
    word_intervals: Optional[List[tuple]] = None,
):
    """Snap each CutPoint's time to the quietest grid point within
    ``±radius_ms``, keeping score/kind. Only moves when the valley is at
    least ``min_drop_db`` quieter than the current position (clean stems
    stay untouched); positions strictly inside an ASR word are rejected.
    Run BEFORE NMS/guards — see the call site for why."""
    word_starts = word_ends = None
    if word_intervals:
        from audio_cut_tpu.cutting.refine import merge_word_intervals

        iv = merge_word_intervals(word_intervals)  # overlapping words happen
        word_starts = np.asarray([a for a, _ in iv])
        word_ends = np.asarray([b for _, b in iv])

    def _inside_word(t: float) -> bool:
        if word_starts is None:
            return False
        k = int(np.searchsorted(word_starts, t, side="right")) - 1
        return k >= 0 and word_starts[k] < t < word_ends[k]

    env_db = np.asarray(db_grid)
    grid_sr = sr / float(db_stride)
    radius = max(1, int(round(radius_ms / 1000.0 * grid_sr)))
    n = env_db.size
    out = []
    for p in points:
        idx = int(np.clip(round(p.t * grid_sr), 0, n - 1))
        lo = max(0, idx - radius)
        hi = min(n, idx + radius)
        best = int(np.argmin(env_db[lo:hi])) + lo
        t_best = best / grid_sr
        if env_db[idx] - env_db[best] >= min_drop_db and not _inside_word(t_best):
            out.append(type(p)(float(t_best), p.score, kind=p.kind))
        else:
            out.append(p)
    return out


def _local_valley_refine(
    cut_times: List[float],
    audio: np.ndarray,
    sr: int,
    *,
    radius_ms: float,
    window_ms: float,
    min_drop_db: float,
    db_grid: Optional[np.ndarray] = None,
    db_stride: int = 1,
    word_intervals: Optional[List[tuple]] = None,
) -> List[float]:
    """Move each cut to a nearby strictly-quieter local valley.

    Parity: reference seamless_splitter.py:2613-2680. When ``word_intervals``
    (recognised ASR words) is given, a refined position that lands STRICTLY
    inside a word is rejected and the original boundary kept.
    """
    if not cut_times:
        return cut_times

    word_starts = word_ends = None
    if word_intervals:
        from audio_cut_tpu.cutting.refine import merge_word_intervals

        iv = merge_word_intervals(word_intervals)  # overlapping words happen
        word_starts = np.asarray([a for a, _ in iv])
        word_ends = np.asarray([b for _, b in iv])

    def _inside_word(t: float) -> bool:
        if word_starts is None:
            return False
        k = int(np.searchsorted(word_starts, t, side="right")) - 1
        return k >= 0 and word_starts[k] < t < word_ends[k]
    if db_grid is not None:
        env_db = np.asarray(db_grid)
        grid_sr = sr / float(db_stride)
    else:
        import jax.numpy as jnp  # noqa: PLC0415

        from audio_cut_tpu.ops.frames import moving_rms_db  # noqa: PLC0415

        win = max(1, int(round(window_ms / 1000.0 * sr)))
        env_db = np.asarray(moving_rms_db(jnp.asarray(audio, dtype=jnp.float32), win))
        grid_sr = float(sr)
    radius = max(1, int(round(radius_ms / 1000.0 * grid_sr)))
    n = env_db.size

    out: List[float] = []
    for t in cut_times:
        idx = int(np.clip(round(t * grid_sr), 0, n - 1))
        lo = max(0, idx - radius)
        hi = min(n, idx + radius)
        best = int(np.argmin(env_db[lo:hi])) + lo
        t_best = best / grid_sr
        if env_db[idx] - env_db[best] >= min_drop_db and not _inside_word(t_best):
            out.append(t_best)
        else:
            out.append(t)
    return sorted(out)
