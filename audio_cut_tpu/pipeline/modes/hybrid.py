"""hybrid_mdd mode: v2.2_mdd cuts + beat-snap strategies with _lib tagging.

Parity: reference seamless_splitter.py:1351-1704 (_process_hybrid_mdd_split):
own separation pass, v2.2_mdd sub-run for raw cuts (export 'none'),
BeatAnalyzer over the shared feature cache, strategy cut generation,
re-guard via finalize_cut_points with _lib remap onto the refined cuts
(:2484-2513), classification + micro-merge preserving _lib flags, export
with the lib_suffix, and hybrid metadata in the result dict.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from audio_cut_tpu.analysis.beat_analyzer import BeatAnalyzer
from audio_cut_tpu.analysis.features import build_track_features
from audio_cut_tpu.config import get_config
from audio_cut_tpu.cutting.refine import (
    CutContext,
    CutPoint,
    finalize_cut_points,
    guard_shift_stats,
)
from audio_cut_tpu.io.segment_export import ExportResult
from audio_cut_tpu.pipeline.classify import classify_segments_vocal_presence
from audio_cut_tpu.pipeline.split import split_at_sample_level
from audio_cut_tpu.pipeline.strategies import SegmentationContext, build_strategy

logger = logging.getLogger(__name__)


def process_hybrid_mdd(
    splitter,
    input_path: str,
    output_dir: str,
    *,
    export_plan: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    t0 = time.time()
    sr = splitter.sample_rate
    hcfg = get_config("hybrid_mdd", {}) or {}

    # 1. v2.2_mdd sub-run for the MDD cuts (no export); ask it to stash its
    # device pass so step 2 runs ONE separation+bundle per track. Standalone
    # v2.2_mdd runs never stash (the memo would pin a track's stems in HBM
    # after the call returned).
    splitter._want_fused_pass_memo = True
    base = None
    try:
        base = splitter.split_audio_seamlessly(
            input_path, output_dir, mode="v2.2_mdd", export_plan=("none",)
        )
    finally:
        splitter._want_fused_pass_memo = False
        # the sub-run may have stashed full-track device stems BEFORE
        # failing (success=False or raise): drop them here or they stay
        # pinned in HBM on the splitter (ADVICE r3)
        if base is None or not base.get("success"):
            splitter._fused_pass_memo = None
    if not base.get("success"):
        return base
    mdd_cuts = [
        float(t) for t in base.get("cut_points_sec", [])
        if 0.0 < float(t) < float(base["cut_points_sec"][-1])
    ]

    # reuse the sub-run's device pass when it is for this exact file: the
    # v2.2_mdd sub-run stashes (audio, sep, bundle) one-shot on the splitter
    # (pure_vocal.py), so hybrid runs ONE separation+bundle program per track
    # instead of two
    import os

    audio = sep = bundle = None
    memo = getattr(splitter, "_fused_pass_memo", None)
    if memo is not None:
        splitter._fused_pass_memo = None
        try:
            from audio_cut_tpu.config import get_config_manager

            st = os.stat(input_path)
            key = (os.path.realpath(input_path), st.st_mtime_ns, st.st_size,
                   get_config_manager().generation())
        except OSError:
            key = None
        if key is not None and memo[0] == key:
            _, audio, sep, bundle = memo
    if audio is None:
        audio = splitter._load(input_path)
    duration = len(audio) / float(sr)
    if sep is None:
        # hybrid never exports the instrumental: keep both stems
        # device-resident so vocal_host() stays lazy (ADVICE r2)
        sep = splitter.separator.separate_for_detection(audio, need_instrumental=False)

    def vocal_host() -> np.ndarray:
        # lazy host stem: only fallback paths below ever download it
        return sep.vocal_track if getattr(sep, "has_vocal", False) else audio

    # 2. fused envelope pass + beat analysis over the shared feature grid
    # (same wave-free treatment as the v2.2_mdd path: features, vocal RMS,
    # guard dB lookups all ride one device program + one flat download)
    from audio_cut_tpu.pipeline.modes.pure_vocal import _build_bundle

    qc = get_config("v2_mdd.quality_control", {}) or {}
    eqc = qc.get("enforce_quiet_cut", {}) or {}
    if bundle is None:
        bundle = _build_bundle(splitter, audio, vocal_host, sep, sr, eqc, {})
    features = bundle.features if bundle is not None else build_track_features(audio, sr)
    density = str(hcfg.get("beat_cut_density", "medium"))
    preset = (hcfg.get("density_presets", {}) or {}).get(density, {}) or {}
    analyzer = BeatAnalyzer(
        time_signature=int((hcfg.get("beat_detection", {}) or {}).get("time_signature", 4)),
        energy_percentile=float(preset.get("energy_percentile", 60)),
    )
    beat_analysis = analyzer.analyze(features)

    # 3. strategy cuts
    if bundle is not None:
        vocal_rms = bundle.vocal_rms_grid
    else:
        import jax.numpy as jnp

        from audio_cut_tpu.ops.frames import frame_rms

        hop = max(1, int(round(features.hop_s * sr)))
        vocal_rms = np.asarray(frame_rms(jnp.asarray(vocal_host(), dtype=jnp.float32), 2048, hop))
    strategy = build_strategy(str(hcfg.get("lib_alignment", "snap_to_beat")))
    ctx = SegmentationContext(
        duration_s=duration,
        mdd_cuts=mdd_cuts,
        beat_analysis=beat_analysis,
        features=features,
        vocal_rms=vocal_rms,
        config={
            **hcfg,
            "bars_per_cut": int(preset.get("bars_per_cut", 2)),
        },
    )
    sres = strategy.generate_cut_points(ctx)

    # 4. re-guard strategy cuts, then remap _lib flags onto refined times
    from audio_cut_tpu.cutting.refine import QuietLookup

    vocal_lookup = mix_lookup = None
    if bundle is not None:
        floor_pct = float(eqc.get("floor_percentile", 0.5))
        vocal_lookup = QuietLookup(
            sr=sr, db_grid=bundle.vocal_db_guard, stride=bundle.db_stride,
            floor_db=eqc.get("floor_db_override"), floor_percentile=floor_pct,
        )
        mix_lookup = QuietLookup(
            sr=sr, db_grid=bundle.mix_db_guard, stride=bundle.db_stride,
            floor_db=eqc.get("floor_db_override"), floor_percentile=floor_pct,
        )
    refine_result = finalize_cut_points(
        CutContext(sr=sr, mix_wave=audio,
                   vocal_wave=None if bundle is not None else vocal_host()),
        [CutPoint(t, 0.9 if lib else 0.8, kind="beat" if lib else "pause")
         for t, lib in zip(sres.cuts, sres.lib_flags)],
        min_gap_s=float(qc.get("min_split_gap", 1.2)),
        guard_db=float(eqc.get("guard_db", 1.5)),
        search_right_ms=float(eqc.get("search_right_ms", 450)),
        guard_win_ms=float(eqc.get("win_ms", 80)),
        floor_db=eqc.get("floor_db_override"),
        floor_percentile=float(eqc.get("floor_percentile", 0.5)),
        vocal_lookup=vocal_lookup,
        mix_lookup=mix_lookup,
    )
    final_times = [p.t for p in refine_result.final_points]
    lib_by_raw = {round(t, 4): lib for t, lib in zip(sres.cuts, sres.lib_flags)}
    snap_remap_s = float(hcfg.get("snap_tolerance_ms", 200)) / 1000.0
    raw_arr = np.asarray(sres.cuts) if sres.cuts else np.zeros(0)
    cut_lib_flags: List[bool] = []
    for t in final_times:
        if raw_arr.size:
            j = int(np.argmin(np.abs(raw_arr - t)))
            near = abs(raw_arr[j] - t) <= snap_remap_s
            cut_lib_flags.append(bool(near and lib_by_raw.get(round(float(raw_arr[j]), 4), False)))
        else:
            cut_lib_flags.append(False)

    # 5. classification + sample split (micro-merge happens in split carry)
    cut_samples = sorted({0, len(audio), *(
        int(round(t * sr)) for t in final_times if 0 < int(round(t * sr)) < len(audio)
    )})
    flags, debug = classify_segments_vocal_presence(
        None if bundle is not None else vocal_host(), cut_samples, sr,
        act_rms=bundle.act_rms if bundle is not None else None,
        n_samples=len(audio),
    )
    segments, flags_out, debug_out = split_at_sample_level(
        audio, cut_samples, sr, segment_flags=flags, debug_entries=debug
    )
    flags_out = flags_out or flags
    seg_durations = [len(s) / float(sr) for s in segments]

    # segment-level lib flags: a segment is _lib when its LEFT boundary cut is
    # beat-aligned (reference: segment carries the lib flag of its opening cut)
    seg_lib: List[bool] = []
    for i in range(len(segments)):
        seg_lib.append(bool(cut_lib_flags[i - 1]) if 0 < i <= len(cut_lib_flags) else False)

    # 6. export with lib suffix
    lib_suffix = str((hcfg.get("labeling", {}) or {}).get("lib_suffix", "_lib"))
    export_flags = splitter._normalize_export_plan(export_plan, default=("mix_segments",))
    export_result = ExportResult()
    if "mix_segments" in export_flags:
        export_result.mix_segment_files = splitter.segment_exporter.export_segments(
            segments, output_dir,
            segment_is_vocal=flags_out,
            export_format=splitter._export_format,
            export_options=splitter._export_options,
            lib_flags=seg_lib,
            lib_suffix=lib_suffix,
        )
        export_result.saved_files.extend(export_result.mix_segment_files)

    stats = guard_shift_stats(refine_result.adjustments)
    result = splitter.result_builder.build_base(
        method="hybrid_mdd",
        export_result=export_result,
        export_plan=sorted(export_flags),
        processing_time=time.time() - t0,
        input_path=input_path,
        output_dir=output_dir,
        cut_points_samples=list(cut_samples),
        cut_points_sec=[s / float(sr) for s in cut_samples],
        segment_durations=seg_durations,
        segment_vocal_flags=flags_out,
        precision_guard_ok=splitter.result_builder.check_precision_guard(stats),
        include_precision_guard_threshold=True,
        guard_shift_stats=stats,
        segment_classification_debug=debug_out,
    )
    result = splitter.result_builder.add_hybrid_metadata(
        result,
        lib_flags=seg_lib,
        hybrid_config={
            "beat_cut_density": density,
            "lib_alignment": strategy.name,
            "snap_tolerance_ms": hcfg.get("snap_tolerance_ms", 200),
            "bars_per_cut": int(preset.get("bars_per_cut", 2)),
        },
        beat_analysis=beat_analysis.to_meta(),
        strategy=strategy.name,
    )
    return splitter.result_builder.add_separation_metadata(result, sep)
