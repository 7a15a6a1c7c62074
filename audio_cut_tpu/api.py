"""Public library API: separate_and_segment -> SegmentManifest dict.

Contract parity: reference src/audio_cut/api.py:31-131 (signature and
behavior) and :178-263 (manifest schema: version/job/audio(sha256)/layout_cfg/
cuts(final+samples+suppressed)/segments(+lyrics attach)/artifacts/guard/
separation/timings/stats/qa_report/gpu).
"""

from __future__ import annotations

import copy
import hashlib
import json
import logging
from pathlib import Path
from typing import Any, Dict, List, Mapping, MutableMapping, Optional, Sequence

from audio_cut_tpu.config import get_config_manager
from audio_cut_tpu.config.manager import get_nested, set_nested
from audio_cut_tpu.pipeline.qa import build_qa_report
from audio_cut_tpu.pipeline.splitter import SmartSplitter

logger = logging.getLogger(__name__)


def _apply_call_overrides(mgr, *, device, strict_gpu, layout, overrides) -> None:
    """Apply one call's device/layout/dotted overrides onto ``mgr.config``.

    Shared by ``separate_and_segment`` and ``separate_and_segment_batch`` so
    single and batch runs of the same track resolve IDENTICAL configs (the
    batch cut-parity contract). Callers snapshot/restore ``mgr.config``
    around the call.
    """
    if device:
        set_nested(mgr.config, "gpu_pipeline.prefer_device", device)
    if strict_gpu is not None:
        set_nested(mgr.config, "gpu_pipeline.strict_gpu", bool(strict_gpu))
    if layout:
        ld = dict(layout)
        set_nested(mgr.config, "segment_layout.enable", bool(ld.pop("enable", True)))
        for k, v in ld.items():
            set_nested(mgr.config, f"segment_layout.{k}", v)
    for dotted, value in (overrides or {}).items():
        set_nested(mgr.config, dotted, value)


def separate_and_segment(
    *,
    input_uri: str,
    export_dir: str,
    mode: Optional[str] = None,
    segments: Any = None,
    alignment: Any = None,
    device: Optional[str] = None,
    export_types: Optional[Sequence[str]] = None,
    layout: Optional[Mapping[str, Any]] = None,
    strict_gpu: Optional[bool] = None,
    export_manifest: bool = False,
    manifest_filename: str = "SegmentManifest.json",
    runtime_overrides: Optional[Mapping[str, Any]] = None,
) -> Dict[str, Any]:
    """Separate + segment + layout-refine one track and emit a manifest."""
    input_path = Path(input_uri).expanduser().resolve()
    if not input_path.exists():
        raise FileNotFoundError(f"input audio not found: {input_path}")
    export_path = Path(export_dir).expanduser().resolve()
    export_path.mkdir(parents=True, exist_ok=True)

    has_intent = segments is not None or alignment is not None
    effective_mode = mode or ("vpbd_asr" if has_intent else "v2.2_mdd")

    overrides: Dict[str, Any] = {}
    if has_intent:
        overrides.update({
            "lyrics_alignment.enabled": True,
            "lyrics_alignment.provider": "auto",
            "lyrics_alignment.strict": False,
        })
        if segments is not None:
            overrides["smart_cut.segments"] = segments
        if alignment is not None:
            overrides["smart_cut.alignment"] = alignment
    if runtime_overrides:
        overrides.update(dict(runtime_overrides))

    mgr = get_config_manager()
    snapshot = copy.deepcopy(mgr.config)
    intent_echo: Optional[Dict[str, Any]] = None
    try:
        _apply_call_overrides(mgr, device=device, strict_gpu=strict_gpu,
                              layout=layout, overrides=overrides)

        layout_cfg = copy.deepcopy(get_nested(mgr.config, "segment_layout", {}) or {})
        sample_rate = int(get_nested(mgr.config, "audio.sample_rate", 44100))
        channels = int(get_nested(mgr.config, "audio.channels", 1))

        if has_intent:
            try:
                from audio_cut_tpu.config.auto_profile import resolve_smart_cut_intent

                intent_echo = resolve_smart_cut_intent(get_nested(mgr.config, "smart_cut", {}) or {})
            except ImportError:
                intent_echo = None

        splitter = SmartSplitter(sample_rate=sample_rate)
        result = splitter.split_audio_seamlessly(
            str(input_path),
            str(export_path),
            mode=effective_mode,
            export_plan=list(export_types) if export_types is not None else None,
        )
        if intent_echo is not None:
            result.setdefault("intent", intent_echo)
    finally:
        mgr.config = snapshot

    manifest = _build_manifest(
        result=result,
        input_path=input_path,
        export_dir=export_path,
        mode=effective_mode,
        sample_rate=sample_rate,
        channels=channels,
        layout_cfg=layout_cfg,
    )
    if export_manifest:
        mpath = export_path / manifest_filename
        mpath.write_text(json.dumps(manifest, ensure_ascii=False, indent=2), encoding="utf-8")
        manifest["manifest_path"] = mpath.as_posix()
    return manifest


def separate_and_segment_batch(
    *,
    input_uris: Sequence[str],
    export_dir: str,
    mode: Optional[str] = None,
    device: Optional[str] = None,
    export_types: Optional[Sequence[str]] = None,
    layout: Optional[Mapping[str, Any]] = None,
    strict_gpu: Optional[bool] = None,
    export_manifest: bool = True,
    manifest_filename: str = "SegmentManifest.json",
    runtime_overrides: Optional[Mapping[str, Any]] = None,
    mesh: Any = None,
    workers: Optional[int] = None,
) -> List[Dict[str, Any]]:
    """Process N tracks across the device mesh: one manifest per track.

    The separation stage — where the FLOPs are — runs ONCE for the whole
    batch, dp-sharded over every mesh device (parallel/batch.py::
    separate_tracks_mesh; each track keeps its single-device OLA plan, so
    stems are bit-identical to per-track runs). Detection/cutting/export
    then run per track on host workers with the stems injected through the
    engine seam (separation/precomputed.PrecomputedStemEngine) — cuts and
    manifests match ``separate_and_segment`` exactly.

    Output layout: ``export_dir/<input-stem>/`` per track (deduplicated with
    numeric suffixes on name collisions), each with its own manifest.

    The reference had no batch product path (one-pipeline-per-GPU,
    sequential; SURVEY §2.11 / §7 step 10) — this is the mesh-native
    replacement. Tracks that fail are reported in their manifest slot as
    ``{"success": False, "error": ...}`` without aborting the batch.
    """
    import numpy as np

    from audio_cut_tpu.io.audio import load_audio

    paths = [Path(u).expanduser().resolve() for u in input_uris]
    for p in paths:
        if not p.exists():
            raise FileNotFoundError(f"input audio not found: {p}")
    export_root = Path(export_dir).expanduser().resolve()
    export_root.mkdir(parents=True, exist_ok=True)

    # per-track export subdirs: input stem, deduplicated
    seen: Dict[str, int] = {}
    subdirs: List[Path] = []
    for p in paths:
        name = p.stem
        k = seen.get(name, 0)
        seen[name] = k + 1
        subdirs.append(export_root / (name if k == 0 else f"{name}_{k}"))

    effective_mode = mode or "v2.2_mdd"

    mgr = get_config_manager()
    snapshot = copy.deepcopy(mgr.config)
    manifests: List[Optional[Dict[str, Any]]] = [None] * len(paths)
    try:
        _apply_call_overrides(mgr, device=device, strict_gpu=strict_gpu,
                              layout=layout, overrides=runtime_overrides)
        # separation already happened on the mesh; the per-track fused
        # separation+detection program would redo it — use the staged
        # bundle path over the injected stems (bit-equal by construction,
        # separation/fused.py::_bundle_tail)
        set_nested(mgr.config, "device_pipeline.fused_program", False)

        layout_cfg = copy.deepcopy(get_nested(mgr.config, "segment_layout", {}) or {})
        sample_rate = int(get_nested(mgr.config, "audio.sample_rate", 44100))
        channels = int(get_nested(mgr.config, "audio.channels", 1))
        backend_name = str(get_nested(
            mgr.config, "enhanced_separation.backend", "spectral"))

        # per-track load: a corrupt file fills its manifest slot, never
        # aborts the batch (contract in the docstring above)
        audios: List[Optional[Any]] = [None] * len(paths)
        for i, p in enumerate(paths):
            try:
                audios[i] = load_audio(str(p), target_sr=sample_rate, mono=True)[0]
            except Exception as exc:
                logger.error("batch track %s failed to load: %s", p, exc)
                manifests[i] = {"success": False, "error": str(exc),
                                "input_file": str(p)}

        # ---- mesh stage: one dp-sharded separation pass over all tracks
        stems: List[Optional[Any]] = [None] * len(paths)
        stem_align = 1
        live = [i for i in range(len(paths)) if audios[i] is not None]
        if live and (effective_mode != "librosa_onset" or bool(get_nested(
                mgr.config, "librosa_onset.use_vocal_separation", True))):
            from audio_cut_tpu.parallel.batch import separate_tracks_mesh
            from audio_cut_tpu.separation.backends import make_backend
            from audio_cut_tpu.separation.engine import SeparationEngine

            # ONE backend instance serves both the mesh pass and the host
            # stage's padding geometry: PrecomputedStemEngine must pad with
            # the same padded_track_len(n, sr, align) the mesh used, or the
            # detection bundle runs at a different compiled length than a
            # single-device run (15 s pad_to_bucket diverges from the
            # engine's long-track buckets past LONG_TRACK_S) and cuts drift.
            bk = make_backend(backend_name, sample_rate)
            probe = SeparationEngine(sample_rate, backend=bk)
            probe._ensure_geometry()
            stem_align = probe.align
            mesh_stems = separate_tracks_mesh(
                [audios[i] for i in live], sample_rate, mesh=mesh, backend=bk)
            for i, pair in zip(live, mesh_stems):
                # instrumental stays unused downstream (modes reconstruct
                # it as mix - vocal); drop it now instead of holding every
                # track's second full-length stem in host RAM
                stems[i] = (pair[0], None) if pair is not None else None

        # ---- host stage: detection/cutting/export per track
        from audio_cut_tpu.separation.precomputed import PrecomputedStemEngine

        def run_one(i: int) -> Dict[str, Any]:
            subdirs[i].mkdir(parents=True, exist_ok=True)
            splitter = SmartSplitter(sample_rate=sample_rate)
            if stems[i] is not None:
                vocal, _inst = stems[i]
                splitter._separator = PrecomputedStemEngine(
                    sample_rate, vocal, None, backend_name,
                    meta={"gpu_pipeline_mode": "mesh_batch_precomputed",
                          "gpu_pipeline_batch_size": len(paths)},
                    align=stem_align,
                )
            result = splitter.split_audio_seamlessly(
                str(paths[i]), str(subdirs[i]), mode=effective_mode,
                export_plan=list(export_types) if export_types is not None else None,
            )
            manifest = _build_manifest(
                result=result, input_path=paths[i], export_dir=subdirs[i],
                mode=effective_mode, sample_rate=sample_rate,
                channels=channels, layout_cfg=layout_cfg,
            )
            if export_manifest:
                mpath = subdirs[i] / manifest_filename
                mpath.write_text(json.dumps(manifest, ensure_ascii=False, indent=2),
                                 encoding="utf-8")
                manifest["manifest_path"] = mpath.as_posix()
            return manifest

        pending = [i for i in range(len(paths)) if manifests[i] is None]
        n_workers = max(1, int(workers)) if workers else 1
        if n_workers == 1:
            for i in pending:
                try:
                    manifests[i] = run_one(i)
                except Exception as exc:  # keep the batch going
                    logger.error("batch track %s failed: %s", paths[i], exc)
                    manifests[i] = {"success": False, "error": str(exc),
                                    "input_file": str(paths[i])}
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=n_workers) as pool:
                futs = {pool.submit(run_one, i): i for i in pending}
                for fut, i in futs.items():
                    try:
                        manifests[i] = fut.result()
                    except Exception as exc:
                        logger.error("batch track %s failed: %s", paths[i], exc)
                        manifests[i] = {"success": False, "error": str(exc),
                                        "input_file": str(paths[i])}
    finally:
        mgr.config = snapshot
    return manifests  # type: ignore[return-value]


# -- manifest -------------------------------------------------------------


def _sha256(path: Path) -> str:
    digest = hashlib.sha256()
    with path.open("rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            digest.update(chunk)
    return digest.hexdigest()


def _rel(path_value: Any, base: Path) -> Optional[str]:
    if not path_value:
        return None
    p = Path(str(path_value))
    try:
        return p.resolve().relative_to(base).as_posix()
    except Exception:
        return p.as_posix()


def _build_final_cuts(result: Mapping[str, Any]) -> List[Any]:
    """Enrich final cut times with planner candidate metadata + guard shifts.

    Parity: reference api.py:308-369 — joins planner final_time_by_raw_time
    and guard_shift_ms_by_raw_time onto cut_points_sec.
    """
    cut_points = list(result.get("cut_points_sec", []))
    bd = result.get("boundary_detection")
    if not isinstance(bd, Mapping):
        return cut_points
    planner = bd.get("planner") if isinstance(bd.get("planner"), Mapping) else {}

    final_by_raw: Dict[float, float] = {}
    for raw, fin in (planner.get("final_time_by_raw_time", {}) or {}).items():
        try:
            final_by_raw[round(float(raw), 6)] = float(fin)
        except (TypeError, ValueError):
            continue

    selected_by_final: Dict[float, Mapping[str, Any]] = {}
    for item in bd.get("selected", []) or []:
        if not isinstance(item, Mapping):
            continue
        try:
            raw_key = round(float(item.get("t")), 6)
        except (TypeError, ValueError):
            continue
        selected_by_final[round(final_by_raw.get(raw_key, raw_key), 6)] = item

    guard_by_final: Dict[float, Any] = {}
    for raw, shift in (planner.get("guard_shift_ms_by_raw_time", {}) or {}).items():
        try:
            raw_key = round(float(raw), 6)
        except (TypeError, ValueError):
            continue
        guard_by_final[round(final_by_raw.get(raw_key, raw_key), 6)] = shift

    if not selected_by_final and not guard_by_final:
        return cut_points

    out: List[Any] = []
    for t in cut_points:
        key = round(float(t), 6)
        entry: Dict[str, Any] = {"t": float(t)}
        cand = selected_by_final.get(key)
        if cand is not None:
            entry["score"] = cand.get("score")
            entry["source"] = cand.get("source")
            entry["features"] = dict(cand.get("features", {}) or {})
            entry["reasons"] = list(cand.get("reasons", []) or [])
            entry["meta"] = dict(cand.get("meta", {}) or {})
        if key in guard_by_final:
            entry["guard_shift_ms"] = guard_by_final[key]
        out.append(entry)
    return out


def _build_segments(result: Mapping[str, Any], export_dir: Path) -> List[Dict[str, Any]]:
    cut_points = list(result.get("cut_points_sec", []))
    labels = list(result.get("segment_labels", []))
    durations = list(result.get("segment_durations", []))
    mix_files = list(result.get("mix_segment_files", []))
    vocal_files = list(result.get("vocal_segment_files", []))
    debug = list(result.get("segment_classification_debug", []))

    segments: List[Dict[str, Any]] = []
    for idx, label in enumerate(labels):
        start = cut_points[idx] if idx < len(cut_points) else sum(durations[:idx])
        end = cut_points[idx + 1] if idx + 1 < len(cut_points) else (
            start + (durations[idx] if idx < len(durations) else 0.0)
        )
        entry: Dict[str, Any] = {
            "id": f"{idx + 1:04d}",
            "start": start,
            "end": end,
            "duration": durations[idx] if idx < len(durations) else end - start,
            "label": label,
        }
        if idx < len(mix_files):
            entry["mix_path"] = _rel(mix_files[idx], export_dir)
        if idx < len(vocal_files):
            entry["vocal_path"] = _rel(vocal_files[idx], export_dir)
        if idx < len(debug) and debug[idx]:
            entry["debug"] = debug[idx]
        segments.append(entry)

    lyrics = result.get("lyrics_alignment")
    if isinstance(lyrics, Mapping) and isinstance(lyrics.get("timeline"), Mapping):
        try:
            from audio_cut_tpu.lyrics.models import LyricsTimeline
            from audio_cut_tpu.lyrics.segment_attach import attach_lyrics_to_segments

            timeline = LyricsTimeline.from_dict(dict(lyrics["timeline"]), strict=False)
            return attach_lyrics_to_segments(segments, timeline)
        except Exception:
            logger.debug("lyrics attach failed", exc_info=True)
    return segments


def _collect_artifacts(result: Mapping[str, Any], export_dir: Path) -> Dict[str, Any]:
    artifacts: Dict[str, Any] = {}
    if result.get("mix_segment_files"):
        artifacts["music_segments"] = [_rel(p, export_dir) for p in result["mix_segment_files"]]
    if result.get("vocal_segment_files"):
        artifacts["human_segments"] = [_rel(p, export_dir) for p in result["vocal_segment_files"]]
    if result.get("full_vocal_file"):
        artifacts["vocal_full"] = _rel(result["full_vocal_file"], export_dir)
    if result.get("full_instrumental_file"):
        artifacts["instrumental_full"] = _rel(result["full_instrumental_file"], export_dir)
    if result.get("saved_files"):
        artifacts["all"] = [_rel(p, export_dir) for p in result["saved_files"]]
    artifacts["output_dir"] = export_dir.as_posix()
    return artifacts


def _estimate_duration(result: Mapping[str, Any], input_path: Path, sample_rate: int) -> Optional[float]:
    cuts = result.get("cut_points_sec")
    if cuts:
        try:
            return float(cuts[-1])
        except (TypeError, ValueError):
            pass
    try:
        from audio_cut_tpu.io.wavio import wav_info

        info = wav_info(input_path)
        if info.frames and info.sample_rate:
            return info.frames / float(info.sample_rate)
    except Exception:
        pass
    durations = result.get("segment_durations")
    if durations:
        try:
            return float(sum(durations))
        except (TypeError, ValueError):
            pass
    return None


def _build_manifest(
    *,
    result: Dict[str, Any],
    input_path: Path,
    export_dir: Path,
    mode: str,
    sample_rate: int,
    channels: int,
    layout_cfg: Mapping[str, Any],
) -> Dict[str, Any]:
    manifest: Dict[str, Any] = {
        "version": str(mode),
        "success": bool(result.get("success", False)),
        "job": {"source": input_path.as_posix()},
        "export_plan": result.get("export_plan") or [],
        "audio": {
            "sr": sample_rate,
            "channels": channels,
            "duration": _estimate_duration(result, input_path, sample_rate),
            "hash": f"sha256:{_sha256(input_path)}",
        },
        "layout_cfg": dict(layout_cfg) | {"applied": bool(result.get("segment_layout_applied", False))},
        "cuts": {
            "final": _build_final_cuts(result),
            "samples": result.get("cut_points_samples", []),
            "suppressed": result.get("suppressed_cut_points_sec", []),
        },
        "segments": _build_segments(result, export_dir),
        "artifacts": _collect_artifacts(result, export_dir),
        "guard": {
            "shift_stats": result.get("guard_shift_stats", {}),
            "adjustments": result.get("guard_adjustments", []),
            "precision_ok": bool(result.get("precision_guard_ok", True)),
            "threshold_ms": result.get("precision_guard_threshold_ms", {}),
        },
        "separation": {
            "backend": result.get("backend_used"),
            "confidence": result.get("separation_confidence"),
        },
        "timings_ms": {
            "total": int(round(float(result["processing_time"]) * 1000.0))
            if result.get("processing_time") is not None else None,
        },
        "stats": {"num_segments": int(result.get("num_segments", 0))},
    }

    for key in ("note", "lyrics_alignment", "boundary_detection", "auto_profile", "intent"):
        if result.get(key) is not None:
            manifest[key] = result[key]

    device_meta = {k: result[k] for k in result if k.startswith("gpu_pipeline_")}
    if device_meta:
        manifest["gpu"] = device_meta

    manifest["qa_report"] = build_qa_report(manifest)

    if result.get("bpm") is not None or result.get("method") == "smart_segment_v2":
        manifest["smart_segmentation"] = {
            "method": result.get("method"),
            "bpm": result.get("bpm"),
            "bar_duration_s": result.get("bar_duration_s"),
            "density": result.get("density"),
            "silence_boundaries": result.get("silence_boundaries", []),
        }
    return manifest


__all__ = ["separate_and_segment"]
