"""Fully-fused serving path: separation OLA + detection bundle in ONE program.

The staged path runs two device programs (engine OLA, then the detection
bundle over the resident stems) with a host sync between them — two dispatch
round trips over the tunnel. This composes the engine's OLA graph with the
bundle graph into a single jitted program: one int16 upload, one execution,
one flat download; the stems stay in HBM as outputs of the same program.

Used by the v2.2_mdd-family pipeline when the backend has a batched windows
path and a ConvVAD is active; any failure falls back to the staged path
(pure_vocal._build_bundle), which keeps its own retry/CPU-rebuild chain.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import numpy as np

from audio_cut_tpu.config import get_config

logger = logging.getLogger(__name__)

# compiled fused programs keyed by (backend, geometry, statics, vad arch) —
# module-level so repeat API calls never recompile. Entries retain piece
# layouts (device-resident OLA weight arrays) keyed per backend-instance
# token, so the dict is LRU-bounded like the engine's program cache:
# unbounded growth pins HBM in long-lived processes that rebuild backends
# (config changes, fallback churn).
_FUSED_CACHE: Dict[Any, Any] = {}
_FUSED_CACHE_MAX = 16


def _fused_cache_get(key):
    if key in _FUSED_CACHE:
        val = _FUSED_CACHE.pop(key)
        _FUSED_CACHE[key] = val  # re-insert: dict order == LRU order
        return True, val
    return False, None


def _fused_cache_put(key, val):
    _FUSED_CACHE.pop(key, None)
    _FUSED_CACHE[key] = val
    while len(_FUSED_CACHE) > _FUSED_CACHE_MAX:
        _FUSED_CACHE.pop(next(iter(_FUSED_CACHE)))
    return val


def _fused_fn(engine, padded_len: int, sr: int, statics, vad_model):
    import jax
    import jax.numpy as jnp

    from audio_cut_tpu.analysis.bundle import _bundle_fn
    from audio_cut_tpu.separation.engine import backend_cache_token

    vad_channels = vad_model.net.channels if vad_model is not None else 0
    vad_depth = vad_model.net.depth if vad_model is not None else 0
    vad_context = vad_model.net.context if vad_model is not None else 0
    key = (engine._backend_name, backend_cache_token(engine.backend), sr, padded_len,
           engine.chunk_s, engine.overlap_s, engine.halo_s, engine.align,
           statics, vad_channels, vad_depth, vad_context, vad_model is not None,
           bool(get_config("device_pipeline.pipelined_upload", True)),
           int(get_config("device_pipeline.piece_windows", 2)),
           int(get_config("device_pipeline.max_pieces", 8)))
    hit, val = _fused_cache_get(key)
    if hit:
        return val

    def _bundle_tail(vocal, inst, mix_f32, n_true, vad_params):
        # zero the pad tail: the OLA leaks a little energy past the true
        # track end (iSTFT frame spread), while the staged path re-pads the
        # sliced stem with exact zeros — mask so both paths are bit-equal
        tail = (jnp.arange(padded_len) < n_true).astype(jnp.float32)
        vocal = vocal * tail
        inst = inst * tail
        out = _bundle_fn(mix_f32, vocal, vad_params, sr, *statics,
                         vad_channels, vad_depth, vad_context)
        flat = jnp.concatenate([
            jnp.ravel(out[k]).astype(jnp.float32) for k in sorted(out)
        ])
        return vocal, inst, mix_f32, flat

    layout = engine._piece_layout(padded_len)
    if layout is not None:
        # pipelined pieces: the per-piece uploads/forwards are dispatched by
        # the caller; this program combines them AND runs the bundle — same
        # content as the monolithic fused program, but the dominant int16
        # upload now overlaps the window forwards
        combine = engine._combine_graph(layout)

        def fused_pieces(vs, iss, raws, scale, n_true, vad_params):
            vocal, inst, mix_f32 = combine(vs, iss, raws, scale)
            return _bundle_tail(vocal, inst, mix_f32, n_true, vad_params)

        return _fused_cache_put(key, (jax.jit(fused_pieces), layout["n_chunks"], layout))

    run, n_chunks = engine._ola_graph(padded_len)

    def fused(raw, scale, n_true, vad_params):
        vocal, inst, mix_f32 = run(raw, scale)
        return _bundle_tail(vocal, inst, mix_f32, n_true, vad_params)

    return _fused_cache_put(key, (jax.jit(fused), n_chunks, None))


def separate_and_detect_fused(
    engine,
    vad_model,
    audio: np.ndarray,
    *,
    guard_win_ms: float = 80.0,
    refine_win_ms: float = 5.0,
):
    """Returns (SeparationResult, DetectionBundle) from ONE device program.

    Raises on any failure — callers fall back to the staged path. Stems stay
    device-resident (lazy host copies on the SeparationResult).
    """
    import time

    import jax.numpy as jnp

    from audio_cut_tpu.analysis.bundle import (
        bundle_shapes,
        bundle_statics,
        unpack_bundle,
    )
    from audio_cut_tpu.separation.engine import (
        SeparationResult,
        _platform_of,
        padded_track_len,
    )

    if not hasattr(engine.backend, "separate_windows_fn"):
        raise ValueError(f"backend {engine._backend_name!r} has no batched windows path")

    from audio_cut_tpu.separation.engine import quantize_upload

    engine._ensure_geometry()  # backend-native chunk schedule (neural windows)
    audio = np.asarray(audio, dtype=np.float32)
    n = audio.shape[-1]
    sr = engine.sample_rate
    padded_len = padded_track_len(n, sr, engine.align)
    statics = bundle_statics(sr, guard_win_ms, refine_win_ms)
    fn, n_chunks, layout = _fused_fn(engine, padded_len, sr, statics, vad_model)

    t0 = time.time()
    padded = np.pad(audio, (0, padded_len - n)) if padded_len != n else audio
    if bool(get_config("device_pipeline.upload_int16", True)):
        raw, scale = quantize_upload(padded)
    else:
        raw = padded
        scale = np.float32(1.0)
    vad_params = vad_model.params if vad_model is not None else None
    if layout is not None:
        vs, iss, raw_devs = engine._dispatch_pieces(raw, scale, layout)
        vocal_dev, inst_dev, mix_dev, flat = fn(
            vs, iss, raw_devs, scale, np.int32(n), vad_params
        )
    else:
        vocal_dev, inst_dev, mix_dev, flat = fn(
            jnp.asarray(raw), scale, np.int32(n), vad_params
        )
    # the flat download forces completion of the WHOLE program — it is the
    # only host sync on this path
    flat_host = np.asarray(flat)
    total_ms = round((time.time() - t0) * 1000.0, 3)

    shapes = bundle_shapes(padded_len, sr, statics, vad_model)
    bundle = unpack_bundle(flat_host, shapes, sr, n, statics, vad_model)

    meta = {
        "gpu_pipeline_backend": engine._backend_name,
        "gpu_pipeline_chunks": n_chunks,
        "gpu_pipeline_window_samples": padded_len,
        "gpu_pipeline_compute_ms": total_ms,
        "gpu_pipeline_total_ms": total_ms,
        "gpu_pipeline_device": _platform_of(vocal_dev),
        "gpu_pipeline_mode": ("fused_pipelined_p%d" % len(layout["spans"]))
        if layout is not None else "fused_single_program",
    }
    result = SeparationResult(
        vocal_track=None,
        instrumental_track=None,
        backend_used=engine._backend_name,
        separation_confidence=None,
        device_meta=meta,
    )
    result.vocal_device = vocal_dev[:n]
    result.instrumental_device = inst_dev[:n]
    result.mix_device = mix_dev
    result._mix_energy = float(np.mean(np.square(audio)))
    if bundle.vocal_energy is not None:
        e_mix = result._mix_energy + 1e-12
        ratio = bundle.vocal_energy / e_mix
        result.separation_confidence = float(np.clip(1.0 - abs(ratio - 0.35) / 0.65, 0.1, 0.99))
    return result, bundle
