"""Batch + single-track serving scale-out across a device mesh.

The reference's only multi-GPU story was one-pipeline-per-card, sequentially
(SURVEY.md §2.11). Two SPMD paths here:

* ``separate_batch_sharded`` — a batch of tracks dp-sharded over the mesh;
  no collectives (tracks are independent).
* ``separate_track_sp_sharded`` — ONE long track sequence-parallel across
  chips. The engine's chunk schedule already makes windows self-contained
  (each carries its own halo = SURVEY §5 "halo recompute", so no ppermute
  neighbor exchange is needed); windows shard across every mesh device,
  each device runs the separation forward + a local weighted OLA into a
  full-length buffer, and ONE `psum` over ICI assembles the track.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from audio_cut_tpu.parallel.mesh import batch_sharding, make_mesh


def pad_tracks_to_batch(tracks: Sequence[np.ndarray], multiple: int = 4096) -> Tuple[np.ndarray, List[int]]:
    """Right-pad variable-length tracks into one [B, S] batch (+ true lengths)."""
    lengths = [int(t.shape[-1]) for t in tracks]
    target = max(lengths)
    target = ((target + multiple - 1) // multiple) * multiple
    batch = np.zeros((len(tracks), target), dtype=np.float32)
    for i, t in enumerate(tracks):
        batch[i, :t.shape[-1]] = t
    return batch, lengths


def separate_batch_sharded(
    tracks: Sequence[np.ndarray],
    sample_rate: int,
    mesh=None,
    backend: Optional[str] = None,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Separate a batch of tracks, dp-sharded across the mesh.

    Returns [(vocal, instrumental)] per track, trimmed to true lengths.
    """
    import jax
    import jax.numpy as jnp

    from audio_cut_tpu.separation.backends import make_backend
    from audio_cut_tpu.config import get_config

    if mesh is None:
        mesh = make_mesh(dp=len(jax.devices()), sp=1, tp=1)
    dp = mesh.shape["dp"]

    batch, lengths = pad_tracks_to_batch(tracks)
    b, s = batch.shape
    pad_b = (-b) % dp
    if pad_b:
        batch = np.concatenate([batch, np.zeros((pad_b, s), np.float32)], axis=0)

    bk = make_backend(backend or str(get_config("enhanced_separation.backend", "spectral")), sample_rate)

    sharding = batch_sharding(mesh)
    batch_dev = jax.device_put(batch, sharding)

    @jax.jit
    def run(x):
        if hasattr(bk, "separate_windows_fn"):
            return bk.separate_windows_fn(x)
        return jax.vmap(bk.separate_window)(x)

    with mesh:
        v, i = run(batch_dev)
    v = np.asarray(v)
    i = np.asarray(i)
    return [(v[k, :lengths[k]], i[k, :lengths[k]]) for k in range(len(tracks))]


def separate_track_sp_sharded(
    audio: np.ndarray,
    sample_rate: int,
    mesh=None,
    backend: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sequence-parallel separation of ONE long track across the whole mesh.

    Windows from the engine's chunk schedule (fixed shape, halo'd — each is
    self-contained) shard over all mesh devices via shard_map; every device
    runs the batched backend forward on its windows, overlap-adds them into a
    full-length local buffer (zero outside its windows), and one ``psum``
    assembles the track. Scaling: compute is embarrassingly parallel over
    windows; the only communication is a single track-length all-reduce on
    ICI. Replaces the reference's strictly sequential chunk loop
    (enhanced_vocal_separator.py:300-458) at multi-chip scale.
    """
    import jax
    import jax.numpy as jnp
    try:
        from jax import shard_map  # jax >= 0.4.35 stable spelling
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from audio_cut_tpu.config import get_config
    from audio_cut_tpu.separation.backends import make_backend

    if mesh is None:
        mesh = make_mesh(dp=len(jax.devices()), sp=1, tp=1)
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    axes = tuple(mesh.axis_names)

    audio = np.asarray(audio, dtype=np.float32)
    n = audio.shape[-1]
    sr = int(sample_rate)

    # resolve backend + its native geometry exactly as the single-device
    # engine does (SeparationEngine._ensure_geometry), then reuse the
    # engine's shared plan builder so the schedule/weights — and thus the
    # output — match the single-device engine bit-for-bit
    from audio_cut_tpu.separation.engine import (
        PAD_BUCKET_S,
        SeparationEngine,
        ola_plan,
        quantize_upload,
    )

    if backend is None or isinstance(backend, str):
        bk = make_backend(
            backend or str(get_config("enhanced_separation.backend", "spectral")), sr
        )
    else:
        bk = backend
    if not hasattr(bk, "separate_windows_fn"):
        raise ValueError(f"backend {bk.name!r} has no batched windows path")
    eng = SeparationEngine(sr, backend=bk)
    eng._ensure_geometry()
    align = eng.align

    bucket = int(round(PAD_BUCKET_S * sr))
    padded_len = max(bucket, ((n + bucket - 1) // bucket) * bucket)
    padded_len = ((padded_len + align - 1) // align) * align
    plans, window, weights, inv_wsum = ola_plan(
        padded_len, sr, eng.chunk_s, eng.overlap_s, eng.halo_s, align
    )
    n_win = len(plans)

    padded = np.pad(audio, (0, padded_len - n)) if padded_len != n else audio
    if bool(get_config("device_pipeline.upload_int16", True)):
        # mirror the single-device engine's int16 upload quantization so the
        # sp-sharded output matches it bit-for-bit
        raw, scale = quantize_upload(padded)
        padded = raw.astype(np.float32) * scale
    wins = np.stack([padded[p.start:p.start + window] for p in plans])
    starts = np.asarray([p.start for p in plans], dtype=np.int32)

    # pad the window axis to the device count; extra windows carry zero weight
    pad_w = (-n_win) % n_dev
    if pad_w:
        wins = np.concatenate([wins, np.zeros((pad_w, window), np.float32)])
        weights = np.concatenate([weights, np.zeros((pad_w, window), np.float32)])
        starts = np.concatenate([starts, np.zeros(pad_w, np.int32)])

    win_spec = P(axes)          # window axis sharded over every mesh axis
    rep_spec = P()

    def shard_fn(wins_l, weights_l, starts_l):
        v_l, i_l = bk.separate_windows_fn(wins_l)
        wv = v_l * weights_l
        wi = i_l * weights_l

        def ola(acc, xw):
            w, s = xw
            cur = jax.lax.dynamic_slice(acc, (s,), (window,))
            return jax.lax.dynamic_update_slice(acc, cur + w, (s,)), None

        # the zero init is replicated but the scan output is device-varying;
        # mark it varying over the manual axes so the carry types agree
        zeros = jnp.zeros(padded_len, jnp.float32)
        try:
            zeros = jax.lax.pcast(zeros, axes, to="varying")
        except AttributeError:  # older jax without pcast
            zeros = jax.lax.pvary(zeros, axes)
        vocal_l, _ = jax.lax.scan(ola, zeros, (wv, starts_l))
        inst_l, _ = jax.lax.scan(ola, zeros, (wi, starts_l))
        vocal = jax.lax.psum(vocal_l, axes)
        inst = jax.lax.psum(inst_l, axes)
        return vocal, inst

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(win_spec, win_spec, win_spec),
        out_specs=(rep_spec, rep_spec),
    )
    scale = inv_wsum
    with mesh:
        v, i = jax.jit(fn)(jnp.asarray(wins), jnp.asarray(weights), jnp.asarray(starts))
    v = np.asarray(v) * scale
    i = np.asarray(i) * scale
    return v[:n], i[:n]
