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


def separate_tracks_mesh(
    tracks: Sequence[np.ndarray],
    sample_rate: int,
    mesh=None,
    backend: Optional[str] = None,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Batch separation for the full-pipeline multi-chip mode (SURVEY §7
    step 10): N whole tracks separated across the mesh, each with the SAME
    OLA plan a single-device run would use, so the stems — and therefore
    every downstream detection/cut decision — match single-device runs
    bit-for-bit.

    Tracks are grouped by their bucket-padded length (PAD_BUCKET_S buckets,
    so most same-ish-length tracks share one compiled program); each group's
    windows are flattened across tracks and sharded over every mesh device,
    each device overlap-adds its windows into a flat [g*padded_len] local
    buffer at track-offset positions, and ONE ``psum`` assembles the whole
    group. Communication: a single all-reduce per group on ICI.

    Returns [(vocal, instrumental)] per track, trimmed to true lengths, in
    input order.
    """
    import jax
    import jax.numpy as jnp
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from audio_cut_tpu.config import get_config
    from audio_cut_tpu.separation.backends import make_backend
    from audio_cut_tpu.separation.engine import (
        SeparationEngine,
        ola_plan,
        padded_track_len,
        quantize_upload,
    )

    if mesh is None:
        mesh = make_mesh(dp=len(jax.devices()), sp=1, tp=1)
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    axes = tuple(mesh.axis_names)
    sr = int(sample_rate)

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
    int16_upload = bool(get_config("device_pipeline.upload_int16", True))

    def padded_len_of(n: int) -> int:
        return padded_track_len(n, sr, align)

    tracks = [np.asarray(t, dtype=np.float32) for t in tracks]
    groups: dict = {}
    for idx, t in enumerate(tracks):
        groups.setdefault(padded_len_of(t.shape[-1]), []).append(idx)

    out: List[Optional[Tuple[np.ndarray, np.ndarray]]] = [None] * len(tracks)
    for padded_len, idxs in sorted(groups.items()):
        plans, window, weights, inv_wsum = ola_plan(
            padded_len, sr, eng.chunk_s, eng.overlap_s, eng.halo_s, align
        )
        n_win = len(plans)
        g = len(idxs)

        wins_all, weights_all, starts_all = [], [], []
        for row, idx in enumerate(idxs):
            audio = tracks[idx]
            n = audio.shape[-1]
            padded = np.pad(audio, (0, padded_len - n)) if padded_len != n else audio
            if int16_upload:
                # mirror the single-device engine's int16 upload quantization
                raw, scale = quantize_upload(padded)
                padded = raw.astype(np.float32) * scale
            wins_all.append(np.stack(
                [padded[p.start:p.start + window] for p in plans]))
            weights_all.append(weights)
            # absolute offsets into the flat [g*padded_len] group buffer;
            # windows never cross a track boundary (start+window <= padded_len)
            starts_all.append(np.asarray(
                [row * padded_len + p.start for p in plans], dtype=np.int32))
        wins = np.concatenate(wins_all)          # [g*n_win, window]
        wts = np.concatenate(weights_all)
        starts = np.concatenate(starts_all)

        pad_w = (-(g * n_win)) % n_dev
        if pad_w:
            wins = np.concatenate([wins, np.zeros((pad_w, window), np.float32)])
            wts = np.concatenate([wts, np.zeros((pad_w, window), np.float32)])
            starts = np.concatenate([starts, np.zeros(pad_w, np.int32)])

        flat_len = g * padded_len
        win_spec = P(axes)
        rep_spec = P()

        def shard_fn(wins_l, weights_l, starts_l):
            v_l, i_l = bk.separate_windows_fn(wins_l)
            wv = v_l * weights_l
            wi = i_l * weights_l

            def ola(acc, xw):
                w, s = xw
                cur = jax.lax.dynamic_slice(acc, (s,), (window,))
                return jax.lax.dynamic_update_slice(acc, cur + w, (s,)), None

            zeros = jnp.zeros(flat_len, jnp.float32)
            try:
                zeros = jax.lax.pcast(zeros, axes, to="varying")
            except AttributeError:
                zeros = jax.lax.pvary(zeros, axes)
            vocal_l, _ = jax.lax.scan(ola, zeros, (wv, starts_l))
            inst_l, _ = jax.lax.scan(ola, zeros, (wi, starts_l))
            return jax.lax.psum(vocal_l, axes), jax.lax.psum(inst_l, axes)

        fn = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(win_spec, win_spec, win_spec),
            out_specs=(rep_spec, rep_spec),
        )
        with mesh:
            v, i = jax.jit(fn)(jnp.asarray(wins), jnp.asarray(wts), jnp.asarray(starts))
        v = np.asarray(v).reshape(g, padded_len) * inv_wsum
        i = np.asarray(i).reshape(g, padded_len) * inv_wsum
        for row, idx in enumerate(idxs):
            n = tracks[idx].shape[-1]
            out[idx] = (v[row, :n], i[row, :n])
    return out  # type: ignore[return-value]


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
        SeparationEngine,
        ola_plan,
        padded_track_len,
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

    padded_len = padded_track_len(n, sr, align)
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
