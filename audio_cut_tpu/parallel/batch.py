"""Batch serving scale-out: many tracks across a device mesh.

The reference's only multi-GPU story was one-pipeline-per-card, sequentially
(SURVEY.md §2.11). Here a batch of equal-length windows/tracks is dp-sharded
over the mesh and the SAME separation program runs SPMD — no collectives are
needed because tracks are independent (halos only couple chunks WITHIN a
track, which stay on one device).
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
