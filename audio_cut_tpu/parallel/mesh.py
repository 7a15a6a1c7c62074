"""Device mesh + sharding layer.

The reference has no distributed layer — its only multi-device facility is
per-card device selection (reference src/audio_cut/utils/gpu_pipeline.py:87)
and a sequential multi-GPU probe script (SURVEY.md §2.11). The TPU build
replaces that with real SPMD:

* **dp** — batch of tracks/windows across chips (the serving fan-out);
* **sp** — time-axis (sequence) sharding inside one window: chunks only
  couple through halos, so long tracks shard across chips with
  `with_sharding_constraint` on the frame axis, XLA inserting the halo
  collectives;
* **tp** — tensor parallelism over model channels / TDF hidden dims.

pp/ep are intentionally absent: the flagship ConvTDF is a short conv U-Net —
there are no pipeline-depth stages or experts to shard (documented design
decision, not an omission).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "sp", "tp")


def make_mesh(
    devices: Optional[Sequence[Any]] = None,
    dp: Optional[int] = None,
    sp: int = 1,
    tp: int = 1,
) -> Mesh:
    """Build a (dp, sp, tp) mesh over the given (or all) devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if dp is None:
        dp = n // (sp * tp)
    if dp * sp * tp != n:
        raise ValueError(f"mesh {dp}x{sp}x{tp} != {n} devices")
    arr = np.asarray(devs).reshape(dp, sp, tp)
    return Mesh(arr, AXES)


def batch_sharding(mesh: Mesh, shard_time: bool = False) -> NamedSharding:
    """Sharding for a [B, S] waveform batch: dp over batch, optional sp over time."""
    return NamedSharding(mesh, P("dp", "sp" if shard_time else None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Tensor-parallel rules for ConvTDF params.

    Dense kernels [in, out] shard `out` on tp; conv kernels [kh, kw, cin, cout]
    shard `cout` on tp; biases/scales shard their last dim when divisible.
    Everything else replicates. (Megatron-style column parallelism; the
    matching row-parallel reduction is inserted by XLA from the activation
    constraints.)
    """
    tp = mesh.shape["tp"]

    def rule(path: Tuple, x: Any) -> NamedSharding:
        shape = getattr(x, "shape", ())
        if len(shape) >= 2 and shape[-1] % tp == 0 and shape[-1] >= tp and np.prod(shape) >= 1024:
            spec = [None] * (len(shape) - 1) + ["tp"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_batch_of_tracks(mesh: Mesh, batch: np.ndarray, shard_time: bool = False) -> jax.Array:
    """Place a [B, S] batch of equal-length tracks dp-sharded on the mesh.

    This is the serving scale-out: independent tracks across chips — no
    collectives required (SURVEY.md §5: chunks/tracks couple only via halos).
    With ``shard_time`` the sample axis additionally shards over sp (long
    single tracks across chips; XLA inserts halo exchanges around convs).
    """
    return jax.device_put(batch, batch_sharding(mesh, shard_time=shard_time))
