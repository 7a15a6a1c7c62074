from audio_cut_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch_of_tracks,
)

__all__ = ["make_mesh", "param_shardings", "batch_sharding", "shard_batch_of_tracks"]
