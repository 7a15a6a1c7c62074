"""select_device compatibility semantics (reference gpu_pipeline.select_device,
src/audio_cut/utils/gpu_pipeline.py:87-130).

Migrating users carry `--gpu-device cuda:0` flags and `gpu_pipeline.prefer_device`
config values; those must resolve to a usable device here, not crash or warn
into an arbitrary fallback.
"""

import jax

from audio_cut_tpu.utils.device import select_device


class TestSelectDevice:
    def test_default_is_first_device(self):
        assert select_device() == jax.devices()[0]

    def test_cpu_prefer(self):
        d = select_device("cpu")
        assert d.platform == "cpu"

    def test_cuda_maps_to_accelerator_or_cpu(self):
        # On the CPU test tier there is no accelerator: cuda:0 must still
        # resolve cleanly (to a cpu device), mirroring the reference's
        # cuda->cpu fallback rather than erroring.
        d = select_device("cuda:0")
        assert d in jax.devices()

    def test_gpu_alias(self):
        assert select_device("gpu") in jax.devices()

    def test_index_clamped(self):
        d = select_device("cpu:999")
        assert d.platform == "cpu"

    def test_bad_index_ignored(self):
        d = select_device("cpu:abc")
        assert d.platform == "cpu"
