"""Sequence-parallel single-track serving (VERDICT round-1 next-step #6).

One long track's windows shard across the full 8-virtual-device mesh; the
result must match the single-device on-device-OLA engine to float tolerance
(halo-recompute windows are bit-identical; only the psum order differs).
"""

import jax
import numpy as np
import pytest

from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
from audio_cut_tpu.parallel.batch import separate_track_sp_sharded
from audio_cut_tpu.parallel.mesh import make_mesh


SMALL_SCHEDULE = {
    "device_pipeline.chunk_seconds": 2.0,
    "device_pipeline.overlap_seconds": 0.5,
    "device_pipeline.halo_seconds": 0.1,
}


@pytest.fixture(autouse=True)
def _small_schedule():
    set_runtime_config(dict(SMALL_SCHEDULE))
    yield
    reset_runtime_config()


def _track(duration_s: float, sr: int = 44100, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(duration_s * sr)) / sr
    x = 0.3 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(t.size)
    return x.astype(np.float32)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sp_sharded_matches_single_device():
    sr = 44100
    audio = _track(9.0, sr, seed=3)  # ~6 windows at the 2 s schedule

    from audio_cut_tpu.separation.engine import SeparationEngine

    eng = SeparationEngine(sr, backend="spectral")
    v_ref_dev, i_ref_dev, _mix, _ = eng.separate_on_device(audio)
    v_ref = np.asarray(v_ref_dev)
    i_ref = np.asarray(i_ref_dev)

    mesh = make_mesh(jax.devices()[:8], dp=4, sp=2, tp=1)
    v, i = separate_track_sp_sharded(audio, sr, mesh=mesh)

    assert v.shape == audio.shape
    assert np.max(np.abs(v - v_ref)) < 1e-5
    assert np.max(np.abs(i - i_ref)) < 1e-5


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sp_sharded_reconstruction_invariant():
    """vocal + instrumental must reconstruct the input everywhere."""
    sr = 44100
    audio = _track(7.3, sr, seed=11)  # non-multiple length exercises padding
    mesh = make_mesh(jax.devices()[:8], dp=8, sp=1, tp=1)
    v, i = separate_track_sp_sharded(audio, sr, mesh=mesh)
    np.testing.assert_allclose(v + i, audio, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_sp_sharded_fewer_windows_than_devices():
    sr = 44100
    audio = _track(1.5, sr, seed=5)  # single window, 8 devices
    mesh = make_mesh(jax.devices()[:8], dp=8, sp=1, tp=1)
    v, i = separate_track_sp_sharded(audio, sr, mesh=mesh)
    assert v.shape == audio.shape
    np.testing.assert_allclose(v + i, audio, atol=2e-4)
