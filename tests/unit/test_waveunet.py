"""WaveUNet second neural tier (Demucs role, reference backends.py:409-497)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
from audio_cut_tpu.models.waveunet import WaveUNetSeparator

SR = 44100


@pytest.fixture(scope="module")
def small_sep():
    return WaveUNetSeparator(SR, window_samples=16384, channels=8, depth=3)


def test_forward_shapes_and_sum(small_sep):
    params = small_sep.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal((2, 16384)) * 0.1).astype(np.float32))
    v, i = jax.jit(lambda p, a: small_sep.separate_fn(p, a, 16384))(params, x)
    assert v.shape == (2, 16384)
    assert v.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(v + i), np.asarray(x), atol=1e-5)


def test_wave_training_reduces_loss(small_sep):
    from audio_cut_tpu.training.trainer import TrainConfig
    from audio_cut_tpu.training.wave_trainer import WaveTrainer

    trainer = WaveTrainer(small_sep, TrainConfig(learning_rate=1e-3))
    rng = np.random.default_rng(1)
    mix = jnp.asarray((rng.standard_normal((2, 16384)) * 0.1).astype(np.float32))
    vocal = mix * 0.5
    losses = [trainer.train_step(mix, vocal)["loss"] for _ in range(6)]
    assert losses[-1] < losses[0], losses


def test_checkpoint_roundtrip_and_backend(tmp_path, small_sep):
    from flax import serialization

    from audio_cut_tpu.separation.backends import make_backend

    params = small_sep.init_params(jax.random.PRNGKey(7))
    ck = tmp_path / "wu.msgpack"
    ck.write_bytes(serialization.to_bytes(params))
    set_runtime_config({
        "enhanced_separation.waveunet.checkpoint": str(ck),
        "enhanced_separation.waveunet.window_samples": 16384,
        "enhanced_separation.waveunet.channels": 8,
        "enhanced_separation.waveunet.depth": 3,
    })
    try:
        bk = make_backend("waveunet", SR)
        assert bk.sep.window_samples == 16384
        g = bk.engine_geometry()
        assert int(round(g["chunk_s"] * SR)) == 16384
        rng = np.random.default_rng(3)
        wins = jnp.asarray((rng.standard_normal((3, 16384)) * 0.2).astype(np.float32))
        v, i = jax.jit(bk.separate_windows_fn)(wins)
        np.testing.assert_allclose(np.asarray(v + i), np.asarray(wins), atol=1e-5)
    finally:
        reset_runtime_config()


def test_engine_device_ola_with_waveunet(tmp_path, small_sep):
    from flax import serialization

    from audio_cut_tpu.separation.engine import SeparationEngine

    params = small_sep.init_params(jax.random.PRNGKey(9))
    ck = tmp_path / "wu.msgpack"
    ck.write_bytes(serialization.to_bytes(params))
    set_runtime_config({
        "enhanced_separation.backend": "waveunet",
        "enhanced_separation.waveunet.checkpoint": str(ck),
        "enhanced_separation.waveunet.window_samples": 16384,
        "enhanced_separation.waveunet.channels": 8,
        "enhanced_separation.waveunet.depth": 3,
    })
    try:
        rng = np.random.default_rng(5)
        audio = (rng.standard_normal(SR * 4) * 0.2).astype(np.float32)
        eng = SeparationEngine(SR)
        v_dev, i_dev, _m, meta = eng.separate_on_device(audio)
        assert meta["gpu_pipeline_backend"] == "waveunet"
        assert meta["gpu_pipeline_mode"].startswith("device_ola")
        np.testing.assert_allclose(
            np.asarray(v_dev) + np.asarray(i_dev), audio, atol=3e-4)
    finally:
        reset_runtime_config()


def test_fallback_chain_primary_to_waveunet_to_spectral():
    """convtdf (no ckpt) -> waveunet (no ckpt) -> spectral load chain."""
    from audio_cut_tpu.separation.engine import SeparationEngine

    set_runtime_config({
        "enhanced_separation.backend": "convtdf",
        "enhanced_separation.convtdf.checkpoint": None,
        "enhanced_separation.fallback_backend": "waveunet",
        "enhanced_separation.waveunet.checkpoint": None,
    })
    try:
        eng = SeparationEngine(SR)
        bk = eng.backend  # load chain resolves
        assert bk.name == "spectral"
        assert eng._backend_name == "spectral"
    finally:
        reset_runtime_config()
