import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_cut_tpu.models.convtdf import ConvTDFNet, ConvTDFSeparator, apply_complex_mask


@pytest.fixture(scope="module")
def small_sep():
    return ConvTDFSeparator(
        sample_rate=44100, n_fft=2048, hop=512, dim_f=256, dim_t=32,
        channels=8, depth=2, tdf_bottleneck=16,
    )


def test_net_shapes(small_sep):
    params = small_sep.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 32, 256, 2))
    mask = small_sep.spec_forward(params, x)
    assert mask.shape == (2, 32, 256, 2)
    assert mask.dtype == jnp.float32


def test_separate_fn_shapes_and_sum(small_sep):
    params = small_sep.init_params(jax.random.PRNGKey(0))
    length = small_sep.window_samples
    audio = jnp.asarray(np.random.default_rng(0).standard_normal((1, length)).astype(np.float32) * 0.1)
    vocal, inst = jax.jit(lambda p, a: small_sep.separate_fn(p, a, length))(params, audio)
    assert vocal.shape == (1, length)
    # identity of the decomposition: vocal + instrumental == input exactly
    np.testing.assert_allclose(np.asarray(vocal + inst), np.asarray(audio), atol=1e-5)


def test_separate_shifted_fn(small_sep):
    params = small_sep.init_params(jax.random.PRNGKey(0))
    length = small_sep.window_samples
    audio = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, length)).astype(np.float32) * 0.1)
    base, _ = jax.jit(lambda p, a: small_sep.separate_fn(p, a, length))(params, audio)
    v2, i2 = jax.jit(
        lambda p, a: small_sep.separate_shifted_fn(p, a, length, 2))(params, audio)
    assert v2.shape == (2, length)
    # complement identity must survive the averaging
    np.testing.assert_allclose(np.asarray(v2 + i2), np.asarray(audio), atol=1e-5)
    # shifts=1 degenerates to the plain forward exactly
    v1, _ = jax.jit(
        lambda p, a: small_sep.separate_shifted_fn(p, a, length, 1))(params, audio)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(base), atol=0)
    # the averaged output is a same-scale estimate, not a degenerate one
    ratio = float(jnp.linalg.norm(v2) / (jnp.linalg.norm(base) + 1e-9))
    assert 0.3 < ratio < 3.0, ratio


def test_complex_mask():
    spec = jnp.ones((1, 4, 8), jnp.complex64) * (1 + 1j)
    mask = jnp.zeros((1, 4, 8, 2)).at[..., 0].set(0.5)  # real-only mask 0.5
    out = apply_complex_mask(spec, mask)
    np.testing.assert_allclose(np.asarray(out), 0.5 * np.asarray(spec), atol=1e-6)


def test_training_step_reduces_loss(small_sep):
    from audio_cut_tpu.training.trainer import TrainConfig, Trainer

    trainer = Trainer(small_sep, TrainConfig(learning_rate=1e-3))
    rng = np.random.default_rng(1)
    length = small_sep.window_samples
    mix = jnp.asarray(rng.standard_normal((2, length)).astype(np.float32) * 0.1)
    vocal = mix * 0.5
    losses = [trainer.train_step(mix, vocal)["loss"] for _ in range(5)]
    assert losses[-1] < losses[0], losses


def test_param_shardings_rules():
    from audio_cut_tpu.parallel.mesh import make_mesh, param_shardings

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(jax.devices()[:8], dp=2, sp=2, tp=2)
    sep = ConvTDFSeparator(44100, n_fft=2048, hop=512, dim_f=256, dim_t=32,
                           channels=8, depth=2, tdf_bottleneck=16)
    params = sep.init_params(jax.random.PRNGKey(0))
    sh = param_shardings(mesh, params)
    leaves = jax.tree_util.tree_leaves(sh)
    assert leaves, "no shardings produced"
    # at least one tensor should actually be tp-sharded
    assert any("tp" in str(s.spec) for s in leaves)
