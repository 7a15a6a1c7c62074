"""Packaged WaveUNet bootstrap checkpoint: loads, separates, beats spectral.

Role parity: the reference ships a trained second-tier separator (Demucs v4,
reference src/audio_cut/separation/backends.py:409-497) behind its MDX23
default. This framework trains its own waveform-domain bootstrap
(scripts/train_separator.py --family waveunet --bootstrap) and packages it;
these tests pin the packaged artifact's contract. They skip when no
checkpoint ships in the working tree.
"""

import numpy as np
import pytest

from audio_cut_tpu.models.waveunet import (
    WaveUNetSeparator,
    _packaged_geometry,
    packaged_checkpoint_path,
)

pytestmark = pytest.mark.skipif(
    packaged_checkpoint_path() is None,
    reason="no packaged waveunet bootstrap checkpoint in this build",
)

EVAL_WINDOW = 65536  # training window; net is fully convolutional over T


@pytest.fixture(scope="module")
def sep_and_params():
    import jax

    from audio_cut_tpu.models.convtdf import load_checkpoint

    ckpt = packaged_checkpoint_path()
    geo = _packaged_geometry(ckpt)
    sep = WaveUNetSeparator(
        44100,
        window_samples=EVAL_WINDOW,
        channels=int(geo["channels"]),
        depth=int(geo["depth"]),
    )
    params = load_checkpoint(ckpt, template=lambda: sep.init_params(jax.random.PRNGKey(0)))
    return sep, params


def test_geometry_sidecar_present():
    geo = _packaged_geometry(packaged_checkpoint_path())
    assert {"channels", "depth"} <= set(geo)


def test_bootstrap_beats_spectral_on_synthetic(sep_and_params):
    """The packaged second-tier weights must beat the model-free spectral
    baseline in SI-SNR on held-out synthetic mixtures."""
    import jax

    from audio_cut_tpu.separation.backends import SpectralMaskBackend
    from audio_cut_tpu.training.sep_data import si_snr, synth_pair

    sep, params = sep_and_params
    rng = np.random.default_rng(20260817)
    spectral = SpectralMaskBackend(44100)
    fwd = jax.jit(lambda p, x: sep.separate_fn(p, x, sep.window_samples))
    wave_db, spec_db = [], []
    for _ in range(4):
        mix, vocal = synth_pair(rng, sep.window_samples)
        v_wave, _ = fwd(params, mix[None])
        v_spec, _ = spectral.separate_window(np.asarray(mix))
        wave_db.append(si_snr(np.asarray(v_wave[0]), vocal))
        spec_db.append(si_snr(np.asarray(v_spec)[: vocal.size], vocal))
    assert np.mean(wave_db) > np.mean(spec_db), (
        f"packaged waveunet {np.mean(wave_db):.2f} dB must beat "
        f"spectral {np.mean(spec_db):.2f} dB"
    )


def test_backend_activates_packaged_checkpoint():
    """`checkpoint=packaged` builds the backend with sidecar channels/depth
    and produces non-degenerate, mix-consistent stems."""
    import jax.numpy as jnp

    from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
    from audio_cut_tpu.separation.backends import make_backend

    set_runtime_config({
        "enhanced_separation.waveunet.checkpoint": "packaged",
        # short serving window keeps the CPU-tier compile cheap
        "enhanced_separation.waveunet.window_samples": EVAL_WINDOW,
    })
    try:
        backend = make_backend("waveunet", 44100)
        assert backend.sep.window_samples == EVAL_WINDOW
        rng = np.random.default_rng(3)
        from audio_cut_tpu.training.sep_data import synth_pair

        mix, _ = synth_pair(rng, EVAL_WINDOW)
        v, i = backend.separate_windows_fn(jnp.asarray(mix)[None])
        v, i = np.asarray(v)[0], np.asarray(i)[0]
        assert v.shape == mix.shape and i.shape == mix.shape
        assert np.isfinite(v).all() and np.isfinite(i).all()
        # estimate is non-degenerate: neither silent nor a pass-through blow-up
        assert 1e-4 < float(np.abs(v).mean()) < float(np.abs(mix).mean()) * 1.5
        # stems sum back to the mix by construction (vocal + (mix - vocal))
        assert np.allclose(v + i, mix, atol=1e-5)
    finally:
        reset_runtime_config()
