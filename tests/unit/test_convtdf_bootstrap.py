"""Packaged ConvTDF bootstrap checkpoint: loads, separates, beats spectral.

Role parity: the reference's quality story rests on trained MDX23 weights
(reference download_mdx23.py, backends.py:145-168). This framework trains its
own bootstrap weights (scripts/train_separator.py --bootstrap) and packages
them like the ConvVAD checkpoint; these tests pin the packaged artifact's
contract. They skip when no checkpoint ships in the working tree.
"""

import numpy as np
import pytest

from audio_cut_tpu.models.convtdf import (
    ConvTDFSeparator,
    load_checkpoint,
    packaged_checkpoint_path,
    _packaged_geometry,
)

pytestmark = pytest.mark.skipif(
    packaged_checkpoint_path() is None,
    reason="no packaged convtdf bootstrap checkpoint in this build",
)


@pytest.fixture(scope="module")
def sep_and_params():
    import jax

    ckpt = packaged_checkpoint_path()
    geo = _packaged_geometry(ckpt)
    # short eval window (the net is fully convolutional over T)
    sep = ConvTDFSeparator(
        44100,
        n_fft=int(geo["n_fft"]),
        hop=int(geo["hop"]),
        dim_f=int(geo["dim_f"]),
        dim_t=64,
        channels=int(geo["channels"]),
        depth=int(geo["depth"]),
        tdf_bottleneck=int(geo["tdf_bottleneck"]),
    )
    params = load_checkpoint(ckpt, template=lambda: sep.init_params(jax.random.PRNGKey(0)))
    return sep, params


def test_geometry_sidecar_present():
    geo = _packaged_geometry(packaged_checkpoint_path())
    assert {"n_fft", "hop", "dim_f", "channels", "depth", "tdf_bottleneck"} <= set(geo)
    assert int(geo["n_fft"]) == 6144 and int(geo["dim_f"]) == 2048


def test_bootstrap_beats_spectral_on_synthetic(sep_and_params):
    """The packaged weights must beat the model-free spectral baseline in
    SI-SNR on held-out synthetic mixtures (the training distribution)."""
    import jax

    from audio_cut_tpu.separation.backends import SpectralMaskBackend
    from audio_cut_tpu.training.sep_data import si_snr, synth_pair

    sep, params = sep_and_params
    rng = np.random.default_rng(20260816)
    spectral = SpectralMaskBackend(44100)
    fwd = jax.jit(lambda p, x: sep.separate_fn(p, x, sep.window_samples))
    conv_db, spec_db = [], []
    for _ in range(4):
        mix, vocal = synth_pair(rng, sep.window_samples)
        v_conv, _ = fwd(params, mix[None])
        v_spec, _ = spectral.separate_window(np.asarray(mix))
        conv_db.append(si_snr(np.asarray(v_conv[0]), vocal))
        spec_db.append(si_snr(np.asarray(v_spec)[: vocal.size], vocal))
    assert np.mean(conv_db) > np.mean(spec_db), (
        f"packaged convtdf {np.mean(conv_db):.2f} dB must beat "
        f"spectral {np.mean(spec_db):.2f} dB"
    )


def test_backend_activates_packaged_checkpoint():
    """`checkpoint=packaged` builds the backend with sidecar geometry and
    produces non-degenerate stems."""
    from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
    from audio_cut_tpu.separation.backends import make_backend

    set_runtime_config({
        "enhanced_separation.convtdf.checkpoint": "packaged",
        # short serving window keeps the CPU-tier compile cheap
        "enhanced_separation.convtdf.dim_t": 64,
    })
    try:
        backend = make_backend("convtdf", 44100)
        assert backend.sep.n_fft == 6144
        rng = np.random.default_rng(3)
        from audio_cut_tpu.training.sep_data import synth_pair

        mix, _ = synth_pair(rng, backend.sep.window_samples)
        v, i = backend.separate_window(np.asarray(mix))
        v, i = np.asarray(v), np.asarray(i)
        assert v.shape == mix.shape and i.shape == mix.shape
        assert np.isfinite(v).all() and np.isfinite(i).all()
        # mask output is non-degenerate: neither all-pass nor all-zero
        assert 1e-4 < float(np.abs(v).mean()) < float(np.abs(mix).mean()) * 1.5
        # stems sum back to the mix by construction (vocal + (mix - vocal))
        assert np.allclose(v + i, mix, atol=1e-5)
    finally:
        reset_runtime_config()
