import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from audio_cut_tpu.ops.pallas.frame_stats import (
    spectral_stats_interpret,
    spectral_stats_reference,
)


def test_pallas_frame_stats_matches_reference():
    rng = np.random.default_rng(0)
    mag = jnp.asarray(np.abs(rng.standard_normal((700, 515))).astype(np.float32))
    f_ref, o_ref = spectral_stats_reference(mag)
    f_pal, o_pal = spectral_stats_interpret(mag)
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_ref), rtol=2e-4, atol=2e-5)


def test_pallas_frame_stats_padding_edges():
    # frame count and frequency both straddle the tile boundaries
    rng = np.random.default_rng(1)
    mag = jnp.asarray(np.abs(rng.standard_normal((257, 129))).astype(np.float32))
    f_ref, o_ref = spectral_stats_reference(mag)
    f_pal, o_pal = spectral_stats_interpret(mag)
    assert f_pal.shape == (257,)
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_ref), rtol=2e-4, atol=2e-5)
    # frame 0 onset must be 0 (fluxes against itself)
    assert float(o_pal[0]) < 1e-6
