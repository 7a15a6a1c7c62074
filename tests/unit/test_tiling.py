"""Unit tests for the shared neural-backend tiling helpers.

The OLA tilers are covered indirectly by test_separation_engine /
test_window_kernel_numerics; this file pins the shift-averaging arithmetic
(tiling.shift_averaged) against exact oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_cut_tpu.separation.tiling import mapped_forward, shift_averaged

HOP = 64
W = 8 * HOP


def _rand(b, w, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((b, w)).astype(np.float32))


def test_shifts_one_is_passthrough():
    f = lambda x: x * 2.0
    assert shift_averaged(f, HOP, 1) is f
    assert shift_averaged(f, HOP, 0) is f


@pytest.mark.parametrize("shifts", [2, 3, 4])
def test_identity_oracle(shifts):
    """The identity net is EXACTLY shift-equivariant, so shifting, undoing
    the shift, and weight-normalizing must reproduce the input bit-for-bit
    (up to float addition rounding) at every sample — including the tail
    samples that receive fewer votes."""
    x = _rand(3, W, seed=1)
    y = jax.jit(shift_averaged(lambda v: v, HOP, shifts))(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


@pytest.mark.parametrize("shifts", [2, 3])
def test_linear_equivariant_oracle(shifts):
    """Any shift-equivariant linear map commutes with the trick: averaging
    shifted copies of g(x)=a*x equals g(x)."""
    x = _rand(2, W, seed=2)
    y = jax.jit(shift_averaged(lambda v: -0.5 * v, HOP, shifts))(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(-0.5 * x), atol=1e-6)


def test_vote_weights_by_hand():
    """A constant net isolates the per-sample vote weights: output must be
    the constant everywhere (sum of k votes / k), for head AND tail."""
    x = _rand(1, W, seed=3)
    y = shift_averaged(lambda v: jnp.ones_like(v), HOP, 3)(x)
    np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-6)


def test_non_equivariant_forward_matches_manual_average():
    """For an arbitrary (position-dependent) net, the wrapper must equal the
    hand-computed shift/unshift/weighted-average."""
    shifts, b = 2, 2
    ramp = jnp.arange(W, dtype=jnp.float32) / W

    def net(v):
        return v * ramp[None, :]

    x = _rand(b, W, seed=4)
    got = np.asarray(shift_averaged(net, HOP, shifts)(x))

    s = HOP // shifts
    y0 = np.asarray(net(x))
    xs = np.asarray(jnp.pad(x[:, :-s], ((0, 0), (s, 0))))
    y1 = np.asarray(net(jnp.asarray(xs)))
    # undo the shift: drop the first s samples, zero-pad the tail
    y1u = np.pad(y1[:, s:], ((0, 0), (0, s)))
    wts = np.ones(W, np.float32)
    wts[: W - s] += 1.0
    want = (y0 + y1u) / wts
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_shift_averaged_inside_mapped_forward():
    """The engine seam composes shift_averaged under mapped_forward (groups
    of windows, each expanded shifts x inside one forward). Identity oracle
    must survive the composition with a group size that does not divide N."""
    x = _rand(5, W, seed=5)
    f = shift_averaged(lambda v: v, HOP, 2)
    y = mapped_forward(f, x, group=2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
