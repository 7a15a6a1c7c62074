"""Pallas TPU kernel: fused per-frame spectral statistics.

Computes spectral flatness and onset flux for every STFT frame in a single
VMEM pass over the magnitude spectrogram — one load of each [TILE_T, F] tile
feeds both reductions (the jnp path reads the spectrogram twice and lets XLA
decide the fusion; this kernel makes the tiling explicit).

Numerics match ops.frames.spectral_flatness / onset_envelope:
  flatness[t] = exp(mean_f(log(mag^2 + eps))) / (mean_f(mag^2) + eps)
  onset[t]    = mean_f(relu(log1p(1000*mag[t]) - log1p(1000*mag[t-1])))

The frequency axis is padded to the 128-lane boundary; padded lanes are
masked out of both reductions. Frame t-1 arrives as a second, pre-shifted
input so each grid step stays self-contained (no cross-tile state).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-10
TILE_T = 256


def _kernel(f_true: int):
    def kernel(mag_ref, prev_ref, flat_ref, onset_ref):
        import jax.numpy as jnp  # noqa: PLC0415 (kernel-local for clarity)

        mag = mag_ref[:, :]
        prev = prev_ref[:, :]
        f_pad = mag.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, mag.shape, dimension=1)
        valid = lane < f_true
        inv_f = 1.0 / float(f_true)

        power = mag * mag
        log_power = jnp.where(valid, jnp.log(power + _EPS), 0.0)
        geo = jnp.exp(jnp.sum(log_power, axis=-1, keepdims=True) * inv_f)
        arith = jnp.sum(jnp.where(valid, power, 0.0), axis=-1, keepdims=True) * inv_f
        flat_ref[:, :] = jnp.broadcast_to(geo / (arith + _EPS), (mag.shape[0], 128))

        flux = jnp.log1p(1000.0 * mag) - jnp.log1p(1000.0 * prev)
        flux = jnp.where(valid, jnp.maximum(flux, 0.0), 0.0)
        onset_ref[:, :] = jnp.broadcast_to(
            jnp.sum(flux, axis=-1, keepdims=True) * inv_f, (mag.shape[0], 128)
        )

    return kernel


@functools.partial(jax.jit, static_argnames=())
def spectral_stats_pallas(mag: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """mag: [T, F] magnitude spectrogram -> (flatness [T], onset [T])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, f = mag.shape
    f_pad = ((f + 127) // 128) * 128
    t_pad = ((t + TILE_T - 1) // TILE_T) * TILE_T
    magp = jnp.pad(mag, ((0, t_pad - t), (0, f_pad - f)))
    prev = jnp.pad(mag[:-1], ((1, t_pad - t), (0, f_pad - f)))
    prev = prev.at[0, :f].set(magp[0, :f])  # frame 0 fluxes against itself -> 0

    grid = (t_pad // TILE_T,)
    # per-frame scalars broadcast over a 128-lane output column block —
    # Mosaic requires the trailing two dims to be (8k, 128)-aligned
    flat, onset = pl.pallas_call(
        _kernel(f),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_T, f_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_T, f_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, 128), jnp.float32),
        ],
    )(magp, prev)
    return flat[:t, 0], onset[:t, 0]


def spectral_stats_reference(mag: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """jnp reference implementation (same math, for fallback + testing)."""
    power = mag * mag
    geo = jnp.exp(jnp.mean(jnp.log(power + _EPS), axis=-1))
    flat = geo / (jnp.mean(power, axis=-1) + _EPS)
    logmag = jnp.log1p(1000.0 * mag)
    flux = jnp.diff(logmag, axis=-2, prepend=logmag[..., :1, :])
    onset = jnp.mean(jnp.maximum(flux, 0.0), axis=-1)
    return flat.astype(jnp.float32), onset.astype(jnp.float32)


def spectral_stats_interpret(mag: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Interpreter-mode execution of the kernel (CPU-testable)."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return spectral_stats_pallas(mag)


def spectral_stats(mag: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas when the probe says the device compiles Mosaic, jnp elsewhere.

    The probe (ops/pallas/probe.py) decides once per process: forced by
    AUDIO_CUT_TPU_PALLAS, ON for directly-attached TPUs that pass a cached
    subprocess compile check, OFF on relay tunnels whose remote Mosaic
    compile hangs. The jnp path is numerically identical
    (tests/unit/test_pallas_kernels.py).
    """
    from audio_cut_tpu.ops.pallas.probe import pallas_supported

    if pallas_supported():
        try:
            return spectral_stats_pallas(mag)
        except Exception:  # pragma: no cover - kernel availability varies
            pass
    return spectral_stats_reference(mag)
