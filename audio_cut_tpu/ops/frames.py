"""Framewise feature kernels (device-side, O(N), static shapes).

These feed the TrackFeatures store (parity:
reference src/audio_cut/analysis/features_cache.py:321-510 — RMS, spectral
flatness, onset envelope, MDD series on a hop_s=0.05 frame grid). The
reference computed them with librosa/torch per chunk; here each feature is a
single vectorised JAX expression over the whole track (cumulative-sum window
reductions and batched FFTs), which XLA fuses and tiles for the VPU/MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from audio_cut_tpu.ops.stft import stft

_EPS = 1e-10


def _window_sum(cumsum: jnp.ndarray, starts: jnp.ndarray, width: int) -> jnp.ndarray:
    """Sum over [start, start+width) windows given an inclusive prefix sum
    with a leading zero (shape T+1)."""
    t = cumsum.shape[-1] - 1
    lo = jnp.clip(starts, 0, t)
    hi = jnp.clip(starts + width, 0, t)
    return jnp.take(cumsum, hi, axis=-1) - jnp.take(cumsum, lo, axis=-1)


@functools.partial(jax.jit, static_argnames=("frame_length", "hop"))
def frame_rms(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Centered per-frame RMS on the feature grid: [..., n_frames].

    n_frames = T // hop + 1, frame i centered at i*hop.
    """
    t = x.shape[-1]
    n = t // hop + 1
    sq = jnp.square(x.astype(jnp.float32))
    cs = jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (1,), jnp.float32), jnp.cumsum(sq, axis=-1)], axis=-1
    )
    starts = jnp.arange(n) * hop - frame_length // 2
    lo = jnp.clip(starts, 0, t)
    hi = jnp.clip(starts + frame_length, 0, t)
    counts = jnp.maximum(hi - lo, 1).astype(jnp.float32)
    sums = jnp.take(cs, hi, axis=-1) - jnp.take(cs, lo, axis=-1)
    return jnp.sqrt(sums / counts + _EPS)


@functools.partial(jax.jit, static_argnames=("window",))
def moving_rms_db(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Per-sample moving-window RMS in dB (same length as x, 'same' alignment).

    Powers the O(1) quiet-guard lookup (parity: reference
    src/audio_cut/cutting/refine.py:161-181).
    """
    t = x.shape[-1]
    sq = jnp.square(x.astype(jnp.float32))
    cs = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(sq)], axis=-1)
    starts = jnp.arange(t) - window // 2
    lo = jnp.clip(starts, 0, t)
    hi = jnp.clip(starts + window, 0, t)
    counts = jnp.maximum(hi - lo, 1).astype(jnp.float32)
    rms = jnp.sqrt((jnp.take(cs, hi) - jnp.take(cs, lo)) / counts + 1e-24)
    return 20.0 * jnp.log10(rms + 1e-12)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def spectral_flatness(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Per-frame spectral flatness in [0, 1]: geometric/arithmetic mean ratio."""
    mag = jnp.abs(stft(x, n_fft=n_fft, hop=hop)) ** 2.0
    log_gm = jnp.exp(jnp.mean(jnp.log(mag + _EPS), axis=-1))
    am = jnp.mean(mag, axis=-1) + _EPS
    return (log_gm / am).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def onset_envelope(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Spectral-flux onset strength per frame (half-wave rectified log-mag flux)."""
    mag = jnp.abs(stft(x, n_fft=n_fft, hop=hop))
    logmag = jnp.log1p(1000.0 * mag)
    flux = jnp.diff(logmag, axis=-2, prepend=logmag[..., :1, :])
    return jnp.mean(jnp.maximum(flux, 0.0), axis=-1).astype(jnp.float32)


@jax.jit
def normalize01(x: jnp.ndarray) -> jnp.ndarray:
    lo = jnp.min(x, axis=-1, keepdims=True)
    hi = jnp.max(x, axis=-1, keepdims=True)
    return (x - lo) / jnp.maximum(hi - lo, _EPS)


@jax.jit
def mdd_series(rms: jnp.ndarray, flatness: jnp.ndarray, onset: jnp.ndarray) -> jnp.ndarray:
    """Musical Dynamic Density: clip(0.5*rms^ + 0.3*(1-flat) + 0.2*onset^).

    Parity: reference src/audio_cut/analysis/features_cache.py:321-335.
    """
    r = normalize01(rms)
    o = normalize01(onset)
    return jnp.clip(0.5 * r + 0.3 * (1.0 - flatness) + 0.2 * o, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("window",))
def smooth(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Centered moving average along the last axis."""
    if window <= 1:
        return x
    t = x.shape[-1]
    cs = jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (1,), x.dtype), jnp.cumsum(x, axis=-1)], axis=-1
    )
    starts = jnp.arange(t) - window // 2
    lo = jnp.clip(starts, 0, t)
    hi = jnp.clip(starts + window, 0, t)
    counts = jnp.maximum(hi - lo, 1).astype(x.dtype)
    return (jnp.take(cs, hi, axis=-1) - jnp.take(cs, lo, axis=-1)) / counts
