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
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audio_cut_tpu.ops.stft import stft

_EPS = 1e-10

# NUMERICS NOTE: windowed sums must NOT be computed as differences of a
# global float32 prefix sum — on a loud multi-minute track the prefix reaches
# ~1e4-1e5 while a quiet window's true energy is ~1e-7, so the subtraction
# cancels catastrophically (observed: negative sums -> NaN RMS). Every kernel
# here instead sums each window DIRECTLY (gathered frames + pairwise jnp.sum),
# whose error scales with the window's own energy only.


def _strided_window_sums(x: jnp.ndarray, window: int, stride: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sums, counts) of centered [i*stride - window//2, +window) windows.

    x: [..., T]; output: [..., T//stride + 1]. Zero-padded at the edges;
    counts reflect the true in-bounds sample count.

    Dense formulation for ANY (window, stride): bin the signal at the stride,
    take per-bin prefix/suffix cumsums, and assemble each window as
    (tail of its first bin) + (whole middle bins, a tiny sliding reduction)
    + (head of its last bin). Window starts share a constant offset within
    their bin, so every piece is a static slice — no gathers (the gather
    formulation this replaced cost ~200 ms/track on TPU; this is O(T) dense
    work). Sums stay direct (per-bin cumsums only — no global prefix
    cancellation, see NUMERICS NOTE above).
    """
    t = x.shape[-1]
    n = t // stride + 1
    half = window // 2
    s = stride
    lead = x.shape[:-1]
    # pad so window starts are >= 0 and bin-aligned at constant offset o
    p_left = -(-half // s) * s
    o = p_left - half                  # window i starts at offset o in bin i
    m = (o + window) // s              # window i ends in bin i+m at offset e
    e = (o + window) % s
    nb = n + m + 1
    xp = jnp.pad(x, [(0, 0)] * len(lead) + [(p_left, max(0, nb * s - p_left - t))])
    xb = xp[..., :nb * s].reshape(lead + (nb, s))
    suf = jnp.cumsum(xb[..., ::-1], axis=-1)[..., ::-1]   # suf[j,k] = sum x[k:]
    if m == 0:
        # window inside a single bin: within-bin difference only
        top = suf[..., :n, o + window] if o + window < s else jnp.zeros(lead + (n,), x.dtype)
        sums = suf[..., :n, o] - top
    else:
        pref = jnp.cumsum(xb, axis=-1)                    # pref[j,k] = sum x[:k+1]
        left = suf[..., :n, o]                            # bin i from offset o
        right = pref[..., m:n + m, e - 1] if e > 0 else jnp.zeros(lead + (n,), x.dtype)
        sums = left + right
        if m >= 2:
            # sum of whole bins i+1 .. i+m-1: sliding reduction over bin totals
            totals = pref[..., -1]
            mid = jax.lax.reduce_window(
                totals, 0.0, jax.lax.add,
                (1,) * len(lead) + (m - 1,), (1,) * (len(lead) + 1),
                [(0, 0)] * len(lead) + [(0, 0)],
            )[..., 1:n + 1]
            sums = sums + mid
    centers = np.arange(n) * stride
    lo = np.clip(centers - half, 0, t)
    hi = np.clip(centers - half + window, 0, t)
    counts = jnp.asarray(np.maximum(hi - lo, 1).astype(np.float32))
    return sums, counts


@functools.partial(jax.jit, static_argnames=("frame_length", "hop"))
def frame_rms(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Centered per-frame RMS on the feature grid: [..., n_frames].

    n_frames = T // hop + 1, frame i centered at i*hop.
    """
    sq = jnp.square(x.astype(jnp.float32))
    sums, counts = _strided_window_sums(sq, frame_length, hop)
    return jnp.sqrt(jnp.maximum(sums, 0.0) / counts + _EPS)


# moving_rms_db evaluates on a ~0.7 ms grid and nearest-holds back to
# per-sample; guards operate on >=5 ms windows so this is lossless for them
_MOVING_RMS_STRIDE = 32


@functools.partial(jax.jit, static_argnames=("window",))
def moving_rms_db(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Per-sample moving-window RMS in dB (same length as x, 'same' alignment).

    Powers the O(1) quiet-guard lookup (parity: reference
    src/audio_cut/cutting/refine.py:161-181). Two-level local summation:
    samples -> stride-sized bins (exact reshape sums) -> windowed bin sums,
    nearest-held back to per-sample. No global prefix sums anywhere.
    """
    t = x.shape[-1]
    stride = min(_MOVING_RMS_STRIDE, max(1, window // 4))
    sq = jnp.square(x.astype(jnp.float32))
    if stride == 1:
        sums, counts = _strided_window_sums(sq, window, 1)
        rms = jnp.sqrt(jnp.maximum(sums, 0.0) / counts + 1e-24)
        return (20.0 * jnp.log10(rms + 1e-12))[..., :t]

    nb = -(-t // stride)
    pad = nb * stride - t
    sq_b = jnp.pad(sq, [(0, 0)] * (x.ndim - 1) + [(0, pad)]).reshape(x.shape[:-1] + (nb, stride))
    bins = jnp.sum(sq_b, axis=-1)
    cnt_b = jnp.pad(jnp.ones((t,), jnp.float32), (0, pad)).reshape(nb, stride).sum(-1)

    wb = max(1, int(round(window / stride)))
    sums, _ = _strided_window_sums(bins, wb, 1)
    counts, _ = _strided_window_sums(cnt_b, wb, 1)
    sums = sums[..., :nb]
    counts = jnp.maximum(counts[..., :nb], 1.0)
    rms = jnp.sqrt(jnp.maximum(sums, 0.0) / counts + 1e-24)
    db = 20.0 * jnp.log10(rms + 1e-12)
    return jnp.repeat(db, stride, axis=-1)[..., :t]


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
    """Centered moving average along the last axis (feature-grid sized)."""
    if window <= 1:
        return x
    sums, counts = _strided_window_sums(x.astype(jnp.float32), window, 1)
    return (sums / counts)[..., :x.shape[-1]].astype(x.dtype)
