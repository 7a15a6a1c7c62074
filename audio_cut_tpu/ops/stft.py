"""STFT / iSTFT primitives for TPU.

Replaces the reference's torch-CUDA STFT glue around the MDX23 ONNX net
(reference src/audio_cut/separation/backends.py:355-377, n_fft=6144) with
jnp.fft-based transforms that XLA lowers to TPU-friendly batched FFTs.

TPU notes: framing and overlap-add are implemented as DENSE reshape/slice
arithmetic whenever ``hop`` divides ``n_fft`` (the usual case). The naive
gather/scatter formulation is catastrophically slow on TPU — XLA serialises
scatter-adds with duplicate indices — so it exists only as a fallback for
exotic hop sizes. The OLA window-normalisation curve is a compile-time
constant computed in numpy.

Conventions: hann window, centered frames (reflect padding), float32 in/out,
complex64 spectra shaped [..., n_frames, n_bins]. All shapes static under jit.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    # periodic hann (matches torch.hann_window / librosa default)
    return (0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n) / n)).astype(dtype)


def _hann_np(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float64)


def num_frames(length: int, hop: int) -> int:
    """Frame count for a centered STFT over `length` samples."""
    return length // hop + 1


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int, center: bool = True) -> jnp.ndarray:
    """Slice ``x`` [..., T] into overlapping frames [..., n_frames, frame_length]."""
    if center:
        pad = frame_length // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    t = x.shape[-1]
    n = (t - frame_length) // hop + 1

    if frame_length % hop == 0:
        # dense path: frame i = concat_r x[i*hop + r*hop : i*hop + (r+1)*hop]
        ratio = frame_length // hop
        cols = []
        for r in range(ratio):
            seg = jax.lax.slice_in_dim(x, r * hop, r * hop + n * hop, axis=-1)
            cols.append(seg.reshape(x.shape[:-1] + (n, hop)))
        return jnp.concatenate(cols, axis=-1)

    if hop >= frame_length:
        # non-overlapping frames (e.g. the 0.05 s feature grid, hop 2205 >
        # n_fft 2048): plain reshape + slice, no gathers
        need = n * hop
        if need > t:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, need - t)])
        frames = x[..., :need].reshape(x.shape[:-1] + (n, hop))
        return frames[..., :frame_length]

    starts = jnp.arange(n) * hop
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return jnp.take(x, idx, axis=-1)


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """OLA of ``frames`` [..., n, L] -> [..., (n-1)*hop + L] (dense when hop|L)."""
    n, L = frames.shape[-2], frames.shape[-1]
    total = (n - 1) * hop + L
    batch = frames.shape[:-2]

    if L % hop == 0:
        ratio = L // hop
        out = jnp.zeros(batch + (total,), dtype=frames.dtype)
        blocks = frames.reshape(batch + (n, ratio, hop))
        for r in range(ratio):
            flat = blocks[..., :, r, :].reshape(batch + (n * hop,))
            cur = jax.lax.slice_in_dim(out, r * hop, r * hop + n * hop, axis=-1)
            out = jax.lax.dynamic_update_slice_in_dim(out, cur + flat, r * hop, axis=-1)
        return out

    starts = jnp.arange(n) * hop
    idx = (starts[:, None] + jnp.arange(L)[None, :]).reshape(-1)
    flat = frames.reshape((-1, n * L))
    out = jnp.zeros((flat.shape[0], total), dtype=frames.dtype)
    out = out.at[:, idx].add(flat)
    return out.reshape(batch + (total,))


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "center"))
def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    center: bool = True,
) -> jnp.ndarray:
    """STFT of ``x`` [..., T] -> complex64 [..., n_frames, n_fft//2+1]."""
    window = hann_window(n_fft, x.dtype)
    frames = frame_signal(x, n_fft, hop, center=center)
    return jnp.fft.rfft(frames * window, n=n_fft, axis=-1)


def _ola_window_sq(n: int, n_fft: int, hop: int) -> np.ndarray:
    """Compile-time constant: sum of squared hann windows over the OLA grid."""
    w2 = _hann_np(n_fft) ** 2
    total = (n - 1) * hop + n_fft
    wsq = np.zeros(total, dtype=np.float64)
    for i in range(n):
        wsq[i * hop:i * hop + n_fft] += w2
    return np.maximum(wsq, 1e-10).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "length", "center"))
def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop: int,
    length: Optional[int] = None,
    center: bool = True,
) -> jnp.ndarray:
    """Inverse STFT with windowed overlap-add and COLA normalization.

    ``spec``: complex [..., n_frames, n_fft//2+1] -> real [..., out_length].
    The window-multiply + OLA runs as a fused Pallas kernel when the device
    supports Mosaic (ops/pallas/ola.py); the jnp dense-shift path otherwise.
    """
    from audio_cut_tpu.ops.pallas.ola import windowed_ola

    window = hann_window(n_fft, jnp.float32)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1).astype(jnp.float32)

    n = frames.shape[-2]
    total = (n - 1) * hop + n_fft
    if frames.ndim > 3:
        lead = frames.shape[:-2]
        out = windowed_ola(frames.reshape((-1,) + frames.shape[-2:]), window, hop)
        out = out.reshape(lead + out.shape[-1:])
    else:
        out = windowed_ola(frames, window, hop)
    out = out / jnp.asarray(_ola_window_sq(n, n_fft, hop))

    if center:
        pad = n_fft // 2
        out = out[..., pad:total - pad]
    if length is not None:
        cur = out.shape[-1]
        if cur >= length:
            out = out[..., :length]
        else:
            out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, length - cur)])
    return out


def magnitude(spec: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(spec).astype(jnp.float32)


def next_pow2(n: int) -> int:
    return 1 << int(np.ceil(np.log2(max(2, n))))
