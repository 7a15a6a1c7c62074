"""STFT / iSTFT primitives for TPU.

Replaces the reference's torch-CUDA STFT glue around the MDX23 ONNX net
(reference src/audio_cut/separation/backends.py:355-377, n_fft=6144) with
jnp.fft-based transforms that XLA lowers to TPU-friendly batched FFTs.

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
    starts = jnp.arange(n) * hop
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return jnp.take(x, idx, axis=-1)


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
    """
    window = hann_window(n_fft, jnp.float32)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1).astype(jnp.float32) * window

    n = frames.shape[-2]
    total = (n - 1) * hop + n_fft
    starts = jnp.arange(n) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]           # [n, n_fft]

    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, n, n_fft))
    out = jnp.zeros((flat.shape[0], total), dtype=jnp.float32)
    out = out.at[:, idx.reshape(-1)].add(flat.reshape(flat.shape[0], -1))

    wsq = jnp.zeros((total,), dtype=jnp.float32)
    wsq = wsq.at[idx.reshape(-1)].add(jnp.tile(window * window, (n,)))
    out = out / jnp.maximum(wsq, 1e-10)[None, :]

    out = out.reshape(batch_shape + (total,))
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
