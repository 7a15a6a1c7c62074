"""Model-window tiling with 50% overlap-add, shared by neural backends.

The engine feeds backends fixed windows (multiples of align_hop); neural mask
nets have their OWN native window (hop * (dim_t - 1) samples). This helper
tiles an engine window into a BATCH of model windows — one MXU-friendly
batched forward — and cross-fades them back (triangular OLA). Parity role:
the reference's per-chunk gen_size/trim window batching loop
(reference src/audio_cut/separation/backends.py:299-330), redesigned as a
single static-shape program instead of a Python loop.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def tiled_forward(
    forward: Callable[[jnp.ndarray], jnp.ndarray],
    window_samples: int,
    x: jnp.ndarray,
    length: int,
) -> jnp.ndarray:
    """Apply ``forward`` ([n, window_samples] -> [n, window_samples]) over
    50%-overlapped tiles of 1-D ``x``; returns the OLA-merged [length] signal.

    stride = window/2, so every interior sample is covered by exactly two
    tiles; the triangular cross-fade weights sum to ~1 everywhere and the
    explicit weight accumulator normalises the edges.
    """
    target = int(window_samples)
    stride = target // 2
    n = max(1, -(-(max(length - target, 0)) // stride) + 1)
    padded_len = (n - 1) * stride + target
    xp = jnp.pad(x, (0, padded_len - x.shape[-1]))

    # dense framing: stride divides target (target = 2*stride)
    cols = [
        jax.lax.slice_in_dim(xp, r * stride, r * stride + n * stride).reshape(n, stride)
        for r in range(2)
    ]
    windows = jnp.concatenate(cols, axis=-1)      # [n, target]
    y = forward(windows)                           # [n, target]

    weight = jnp.concatenate([
        jnp.linspace(0.0, 1.0, stride, endpoint=False) + 1e-3,
        jnp.linspace(1.0, 0.0, stride, endpoint=False) + 1e-3,
    ]).astype(jnp.float32)
    weighted = y * weight[None, :]
    acc = jnp.zeros(padded_len, jnp.float32)
    wacc = jnp.zeros(padded_len, jnp.float32)
    blocks = weighted.reshape(n, 2, stride)
    wblocks = jnp.broadcast_to(weight.reshape(2, stride), (n, 2, stride))
    for r in range(2):
        flat = blocks[:, r, :].reshape(n * stride)
        wflat = wblocks[:, r, :].reshape(n * stride)
        cur = jax.lax.dynamic_slice_in_dim(acc, r * stride, n * stride)
        acc = jax.lax.dynamic_update_slice_in_dim(acc, cur + flat, r * stride, axis=0)
        wcur = jax.lax.dynamic_slice_in_dim(wacc, r * stride, n * stride)
        wacc = jax.lax.dynamic_update_slice_in_dim(wacc, wcur + wflat, r * stride, axis=0)
    return (acc / jnp.maximum(wacc, 1e-6))[:length]


def tiled_separate(
    forward: Callable[[jnp.ndarray], jnp.ndarray],
    window_samples: int,
    x: jnp.ndarray,
    length: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vocal via tiled forward; instrumental by subtraction (MDX convention,
    reference backends.py:198-208 output_type + complement-by-subtraction)."""
    vocal = tiled_forward(forward, window_samples, x, length)
    return vocal, x[:length] - vocal


def tiled_forward_batch(
    forward: Callable[[jnp.ndarray], jnp.ndarray],
    window_samples: int,
    xs: jnp.ndarray,
    length: int,
) -> jnp.ndarray:
    """Batched tiled_forward: ``xs`` [N, S] -> [N, length], with every model
    tile of every row fused into ONE batched forward of shape
    [N*tiles, window_samples]. Used when an engine window batch must run
    through a model whose native window differs from the engine window.
    """
    target = int(window_samples)
    stride = target // 2
    n_rows = xs.shape[0]
    n = max(1, -(-(max(length - target, 0)) // stride) + 1)
    padded_len = (n - 1) * stride + target
    xp = jnp.pad(xs, ((0, 0), (0, padded_len - xs.shape[-1])))

    cols = [
        jax.lax.slice_in_dim(xp, r * stride, r * stride + n * stride, axis=-1)
        .reshape(n_rows, n, stride)
        for r in range(2)
    ]
    windows = jnp.concatenate(cols, axis=-1)            # [N, n, target]
    y = forward(windows.reshape(n_rows * n, target)).reshape(n_rows, n, target)

    weight = jnp.concatenate([
        jnp.linspace(0.0, 1.0, stride, endpoint=False) + 1e-3,
        jnp.linspace(1.0, 0.0, stride, endpoint=False) + 1e-3,
    ]).astype(jnp.float32)
    weighted = y * weight[None, None, :]
    acc = jnp.zeros((n_rows, padded_len), jnp.float32)
    wacc = jnp.zeros((n_rows, padded_len), jnp.float32)
    blocks = weighted.reshape(n_rows, n, 2, stride)
    wblocks = jnp.broadcast_to(weight.reshape(1, 1, 2, stride), (n_rows, n, 2, stride))
    for r in range(2):
        flat = blocks[:, :, r, :].reshape(n_rows, n * stride)
        wflat = wblocks[:, :, r, :].reshape(n_rows, n * stride)
        cur = jax.lax.dynamic_slice_in_dim(acc, r * stride, n * stride, axis=-1)
        acc = jax.lax.dynamic_update_slice_in_dim(acc, cur + flat, r * stride, axis=-1)
        wcur = jax.lax.dynamic_slice_in_dim(wacc, r * stride, n * stride, axis=-1)
        wacc = jax.lax.dynamic_update_slice_in_dim(wacc, wcur + wflat, r * stride, axis=-1)
    return (acc / jnp.maximum(wacc, 1e-6))[:, :length]


def shift_averaged(forward, hop: int, shifts: int):
    """Wrap a [n, W] -> [n, W] stem forward with sub-hop shift averaging
    (the Demucs "shifts" test-time trick, STFT form): mask nets are only
    approximately equivariant to sub-hop time shifts — the STFT frame grid
    discretizes differently — so run each window at ``shifts`` evenly-spaced
    offsets IN ONE batched forward, undo the shifts, and average. Costs
    ``shifts``x FLOPs for a small SI-SNR gain.

    The last (shifts-1)/shifts * hop samples of each window receive fewer
    votes (per-sample weight normalization keeps the average exact); the
    engine's halo trim (n_fft/2 > hop) discards that edge anyway.
    """
    shifts = int(shifts)
    if shifts <= 1:
        return forward

    def wrapped(windows: jnp.ndarray) -> jnp.ndarray:
        b, w = windows.shape
        step = max(1, hop // shifts)
        xs = [windows]
        for k in range(1, shifts):
            s = k * step
            xs.append(jnp.pad(windows[:, :-s], ((0, 0), (s, 0))))
        y = forward(jnp.concatenate(xs, axis=0))
        acc = y[:b]
        wts = jnp.ones((w,), jnp.float32)
        idx = jnp.arange(w)
        for k in range(1, shifts):
            s = k * step
            acc = acc + jnp.pad(y[k * b:(k + 1) * b, s:], ((0, 0), (0, s)))
            wts = wts + (idx < (w - s)).astype(jnp.float32)
        return acc / wts

    return wrapped


def mapped_forward(forward, windows: jnp.ndarray, group: int):
    """Sub-batched batched forward via ``lax.map``: [N, W] windows run in
    groups of ``group`` so U-Net activation memory stays bounded while the
    MXU still sees full tiles. ``forward`` maps [g, W] -> array or tuple of
    [g, W]; the output keeps N rows. Single implementation for every neural
    backend's engine seam (was copy-pasted three times; review r3)."""
    n = windows.shape[0]
    length = int(windows.shape[-1])
    g = min(int(group), int(n))
    pad_n = (-n) % g
    wp = jnp.pad(windows, ((0, pad_n), (0, 0)))
    out = jax.lax.map(forward, wp.reshape(-1, g, length))
    return jax.tree_util.tree_map(lambda y: y.reshape(-1, length)[:n], out)


def stft_engine_geometry(sr: float, window_samples: int, n_fft: int, hop: int):
    """Native engine schedule for an STFT-domain mask net: engine windows ==
    model windows, halo = n_fft/2 iSTFT edge spread (recomputed by the
    neighbour), short cross-fade ramp, align = hop so every window start sits
    on the STFT frame grid (chunk-vs-full equivalence to float precision —
    the reference's align_hop padding / trim=n_fft/2 margin,
    backends.py:268-281,306-330)."""
    sr = float(sr)
    target = int(window_samples)
    halo = n_fft // 2
    ramp = 8 * hop
    # overlap must stay well under the window for a positive stride
    overlap = min(2 * halo + ramp, (target // (2 * hop)) * hop)
    return {
        "chunk_s": target / sr,
        "overlap_s": overlap / sr,
        "halo_s": min(halo, overlap // 3) / sr,
        "align": hop,
    }
