"""Pallas TPU kernel: fused window-multiply + overlap-add (iSTFT tail).

The separation hot loop ends in iSTFT: irfft frames -> multiply by the
synthesis window -> overlap-add (reference glue being replaced:
src/audio_cut/separation/backends.py:355-377 torch iSTFT). XLA's lowering of
the dense-shift OLA materialises r shifted copies of the frame matrix in HBM;
this kernel keeps the frame block in VMEM and produces each hop-sized output
tile as a register-accumulated sum of its r contributing frame slices — one
HBM read of the frames, one write of the track.

Formulation (hop | L, ratio r = L/hop): with frames zero-padded by r-1 rows
on top, output tile j (length hop) equals
    sum_m frames_p[j+m, (r-1-m)*hop:(r-m)*hop] * window[(r-1-m)*hop:(r-m)*hop].
Output tiles are disjoint, so grid steps never write overlapping blocks (the
TPU Pallas requirement); the overlapping READS come from whole-matrix VMEM
residency per batch element.

Enabled through ops.pallas.probe (never on relay tunnels); the jnp reference
is numerically identical and serves CPU/fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SUB = 8  # output tiles per grid step (sublane alignment)


def _block_rows(r: int) -> int:
    """Rows loaded per grid step: SUB + r - 1 rounded up to the sublane tile
    (Mosaic requires dynamic sublane starts to be 8-aligned, so the kernel
    loads ONE aligned block and takes value-level shifted slices of it)."""
    return SUB * (1 + (r - 1 + SUB - 1) // SUB)


def _make_kernel(r: int, hop: int, batched: bool):
    import jax.experimental.pallas as pl

    def kernel(wf_ref, win_ref, o_ref):
        t0 = pl.program_id(1 if batched else 0) * SUB  # 8-aligned start
        h = _block_rows(r)
        if batched:
            block = wf_ref[0, pl.ds(t0, h), :]
        else:
            block = wf_ref[pl.ds(t0, h), :]
        acc = jnp.zeros((SUB, hop), jnp.float32)
        for m in range(r):
            sl = slice((r - 1 - m) * hop, (r - m) * hop)
            rows = jax.lax.slice(block, (m, sl.start), (m + SUB, sl.stop))
            acc = acc + rows * win_ref[0, sl]
        if batched:
            o_ref[0, :, :] = acc
        else:
            o_ref[:, :] = acc

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def windowed_ola_pallas(frames: jnp.ndarray, window: jnp.ndarray, hop: int) -> jnp.ndarray:
    """frames [..., N, L] * window [L], overlap-added -> [..., (N-1)*hop + L].

    Requires hop | L; batch rank 0 or 1 (flatten higher ranks first).
    Linear in both inputs, so training paths differentiate through it via the
    custom VJP below (pallas_call has no generic JVP rule).
    """
    return _windowed_ola_pallas_impl(frames, window, hop)


def _ola_fwd(frames, window, hop):
    return _windowed_ola_pallas_impl(frames, window, hop), (frames, window)


def _ola_bwd(hop, res, g):
    from audio_cut_tpu.ops.stft import frame_signal

    frames, window = res
    n, L = frames.shape[-2], frames.shape[-1]
    # adjoint of OLA = re-framing the cotangent; adjoint of the window
    # multiply = elementwise scale / reduce over all frames
    g_frames_raw = frame_signal(g, L, hop, center=False)[..., :n, :]
    g_frames = g_frames_raw * window
    g_window = jnp.sum(g_frames_raw * frames, axis=tuple(range(g_frames_raw.ndim - 1)))
    return g_frames, g_window


windowed_ola_pallas.defvjp(_ola_fwd, _ola_bwd)


@functools.partial(jax.jit, static_argnames=("hop",))
def _windowed_ola_pallas_impl(frames: jnp.ndarray, window: jnp.ndarray, hop: int) -> jnp.ndarray:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if frames.ndim not in (2, 3):
        raise ValueError("windowed_ola_pallas expects [..., N, L] with <=1 batch dim")
    n, L = frames.shape[-2], frames.shape[-1]
    if L % hop:
        raise ValueError("hop must divide the frame length")
    r = L // hop
    total = (n - 1) * hop + L
    n_tiles = n + r - 1
    n_tiles_pad = ((n_tiles + SUB - 1) // SUB) * SUB
    # top pad r-1 (formulation alignment); bottom pad so the last aligned
    # block read of _block_rows(r) rows stays in bounds
    rows_pad = (n_tiles_pad - SUB) + _block_rows(r)
    batched = frames.ndim == 3
    pad = [(0, 0)] * (frames.ndim - 2) + [(r - 1, rows_pad - (r - 1) - n), (0, 0)]
    wf = jnp.pad(frames.astype(jnp.float32), pad)
    win2d = window.astype(jnp.float32).reshape(1, L)

    if batched:
        grid = (frames.shape[0], n_tiles_pad // SUB)
        in_specs = [
            pl.BlockSpec((1, rows_pad, L), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ]
        out_specs = pl.BlockSpec((1, SUB, hop), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((frames.shape[0], n_tiles_pad, hop), jnp.float32)
    else:
        grid = (n_tiles_pad // SUB,)
        in_specs = [
            pl.BlockSpec((rows_pad, L), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ]
        out_specs = pl.BlockSpec((SUB, hop), lambda j: (j, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_tiles_pad, hop), jnp.float32)

    out = pl.pallas_call(
        _make_kernel(r, hop, batched),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(wf, win2d)
    flat = out.reshape(out.shape[:-2] + (n_tiles_pad * hop,))
    return flat[..., :total]


def windowed_ola_reference(frames: jnp.ndarray, window: jnp.ndarray, hop: int) -> jnp.ndarray:
    """jnp implementation with identical semantics (dense r-shift adds)."""
    from audio_cut_tpu.ops.stft import overlap_add

    return overlap_add(frames * window, hop)


def windowed_ola_interpret(frames: jnp.ndarray, window: jnp.ndarray, hop: int) -> jnp.ndarray:
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return windowed_ola_pallas(frames, window, hop)


# VMEM budget: whole frame matrix resident per grid step
_VMEM_LIMIT_BYTES = 12 * 1024 * 1024


def windowed_ola(frames: jnp.ndarray, window: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Probe-gated dispatcher used by ops.stft.istft."""
    from audio_cut_tpu.ops.pallas.probe import pallas_supported

    n, L = frames.shape[-2], frames.shape[-1]
    fits = (n + 2 * (L // hop) + SUB) * L * 4 <= _VMEM_LIMIT_BYTES
    if L % hop == 0 and frames.ndim in (2, 3) and fits and pallas_supported():
        try:
            return windowed_ola_pallas(frames, window, hop)
        except Exception:  # pragma: no cover - kernel availability varies
            pass
    return windowed_ola_reference(frames, window, hop)
