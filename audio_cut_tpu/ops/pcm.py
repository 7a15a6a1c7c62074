"""Device-side PCM_24 quantization for stem export.

The reference exported stems by downloading float stems and letting
libsndfile quantize on the host (src/audio_cut/audio_export.py:27-156).
Over the TPU tunnel the float32 download IS the bottleneck of the
stems-only mode (measured r3: ~0.9 s of a 1.2 s track), so this packs the
24-bit PCM bytes ON DEVICE — the VPU does the round+shift for free next to
the separation program — and ships 3 bytes/sample instead of 4.

Rounding parity: the host codec (native/pcm_codec.cpp:26, loader.py:110)
rounds the float64 product half-even; the TPU has no f64, so the device
rounds the float32 product. The f32 product of a full-scale sample sits in
[2^22, 2^23) where f32 spacing is 0.5-1.0, so the device value can differ
from the host codec by at most ONE 24-bit LSB (-138 dBFS) on loud samples.
`pcm24_planes_to_float` returns exactly the values the written file decodes
to, so downstream consumers (host complement instrumental) stay consistent
with the exported artifact.
"""

from __future__ import annotations

import numpy as np

_SCALE = 8388607.0  # matches the host codec (native/loader.py:110)


def pcm24_pack_graph(x):
    """Traceable: float stem [n] -> uint8 planes [3, n] (LE byte planes).

    Two's-complement int24 split into byte planes; planes (not interleaved
    bytes) keep the device layout dense and let the host assemble the WAV
    payload with one strided copy.
    """
    import jax.numpy as jnp

    q = jnp.clip(jnp.round(jnp.clip(x, -1.0, 1.0) * _SCALE), -8388608.0, 8388607.0)
    u = q.astype(jnp.int32).astype(jnp.uint32)
    b0 = (u & 0xFF).astype(jnp.uint8)
    b1 = ((u >> 8) & 0xFF).astype(jnp.uint8)
    b2 = ((u >> 16) & 0xFF).astype(jnp.uint8)
    return jnp.stack([b0, b1, b2])


def pcm16_pack_graph(x):
    """Traceable: float waveform [n] -> int16 [n] on the PCM_16 grid
    (scale 32767, matches native/loader.py:141 within 1 LSB; the device
    rounds the f32 product, the host codec the f64 one)."""
    import jax.numpy as jnp

    q = jnp.clip(jnp.round(jnp.clip(x, -1.0, 1.0) * 32767.0), -32768.0, 32767.0)
    return q.astype(jnp.int16)


_JITTED: dict = {}


def pcm24_pack_fn():
    """Module-cached jitted pcm24_pack_graph (a fresh jax.jit wrapper per
    call would carry its own compile cache and recompile every track)."""
    if "pack24" not in _JITTED:
        import jax

        _JITTED["pack24"] = jax.jit(pcm24_pack_graph)
    return _JITTED["pack24"]


def pcm24_planes_to_payload(planes: np.ndarray) -> bytes:
    """uint8 planes [3, n] -> packed little-endian 24-bit PCM payload."""
    planes = np.asarray(planes)
    n = planes.shape[1]
    out = np.empty((n, 3), np.uint8)
    out[:, 0] = planes[0]
    out[:, 1] = planes[1]
    out[:, 2] = planes[2]
    return out.tobytes()


def pcm24_planes_to_float(planes: np.ndarray) -> np.ndarray:
    """uint8 planes [3, n] -> float32, EXACTLY what the written file decodes
    to (same 1/8388607 scale as native/loader.py:129)."""
    planes = np.asarray(planes)
    i32 = (
        planes[0].astype(np.int32)
        | (planes[1].astype(np.int32) << 8)
        | (planes[2].astype(np.int32) << 16)
    )
    i32 = (i32 ^ 0x800000) - 0x800000  # sign-extend 24-bit
    return (i32.astype(np.float64) / _SCALE).astype(np.float32)
