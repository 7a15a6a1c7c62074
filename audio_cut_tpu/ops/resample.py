"""MXU-friendly polyphase resampler (device).

One dense per-frame matrix folds the anti-alias FIR *and* the per-phase
linear interpolation, so a whole-track resample is frames-of-x @ W — a
dense (width x up) matmul the MXU eats, instead of a single-channel dilated
conv (which XLA executes on the VPU at ~50x the cost; measured r2:
0.5 s/track vs sub-ms). Originated in the fused ConvVAD path
(models/vad.py); generalized here for the 16 kHz ASR detection copies the
reference produced on the host (reference audio_resample.py:27-46).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np


@functools.lru_cache(maxsize=8)
def lowpass_taps(sr_in: int, cutoff_hz: float, n_taps: int = 127) -> np.ndarray:
    """Windowed-sinc anti-alias FIR for the device resampler."""
    m = np.arange(n_taps) - (n_taps - 1) / 2.0
    h = 2.0 * cutoff_hz / sr_in * np.sinc(2.0 * cutoff_hz / sr_in * m)
    h *= np.hamming(n_taps)
    return (h / h.sum()).astype(np.float32)


@functools.lru_cache(maxsize=8)
def resample_matrix(sr_in: int, sr_out: int) -> Tuple[np.ndarray, int, int, int]:
    """(W, up, down, left_pad): x_out[up*q + p] = sum_c W[c, p] *
    x[down*q - left_pad + c]."""
    # anti-alias below the OUTPUT Nyquist when downsampling (and below the
    # input Nyquist when upsampling, against interpolation images); 0.47
    # leaves the same transition margin as the original 7.5 kHz @ 16 kHz
    cutoff_hz = 0.47 * min(sr_in, sr_out)
    taps = lowpass_taps(sr_in, cutoff_hz).astype(np.float64)
    n_taps = taps.size
    half = (n_taps - 1) // 2
    g = math.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    width = down + n_taps - 1 + 1  # interp needs base and base+1
    W = np.zeros((width, up), dtype=np.float64)
    for p in range(up):
        pos = p * down / up
        base = int(pos)
        frac = pos - base
        for k in range(n_taps):
            # x_lp[m] = sum_k taps[k] * x[m + k - half]
            W[base + k, p] += taps[k] * (1.0 - frac)
            W[base + 1 + k, p] += taps[k] * frac
    return W.astype(np.float32), up, down, half


def resample_graph(x, sr_in: int, sr_out: int):
    """Traceable whole-waveform resample: [n] f32 @ sr_in -> [m] f32 @ sr_out.

    HIGHEST precision keeps the matmul in f32 (TPU matmuls default to bf16,
    too coarse for audio). ``x.shape[-1]`` is static at trace time.
    """
    import jax
    import jax.numpy as jnp

    in_len = int(x.shape[-1])
    out_len = int(round(in_len * sr_out / sr_in))
    Wmat, up, down, half = resample_matrix(sr_in, sr_out)
    width = Wmat.shape[0]
    n_frames = -(-out_len // up)
    n_shift = -(-width // down)  # shifted reshapes needed to cover `width`
    xp = jnp.pad(
        x, (half, max(0, (n_frames + n_shift - 1) * down + width - half - in_len))
    )
    # overlapping frame columns come from dense shifted reshapes (gathers are
    # slow on this chip, see ops/frames.py); shift j supplies columns
    # [j*down, (j+1)*down) of each width-wide frame
    parts = [
        xp[j * down: (n_frames + j) * down].reshape(n_frames, down)
        for j in range(n_shift)
    ]
    frames = jnp.concatenate(parts, axis=1)[:, :width]
    full = jnp.matmul(
        frames, jnp.asarray(Wmat), precision=jax.lax.Precision.HIGHEST
    ).reshape(-1)
    return full[:out_len]
