"""Voicing (F0) and formant (LPC) analysis kernels.

Role parity: the reference's legacy multi-feature pause mode scores pauses
with pyin F0 + LPC formants + centroid + harmonic ratio
(reference src/vocal_smart_splitter/core/pure_vocal_pause_detector.py:410-459,
618-844, via librosa.pyin / scipy LPC). TPU redesign:

* F0: one batched YIN pass — all frames' cumulative-mean-normalized
  difference functions computed from FFT autocorrelation in a single device
  program (no per-frame Python), followed by a tiny host Viterbi smoothing
  over coarse log-pitch bins (pyin's HMM role; N_frames x 32 bins, microseconds).
* Formants: batched frame autocorrelation on device, Levinson-Durbin as a
  `lax.scan` over the model order (order ~12 is sequential by nature but tiny),
  formant strength = 1 - normalized LPC residual (how much a vocal-tract
  resonance model explains the frame).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _frame(x: jnp.ndarray, frame: int, hop: int) -> jnp.ndarray:
    n = max(0, (x.shape[-1] - frame) // hop + 1)
    idx = jnp.arange(n)[:, None] * hop + jnp.arange(frame)[None, :]
    return x[idx]  # [N, frame]


@functools.partial(jax.jit, static_argnames=("frame", "hop", "tau_max"))
def _yin_cmnd(x: jnp.ndarray, frame: int, hop: int, tau_max: int) -> jnp.ndarray:
    """Cumulative-mean-normalized difference d'(tau) for every frame.

    d(tau) = sum_j (x[j] - x[j+tau])^2 over the frame, computed for all taus
    at once from the frame autocorrelation (FFT), then CMND-normalized.
    Returns [N, tau_max] with d'(0) = 1.
    """
    frames = _frame(x.astype(jnp.float32), frame, hop)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # autocorrelation r(tau) via FFT (power spectrum)
    nfft = 2 * frame
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    ac = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=-1)[:, :tau_max]
    # energy terms: e0(tau) = sum_{j<W-tau} x[j]^2, e1(tau) = sum_{j>=tau} x[j]^2
    sq = frames * frames
    csum = jnp.cumsum(sq, axis=-1)
    total = csum[:, -1:]
    taus = jnp.arange(tau_max)
    e0 = csum[:, frame - 1 - taus]                       # energy of x[0:W-tau]
    e1 = total - jnp.where(taus[None, :] > 0, csum[:, jnp.maximum(taus - 1, 0)], 0.0)
    d = jnp.maximum(e0 + e1 - 2.0 * ac, 0.0)             # [N, tau_max]
    # cumulative mean normalization
    cum = jnp.cumsum(d[:, 1:], axis=-1)
    denom = jnp.maximum(cum / jnp.arange(1, tau_max, dtype=jnp.float32)[None, :], 1e-12)
    cmnd = jnp.concatenate([jnp.ones_like(d[:, :1]), d[:, 1:] / denom], axis=-1)
    return cmnd, total[:, 0]                              # (+ frame energies)


def yin_f0(
    audio: np.ndarray,
    sr: int,
    frame_s: float = 0.04,
    hop_s: float = 0.01,
    fmin: float = 70.0,
    fmax: float = 500.0,
    n_bins: int = 32,
    switch_cost: float = 4.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-frame (f0_hz, voicing) with Viterbi pitch-track smoothing.

    voicing in [0, 1] = 1 - min CMND (strength of the best periodic
    explanation). f0 is 0 where the frame grid has no usable lag range.
    """
    frame = max(64, int(round(frame_s * sr)))
    hop = max(1, int(round(hop_s * sr)))
    tau_min = max(2, int(sr / fmax))
    tau_max = min(frame - 1, int(sr / fmin) + 1)
    if tau_max <= tau_min + 2 or audio.size < frame:
        return np.zeros(0, np.float32), np.zeros(0, np.float32)

    cmnd, energy = _yin_cmnd(jnp.asarray(audio), frame, hop, tau_max)
    cmnd, energy = np.asarray(cmnd), np.asarray(energy)
    band = cmnd[:, tau_min:tau_max]                       # [N, L]
    n_frames = band.shape[0]
    if n_frames == 0:
        return np.zeros(0, np.float32), np.zeros(0, np.float32)
    voicing = np.clip(1.0 - band.min(axis=-1), 0.0, 1.0)
    # silence gate: d(tau)=0 for all-zero frames makes CMND=0 ("perfectly
    # periodic"); a frame with no energy is unvoiced by definition
    rms = np.sqrt(energy / frame)
    voicing = np.where(rms > max(1e-5, 0.01 * float(rms.max() or 0.0)), voicing, 0.0)

    lags = np.arange(tau_min, tau_max)
    # YIN's absolute-threshold rule: a perfectly periodic signal scores ~0 at
    # the true period AND its multiples (subharmonics); prefer the SMALLEST
    # lag that drops below threshold by masking lags far beyond it
    below = band < 0.15
    has_dip = below.any(axis=1)
    first = np.argmax(below, axis=1)
    lag_cap = np.where(has_dip, lags[first] * 1.3, np.inf)
    band = np.where(lags[None, :] > lag_cap[:, None], 4.0, band)

    # coarse log-pitch bins for Viterbi (pyin's HMM smoothing role)
    freqs = sr / lags                                     # descending
    log_edges = np.linspace(np.log(fmin), np.log(fmax), n_bins + 1)
    bin_of_lag = np.clip(np.searchsorted(log_edges, np.log(freqs)) - 1, 0, n_bins - 1)
    # emission cost per bin = min CMND among that bin's lags
    emit = np.full((n_frames, n_bins), 4.0, np.float32)
    np.minimum.at(emit.T, bin_of_lag, band.T)             # scatter-min over lags
    # transition cost ~ |Δbin| (octave jumps are expensive)
    bins = np.arange(n_bins)
    trans = (np.abs(bins[:, None] - bins[None, :]) / n_bins) * switch_cost
    cost = emit[0].copy()
    back = np.zeros((n_frames, n_bins), np.int32)
    for i in range(1, n_frames):                          # tiny host DP
        step = cost[:, None] + trans
        back[i] = np.argmin(step, axis=0)
        cost = step[back[i], bins] + emit[i]
    path = np.zeros(n_frames, np.int32)
    path[-1] = int(np.argmin(cost))
    for i in range(n_frames - 1, 0, -1):
        path[i - 1] = back[i, path[i]]

    # refine: best lag within the chosen bin per frame, parabolic interp
    f0 = np.zeros(n_frames, np.float32)
    for i in range(n_frames):
        sel = np.nonzero(bin_of_lag == path[i])[0]
        if sel.size == 0:
            continue
        j = sel[int(np.argmin(band[i, sel]))]
        tau = float(lags[j])
        if 0 < j < band.shape[1] - 1:
            y0, y1, y2 = band[i, j - 1], band[i, j], band[i, j + 1]
            denom = y0 - 2 * y1 + y2
            if abs(denom) > 1e-12:
                tau += float(np.clip(0.5 * (y0 - y2) / denom, -1.0, 1.0))
        f0[i] = sr / tau
    return f0, voicing.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("frame", "hop", "order"))
def _lpc_residual(x: jnp.ndarray, frame: int, hop: int, order: int) -> jnp.ndarray:
    """Normalized LPC residual energy per frame.

    All-pole fit by the autocorrelation method, solved as ONE batched
    Toeplitz system (normal equations R a = r, [N, order, order]) instead of
    a sequential Levinson recursion — order ~12 makes the dense solve
    trivially cheap and it vectorises over every frame at once on the MXU.
    Returns [N] in [0, 1]: prediction-error energy / frame energy. Low
    residual = strong resonant (formant) structure; white noise stays near 1.
    """
    frames = _frame(x.astype(jnp.float32), frame, hop)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    win = jnp.hanning(frame).astype(jnp.float32)
    frames = frames * win[None, :]
    nfft = 2 * frame
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    r = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=-1)[:, : order + 1]  # [N, order+1]
    r0 = jnp.maximum(r[:, 0], 1e-12)
    rn = r / r0[:, None]                                  # normalize for conditioning
    i = jnp.arange(order)
    toe = rn[:, jnp.abs(i[:, None] - i[None, :])]         # [N, order, order]
    toe = toe + 1e-4 * jnp.eye(order)[None]               # silent-frame regularizer
    a = jnp.linalg.solve(toe, rn[:, 1: order + 1, None])[..., 0]  # [N, order]
    err = 1.0 - jnp.sum(a * rn[:, 1: order + 1], axis=-1)
    return jnp.clip(err, 0.0, 1.0)


def lpc_formant_strength(
    audio: np.ndarray,
    sr: int,
    frame_s: float = 0.04,
    hop_s: float = 0.01,
    order: int = 12,
) -> np.ndarray:
    """Per-frame formant strength in [0, 1] (1 = strongly resonant/voiced).

    Defined as 1 - normalized LPC residual energy: a vocal tract's all-pole
    resonances leave little residual; silence/noise leaves most of the energy.
    """
    frame = max(order * 4, int(round(frame_s * sr)))
    hop = max(1, int(round(hop_s * sr)))
    if audio.size < frame:
        return np.zeros(0, np.float32)
    res = np.asarray(_lpc_residual(jnp.asarray(audio), frame, hop, order))
    return np.clip(1.0 - res, 0.0, 1.0).astype(np.float32)


def lpc_formant_frequencies(
    segment: np.ndarray, sr: int, order: int = 12
) -> np.ndarray:
    """Formant frequencies (Hz) of one segment from LPC polynomial roots.

    Host-side (np.roots on an order-12 polynomial) — used per *pause
    segment*, not per frame, so cost is negligible. Returns sorted resonance
    frequencies with bandwidth < 700 Hz in the 150-5500 Hz band.
    """
    seg = np.asarray(segment, np.float64)
    seg = seg - seg.mean()
    if seg.size < order * 4 or not np.any(seg):
        return np.zeros(0, np.float64)
    # autocorrelation method on the host for one segment
    n = min(seg.size, 8192)
    s = seg[:n] * np.hanning(n)
    spec = np.fft.rfft(s, n=2 * n)
    r = np.fft.irfft(spec * np.conj(spec))[: order + 1]
    if r[0] <= 0:
        return np.zeros(0, np.float64)
    # Levinson-Durbin (host, tiny): a[i] such that x[n] ~ sum_i a[i] x[n-i]
    a = np.zeros(order + 1)
    err = r[0]
    for m in range(1, order + 1):
        acc = r[m] - np.dot(a[1:m], r[m - 1:0:-1])
        k = acc / err if err > 1e-12 else 0.0
        a_new = a.copy()
        a_new[m] = k
        a_new[1:m] = a[1:m] - k * a[m - 1:0:-1]
        a = a_new
        err *= (1.0 - k * k)
    poly = np.concatenate([[1.0], -a[1:]])
    roots = np.roots(poly)
    roots = roots[np.imag(roots) > 0]
    if roots.size == 0:
        return np.zeros(0, np.float64)
    freqs = np.angle(roots) * sr / (2 * np.pi)
    bw = -0.5 * sr / np.pi * np.log(np.clip(np.abs(roots), 1e-9, None))
    keep = (freqs > 150.0) & (freqs < 5500.0) & (bw < 700.0)
    return np.sort(freqs[keep])
