"""Tempo estimation and beat tracking on-device.

Replaces librosa.beat.beat_track (reference
src/vocal_smart_splitter/core/adaptive_vad_enhancer.py:48, BPMAnalyzer) with a
JAX pipeline: onset-envelope autocorrelation over a lag window mapped to
30-240 BPM, log-normal tempo prior, then a best-phase beat grid search (the
grid maximises summed onset strength; fully vectorised, no DP).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TempoResult(NamedTuple):
    bpm: jnp.ndarray            # scalar f32
    period_frames: jnp.ndarray  # scalar f32: frames per beat
    phase_frames: jnp.ndarray   # scalar f32: offset of first beat
    strength: jnp.ndarray       # scalar f32: autocorr peak salience in [0,1]


@functools.partial(jax.jit, static_argnames=("fps", "min_bpm", "max_bpm", "n_phases"))
def estimate_tempo(
    onset_env: jnp.ndarray,
    fps: float,
    min_bpm: float = 30.0,
    max_bpm: float = 240.0,
    n_phases: int = 64,
) -> TempoResult:
    """Estimate global tempo + beat phase from an onset envelope [T]."""
    env = onset_env - jnp.mean(onset_env)
    t = env.shape[-1]

    # autocorrelation via FFT (power spectrum -> inverse)
    nfft = 1 << int(np.ceil(np.log2(max(4, 2 * t))))
    spec = jnp.fft.rfft(env, n=nfft)
    ac = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft)[:t]
    ac = ac / jnp.maximum(ac[0], 1e-10)

    lags = jnp.arange(t, dtype=jnp.float32)
    bpm_of_lag = jnp.where(lags > 0, 60.0 * fps / jnp.maximum(lags, 1.0), 0.0)
    valid = (bpm_of_lag >= min_bpm) & (bpm_of_lag <= max_bpm)
    # log-normal prior centred at 120 BPM (librosa-style)
    prior = jnp.exp(-0.5 * ((jnp.log2(jnp.maximum(bpm_of_lag, 1e-3)) - jnp.log2(120.0)) / 1.0) ** 2)
    score = jnp.where(valid, ac * prior, -jnp.inf)
    best_lag = jnp.argmax(score)
    # parabolic interpolation around the peak for sub-frame period precision
    l0 = jnp.clip(best_lag, 1, t - 2)
    ym1, y0, yp1 = ac[l0 - 1], ac[l0], ac[l0 + 1]
    denom = ym1 - 2.0 * y0 + yp1
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (ym1 - yp1) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    period = jnp.maximum(best_lag.astype(jnp.float32) + delta, 1.0)
    bpm = 60.0 * fps / period
    strength = jnp.clip(ac[best_lag], 0.0, 1.0)

    # best beat phase: place a comb of beats at each trial phase, pick the
    # phase whose comb collects the most onset strength
    phases = jnp.arange(n_phases, dtype=jnp.float32) / n_phases * period
    max_beats = t  # static upper bound
    k = jnp.arange(max_beats, dtype=jnp.float32)
    pos = phases[:, None] + k[None, :] * period               # [n_phases, max_beats]
    idx = jnp.clip(jnp.round(pos).astype(jnp.int32), 0, t - 1)
    in_range = pos < t
    gains = jnp.sum(jnp.where(in_range, jnp.take(onset_env, idx), 0.0), axis=1)
    phase = phases[jnp.argmax(gains)]

    return TempoResult(bpm=bpm, period_frames=period, phase_frames=phase, strength=strength)


def beat_times_from_tempo(
    tempo: TempoResult, fps: float, duration_s: float
) -> np.ndarray:
    """Materialise the beat grid on host as times in seconds."""
    period_s = float(tempo.period_frames) / fps
    phase_s = float(tempo.phase_frames) / fps
    if period_s <= 0:
        return np.zeros((0,), dtype=np.float64)
    n = max(0, int((duration_s - phase_s) / period_s) + 1)
    beats = phase_s + np.arange(n) * period_s
    return beats[beats < duration_s]


def classify_bpm(bpm: float) -> str:
    """BPM category used by threshold adaptation (parity: reference
    src/audio_cut/config/derive.py:287-326 — slow <90, fast >140)."""
    if bpm < 90.0:
        return "slow"
    if bpm > 140.0:
        return "fast"
    return "medium"


def group_bars(beat_times: np.ndarray, time_signature: int = 4) -> np.ndarray:
    """Bar start times: every `time_signature`-th beat."""
    if beat_times.size == 0:
        return beat_times
    return beat_times[::time_signature]
