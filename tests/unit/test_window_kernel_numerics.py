"""Regression: windowed RMS kernels must not cancel catastrophically.

A loud multi-minute track drives a float32 prefix sum to ~1e4-1e5 while quiet
windows hold ~1e-7 of energy; prefix-difference implementations produced
negative sums -> NaN. Kernels must sum windows locally.
"""

import jax.numpy as jnp
import numpy as np

from audio_cut_tpu.ops.frames import frame_rms, moving_rms_db, smooth


def _loud_track_with_quiet_gap(minutes: float = 2.0, sr: int = 44100):
    n = int(minutes * 60 * sr)
    t = np.arange(n) / sr
    x = (0.8 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    a, b = int(0.6 * n), int(0.62 * n)
    x[a:b] = 1e-5  # near-silence after minutes of loud signal
    return x, a, b


def test_frame_rms_no_nan_and_resolves_quiet_gap():
    x, a, b = _loud_track_with_quiet_gap()
    hop = 441
    rms = np.asarray(frame_rms(jnp.asarray(x), 1102, hop))
    assert not np.isnan(rms).any()
    gap_frames = rms[(a // hop) + 3:(b // hop) - 3]
    assert gap_frames.size > 0
    assert gap_frames.max() < 1e-3, "quiet gap must resolve well below the loud level"
    assert abs(float(np.median(rms[: a // hop - 5])) - 0.8 / np.sqrt(2)) < 0.02


def test_moving_rms_db_no_nan_and_monotone():
    x, a, b = _loud_track_with_quiet_gap(minutes=1.0)
    db = np.asarray(moving_rms_db(jnp.asarray(x), 3528))
    assert not np.isnan(db).any()
    assert db.shape == x.shape
    mid_gap = db[(a + b) // 2]
    loud = db[a // 2]
    assert mid_gap < loud - 40


def test_smooth_no_nan_long():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(200_000).astype(np.float32) * 10)
    s = np.asarray(smooth(x, 501))
    assert not np.isnan(s).any()
