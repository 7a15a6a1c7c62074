import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from audio_cut_tpu.ops.stft import stft, istft
from audio_cut_tpu.ops.frames import (
    frame_rms, spectral_flatness, onset_envelope, mdd_series, moving_rms_db, smooth,
)
from audio_cut_tpu.ops.beats import estimate_tempo, beat_times_from_tempo, classify_bpm


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(44100).astype(np.float32) * 0.3
    n_fft, hop = 2048, 512
    spec = stft(jnp.asarray(x), n_fft, hop)
    y = np.asarray(istft(spec, n_fft, hop, length=x.size))
    assert y.shape == x.shape
    # interior must reconstruct tightly (edges depend on padding mode)
    err = np.abs(y[n_fft:-n_fft] - x[n_fft:-n_fft]).max()
    assert err < 1e-4


def test_stft_shape():
    x = jnp.zeros(10000)
    spec = stft(x, 1024, 256)
    assert spec.shape == (10000 // 256 + 1, 513)


def test_frame_rms_constant():
    sr, hop = 44100, 2205
    x = jnp.ones(sr * 2) * 0.5
    rms = np.asarray(frame_rms(x, 2048, hop))
    assert rms.shape[0] == (sr * 2) // hop + 1
    assert np.allclose(rms[2:-2], 0.5, atol=1e-4)


def test_frame_rms_silence_gap():
    sr, hop = 44100, 2205
    x = np.ones(sr * 3, dtype=np.float32) * 0.5
    x[sr:2 * sr] = 0.0
    rms = np.asarray(frame_rms(jnp.asarray(x), 2048, hop))
    mid = rms[int(1.5 / 0.05)]
    assert mid < 1e-3


def test_spectral_flatness_noise_vs_tone():
    rng = np.random.default_rng(1)
    sr = 22050
    noise = rng.standard_normal(sr).astype(np.float32)
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    fn = np.median(np.asarray(spectral_flatness(jnp.asarray(noise), 2048, 512)))
    ft = np.median(np.asarray(spectral_flatness(jnp.asarray(tone), 2048, 512)))
    assert fn > 0.3
    assert ft < 0.01


def test_onset_envelope_peaks_at_impulses():
    sr, hop = 22050, 512
    x = np.zeros(sr * 2, dtype=np.float32)
    impulse_times = [0.5, 1.0, 1.5]
    for it in impulse_times:
        i = int(it * sr)
        x[i:i + 400] = np.random.default_rng(2).standard_normal(400) * 0.8
    env = np.asarray(onset_envelope(jnp.asarray(x), 2048, hop))
    fps = sr / hop
    for it in impulse_times:
        f = int(it * fps)
        window = env[max(0, f - 2):f + 3]
        assert window.max() > 3 * np.median(env)


def test_mdd_range():
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.random(100, dtype=np.float64).astype(np.float32))
    f = jnp.asarray(rng.random(100, dtype=np.float64).astype(np.float32))
    o = jnp.asarray(rng.random(100, dtype=np.float64).astype(np.float32))
    m = np.asarray(mdd_series(r, f, o))
    assert (m >= 0).all() and (m <= 1).all()


def test_moving_rms_db_monotone_in_amplitude():
    x = np.concatenate([np.ones(1000) * 0.9, np.ones(1000) * 0.01]).astype(np.float32)
    db = np.asarray(moving_rms_db(jnp.asarray(x), 101))
    assert db[400] > db[1600] + 20


def test_smooth_mean_preserving():
    x = jnp.asarray(np.arange(10, dtype=np.float32))
    s = np.asarray(smooth(x, 3))
    assert s.shape == (10,)
    assert abs(s[5] - 5.0) < 1e-5


def test_tempo_estimation_click_track():
    sr, hop = 22050, 512
    fps = sr / hop
    duration = 20.0
    x = np.zeros(int(sr * duration), dtype=np.float32)
    period_s = 0.5  # 120 BPM
    for b in np.arange(0.1, duration, period_s):
        i = int(b * sr)
        x[i:i + 300] += np.hanning(300).astype(np.float32)
    env = np.asarray(onset_envelope(jnp.asarray(x), 2048, hop))
    res = estimate_tempo(jnp.asarray(env), fps=fps)
    bpm = float(res.bpm)
    assert abs(bpm - 120.0) < 6.0 or abs(bpm - 60.0) < 3.0  # octave ambiguity ok
    beats = beat_times_from_tempo(res, fps=fps, duration_s=duration)
    assert beats.size > 10
    # beats should land near click times modulo the period
    clicks = np.arange(0.1, duration, period_s)
    d = np.abs(beats[:, None] - clicks[None, :]).min(axis=1)
    assert np.median(d) < 0.08


def test_classify_bpm():
    assert classify_bpm(60) == "slow"
    assert classify_bpm(120) == "medium"
    assert classify_bpm(170) == "fast"
