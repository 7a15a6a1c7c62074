"""Test harness: force an 8-device virtual CPU mesh before JAX initialises.

The driver's multi-chip dry-run uses the same mechanism
(xla_force_host_platform_device_count); production code never depends on it.
"""

import os

# Force CPU regardless of the ambient JAX_PLATFORMS (the shell may point at a
# real TPU); tests must be fast and deterministic. Opt back into TPU with
# AUDIO_CUT_TPU_TEST_TPU=1 for the @pytest.mark.tpu tier.
if not os.environ.get("AUDIO_CUT_TPU_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    # pytest plugins (jaxtyping & co.) import jax BEFORE this conftest runs,
    # which freezes config defaults from the ambient env (JAX_PLATFORMS=axon
    # under the TPU tunnel). Force the values through the config API too.
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass  # older knob; XLA_FLAGS fallback above covers it

# The production default separator is the packaged ConvTDF (full n_fft-6144
# geometry) — far too slow for the 1-core CPU test loop. Pin the model-free
# spectral tier through the env config layer (below runtime overrides, so
# set_runtime_config/reset_runtime_config in tests behave normally); the
# neural fast path has dedicated coverage in test_neural_fast_path.py and
# the model-marked tier. Mirrors the reference's test strategy (its suite
# never runs real MDX23 either; fakes + capability markers, SURVEY §4).
os.environ.setdefault("VSS__enhanced_separation__backend", "spectral")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """model-marked tier auto-skips unless opted in (reference convention:
    pytest.ini markers + VSS_RUN_* env gates, reference conftest.py:55-85)."""
    marker_expr = config.getoption("-m", default="") or ""
    # only an expression that actually references the model marker opts in;
    # an unrelated filter (e.g. -m "not slow") must still get the auto-skip
    if os.environ.get("AUDIO_CUT_TPU_RUN_MODEL") or "model" in marker_expr:
        return
    skip = pytest.mark.skip(reason="model tier: set AUDIO_CUT_TPU_RUN_MODEL=1 or -m model")
    for item in items:
        if "model" in item.keywords:
            item.add_marker(skip)
    # acceptance tier: multi-minute full-pipeline runs over the frozen
    # long-form corpus — CI-slow, opt-in (same convention as the model tier)
    if not (os.environ.get("AUDIO_CUT_TPU_RUN_ACCEPTANCE")
            or "acceptance" in marker_expr):
        skip_acc = pytest.mark.skip(
            reason="acceptance tier: set AUDIO_CUT_TPU_RUN_ACCEPTANCE=1 or -m acceptance")
        for item in items:
            if "acceptance" in item.keywords:
                item.add_marker(skip_acc)


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


@pytest.fixture()
def sine_audio():
    """10 s of 440 Hz sine at 44.1 kHz with silent gaps (natural pauses)."""
    sr = 44100
    t = np.arange(sr * 10, dtype=np.float32) / sr
    audio = 0.5 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    # carve three silent pauses
    for start, dur in ((2.0, 0.8), (5.0, 0.6), (7.5, 0.9)):
        audio[int(start * sr):int((start + dur) * sr)] = 0.0
    return audio, sr


def make_song(duration_s: float = 20.0, sr: int = 44100, seed: int = 7):
    """Synthetic 'song': harmonic vocal-ish bursts over a percussive bed,
    with genuine quiet gaps between phrases."""
    rng_ = np.random.default_rng(seed)
    n = int(duration_s * sr)
    t = np.arange(n, dtype=np.float64) / sr
    audio = np.zeros(n, dtype=np.float64)
    # percussive bed: clicks every 0.5 s (120 BPM)
    for beat in np.arange(0.0, duration_s, 0.5):
        i = int(beat * sr)
        env = np.exp(-np.arange(min(2000, n - i)) / 300.0)
        audio[i:i + env.size] += 0.12 * env * rng_.standard_normal(env.size)
    # vocal phrases: vibrato-modulated harmonics, 2-3 s phrases with gaps
    phrase = 0.0
    while phrase + 2.5 < duration_s:
        start, end = phrase, phrase + 2.2
        seg = (t >= start) & (t < end)
        f0 = 220.0 * (1 + 0.01 * np.sin(2 * np.pi * 5.5 * t[seg]))
        x = np.zeros(seg.sum())
        for h in range(1, 5):
            x += np.sin(2 * np.pi * h * np.cumsum(f0) / sr) / h
        fade = np.minimum(1.0, np.minimum(
            np.arange(seg.sum()) / (0.05 * sr),
            (seg.sum() - np.arange(seg.sum())) / (0.05 * sr)))
        audio[seg] += 0.35 * x * fade
        phrase = end + 0.8 + 0.4 * rng_.random()
    peak = np.abs(audio).max()
    if peak > 0:
        audio = 0.9 * audio / peak
    return audio.astype(np.float32), sr


@pytest.fixture()
def song_audio():
    return make_song()
