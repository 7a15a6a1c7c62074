"""MXU resampler (ops/resample.py) vs the host polyphase reference."""

import numpy as np

from audio_cut_tpu.io.audio import resample_poly
from audio_cut_tpu.ops.resample import resample_graph


def _snr_db(ref: np.ndarray, est: np.ndarray) -> float:
    n = min(ref.size, est.size)
    ref, est = ref[:n].astype(np.float64), est[:n].astype(np.float64)
    noise = ref - est
    return 10.0 * np.log10(np.sum(ref ** 2) / max(np.sum(noise ** 2), 1e-30))


def test_resample_graph_matches_host_polyphase():
    """Band-limited content must agree with scipy's polyphase to >30 dB
    (different anti-alias filters; both valid 16 kHz detection copies)."""
    import jax

    sr = 44100
    rng = np.random.default_rng(0)
    t = np.arange(sr * 3) / sr
    x = np.zeros_like(t, dtype=np.float64)
    for f in (220.0, 440.0, 990.0, 2500.0, 5200.0):
        x += rng.uniform(0.05, 0.3) * np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
    x = (0.8 * x / np.abs(x).max()).astype(np.float32)

    dev = np.asarray(jax.jit(lambda a: resample_graph(a, sr, 16000))(x))
    host = resample_poly(x, sr, 16000)
    assert dev.size == int(round(x.size * 16000 / sr))
    # trim filter edge transients before comparing
    m = 2000
    assert _snr_db(host[m:-m], dev[m:-m]) > 30.0


def test_resample_graph_small_down_factor():
    """Rate pairs where down < n_taps (e.g. 44.1k->22.05k, down=2) need more
    than one shifted reshape to cover the frame width — regression for the
    two-part framing that only supported down >= n_taps."""
    import jax

    sr_in, sr_out = 44100, 22050
    rng = np.random.default_rng(1)
    t = np.arange(sr_in * 2) / sr_in
    x = np.zeros_like(t, dtype=np.float64)
    for f in (330.0, 880.0, 3100.0):
        x += rng.uniform(0.1, 0.3) * np.sin(2 * np.pi * f * t)
    x = (0.8 * x / np.abs(x).max()).astype(np.float32)

    dev = np.asarray(jax.jit(lambda a: resample_graph(a, sr_in, sr_out))(x))
    host = resample_poly(x, sr_in, sr_out)
    assert dev.size == int(round(x.size * sr_out / sr_in))
    m = 2000
    assert _snr_db(host[m:-m], dev[m:-m]) > 30.0


def test_device_asr_copy_file(tmp_path):
    """write_asr_copy_from_device emits a 16 kHz PCM_16 file equivalent to
    the host path within quantization + filter difference."""
    import jax.numpy as jnp

    from audio_cut_tpu.io.audio import write_asr_copy, write_asr_copy_from_device
    from audio_cut_tpu.io.wavio import read_wav, wav_info

    sr = 44100
    t = np.arange(sr * 2) / sr
    x = (0.5 * np.sin(2 * np.pi * 330 * t) * (t < 1.2)).astype(np.float32)

    p_dev = tmp_path / "dev.wav"
    p_host = tmp_path / "host.wav"
    write_asr_copy_from_device(jnp.asarray(x), sr, p_dev)
    write_asr_copy(x, sr, p_host)

    info = wav_info(p_dev)
    assert info.sample_rate == 16000 and info.subtype == "PCM_16"
    d, _ = read_wav(p_dev)
    h, _ = read_wav(p_host)
    assert d.size == h.size
    m = 1000
    assert _snr_db(h[m:-m], d[m:-m]) > 30.0
