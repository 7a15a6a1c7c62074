"""Device-side PCM_24 packing (ops/pcm.py) vs the host codec."""

import numpy as np
import pytest

from audio_cut_tpu.native import get_pcm_codec
from audio_cut_tpu.ops.pcm import (
    pcm24_pack_graph,
    pcm24_planes_to_float,
    pcm24_planes_to_payload,
)

LSB = 1.0 / 8388607.0


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(42)
    x = np.concatenate([
        rng.uniform(-1.0, 1.0, 20000).astype(np.float32),   # full-scale
        (rng.standard_normal(20000) * 0.01).astype(np.float32),  # quiet
        np.array([0.0, 1.0, -1.0, 1.5, -1.5, 0.5, -0.5], np.float32),  # edges
    ])
    return x


def test_payload_matches_host_codec_within_one_lsb(signal):
    import jax

    planes = np.asarray(jax.jit(pcm24_pack_graph)(signal))
    device_payload = pcm24_planes_to_payload(planes)
    host_payload = get_pcm_codec().encode_pcm24(signal)
    assert len(device_payload) == len(host_payload) == signal.size * 3
    # device rounds the f32 product, host the f64 product: <= 1 LSB apart
    d = pcm24_planes_to_float(planes).astype(np.float64)
    h = get_pcm_codec().decode_pcm24(host_payload).astype(np.float64)
    assert np.max(np.abs(d - h)) <= LSB * 1.000001
    # and the overwhelming majority must be bit-identical
    assert np.mean(d == h) > 0.99


def test_planes_float_is_exact_file_decode(signal, tmp_path):
    """pcm24_planes_to_float must equal what the written file decodes to."""
    import jax

    from audio_cut_tpu.io.wavio import read_wav, write_wav_payload

    planes = np.asarray(jax.jit(pcm24_pack_graph)(signal))
    payload = pcm24_planes_to_payload(planes)
    p = tmp_path / "x.wav"
    write_wav_payload(p, payload, 44100, bits=24, channels=1)
    decoded, sr = read_wav(p)
    assert sr == 44100
    np.testing.assert_array_equal(decoded, pcm24_planes_to_float(planes))


def test_round_trip_quantization_error(signal):
    import jax

    planes = np.asarray(jax.jit(pcm24_pack_graph)(signal))
    back = pcm24_planes_to_float(planes).astype(np.float64)
    clipped = np.clip(signal.astype(np.float64), -1.0, 1.0)
    # -8388608 (the two's-complement floor) decodes to slightly below -1.0
    assert np.max(np.abs(back - clipped)) <= LSB * 1.000001
