import numpy as np
import pytest

from audio_cut_tpu.native.loader import PcmCodec, get_pcm_codec, native_available


@pytest.fixture(scope="module")
def codec():
    return get_pcm_codec()


def test_native_library_builds(codec):
    # g++ is baked into this image; the native path must actually build here
    assert codec.is_native, "native codec should compile with the system g++"


def test_pcm24_roundtrip_native(codec, rng):
    audio = rng.uniform(-1, 1, 100_000).astype(np.float32)
    back = codec.decode_pcm24(codec.encode_pcm24(audio))
    assert back.shape == audio.shape
    assert np.max(np.abs(back - audio)) <= 2.0 / 8388607


def test_pcm24_native_matches_numpy(codec, rng):
    if not codec.is_native:
        pytest.skip("no native codec")
    audio = rng.uniform(-1.2, 1.2, 50_000).astype(np.float32)  # incl. clipping range
    native_bytes = codec.encode_pcm24(audio)
    fallback = PcmCodec()
    fallback._lib = None
    numpy_bytes = fallback.encode_pcm24(audio)
    nb = np.frombuffer(native_bytes, np.uint8)
    fb = np.frombuffer(numpy_bytes, np.uint8)
    assert nb.size == fb.size
    # both use round-to-nearest; allow 1-LSB disagreement on exact .5 ties
    n = nb.size // 3
    nv = nb.reshape(-1, 3).astype(np.int32)
    fv = fb.reshape(-1, 3).astype(np.int32)
    ni = (nv[:, 0] | (nv[:, 1] << 8) | (nv[:, 2] << 16) ^ 0x800000) - 0x800000
    fi = (fv[:, 0] | (fv[:, 1] << 8) | (fv[:, 2] << 16) ^ 0x800000) - 0x800000
    assert np.abs(ni - fi).max() <= 1


def test_pcm16_roundtrip(codec, rng):
    audio = rng.uniform(-1, 1, 10_000).astype(np.float32)
    data = codec.encode_pcm16(audio)
    back = np.frombuffer(data, "<i2").astype(np.float32) / 32767.0
    assert np.max(np.abs(back - audio)) <= 2.0 / 32767


def test_peak_rms(codec):
    audio = np.zeros(1000, np.float32)
    audio[500] = -0.75
    peak, rms = codec.peak_rms(audio)
    assert abs(peak - 0.75) < 1e-6
    assert abs(rms - 0.75 / np.sqrt(1000)) < 1e-6


def test_wav_write_uses_codec(tmp_path, rng):
    from audio_cut_tpu.io.wavio import read_wav, write_wav

    audio = rng.uniform(-0.9, 0.9, 44100).astype(np.float32)
    p = tmp_path / "n.wav"
    write_wav(p, audio, 44100, subtype="PCM_24")
    back, sr = read_wav(p)
    assert sr == 44100
    assert np.max(np.abs(back - audio)) <= 2.0 / 8388607
