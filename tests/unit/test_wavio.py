import numpy as np
import pytest

from audio_cut_tpu.io.wavio import read_wav, wav_info, write_wav


@pytest.mark.parametrize("subtype,tol", [
    ("PCM_16", 1.0 / 32767),
    ("PCM_24", 1.0 / 8388607),
    ("PCM_32", 1e-7),
    ("FLOAT", 0.0),
])
def test_roundtrip_mono(tmp_path, subtype, tol):
    sr = 44100
    t = np.arange(sr // 2, dtype=np.float32) / sr
    audio = (0.7 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "x.wav"
    write_wav(p, audio, sr, subtype=subtype)
    back, sr2 = read_wav(p)
    assert sr2 == sr
    assert back.shape == audio.shape
    assert np.max(np.abs(back - audio)) <= tol + 1e-9


def test_roundtrip_stereo_pcm24(tmp_path):
    sr = 22050
    audio = np.random.default_rng(0).uniform(-0.9, 0.9, size=(1000, 2)).astype(np.float32)
    p = tmp_path / "st.wav"
    write_wav(p, audio, sr, subtype="PCM_24")
    back, sr2 = read_wav(p)
    assert back.shape == (1000, 2)
    assert np.max(np.abs(back - audio)) < 2.0 / 8388607


def test_wav_info(tmp_path):
    sr = 16000
    audio = np.zeros(sr, dtype=np.float32)
    p = tmp_path / "i.wav"
    write_wav(p, audio, sr, subtype="PCM_24")
    info = wav_info(p)
    assert info.sample_rate == sr
    assert info.frames == sr
    assert info.bits_per_sample == 24
    assert info.subtype == "PCM_24"
    assert abs(info.duration - 1.0) < 1e-9


def test_float64_and_pcm8_decode(tmp_path):
    # hand-build a PCM_16 file then verify extremes clip safely on write
    sr = 8000
    audio = np.array([1.5, -1.5, 0.0], dtype=np.float32)
    p = tmp_path / "c.wav"
    write_wav(p, audio, sr, subtype="PCM_16")
    back, _ = read_wav(p)
    assert back[0] > 0.99 and back[1] < -0.99 and abs(back[2]) < 1e-6
