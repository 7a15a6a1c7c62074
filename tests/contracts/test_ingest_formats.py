"""Compressed-format ingest contract (reference audio_processor.py:45 accepts
mp3/wav/flac/m4a via librosa; here: native WAV + ffmpeg-subprocess seam)."""

import shutil

import numpy as np
import pytest

from audio_cut_tpu.exceptions import AudioIOError
from audio_cut_tpu.io.audio import ffmpeg_available, load_audio
from audio_cut_tpu.io.wavio import write_wav

HAVE_FFMPEG = ffmpeg_available()


def test_wav_loads_natively(tmp_path):
    sr = 22050
    audio = (0.3 * np.sin(np.linspace(0, 200 * np.pi, sr))).astype(np.float32)
    p = tmp_path / "x.wav"
    write_wav(p, audio, sr, subtype="FLOAT")
    got, got_sr = load_audio(p)
    assert got_sr == sr
    np.testing.assert_allclose(got, audio, atol=1e-7)


def test_mp3_without_ffmpeg_is_clear_error(tmp_path, monkeypatch):
    """The error must name both the file and the remedy."""
    monkeypatch.setattr(shutil, "which", lambda _: None)
    p = tmp_path / "song.mp3"
    p.write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)
    with pytest.raises(AudioIOError, match="ffmpeg"):
        load_audio(p)


def test_unknown_extension_rejected(tmp_path):
    p = tmp_path / "song.xyz"
    p.write_bytes(b"data")
    with pytest.raises(AudioIOError, match="unsupported audio format"):
        load_audio(p)


@pytest.mark.skipif(not HAVE_FFMPEG, reason="ffmpeg not on PATH")
def test_flac_roundtrip_via_ffmpeg(tmp_path):
    import subprocess

    sr = 44100
    audio = (0.4 * np.sin(np.linspace(0, 880 * np.pi, sr * 2))).astype(np.float32)
    wav = tmp_path / "x.wav"
    write_wav(wav, audio, sr, subtype="PCM_24")
    flac = tmp_path / "x.flac"
    subprocess.run(["ffmpeg", "-v", "error", "-i", str(wav), str(flac)], check=True)
    got, got_sr = load_audio(flac, mono=True)
    assert got_sr == sr
    assert got.shape[0] == audio.shape[0]
    assert np.max(np.abs(got - audio)) < 1e-3  # lossless codec, PCM24 quantized


@pytest.mark.skipif(not HAVE_FFMPEG, reason="ffmpeg not on PATH")
def test_mp3_end_to_end_cli(tmp_path):
    import subprocess

    from audio_cut_tpu.api import separate_and_segment

    sr = 44100
    t = np.arange(sr * 12) / sr
    audio = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    for s, d in ((3.0, 0.8), (7.0, 0.7)):
        audio[int(s * sr):int((s + d) * sr)] = 0
    wav = tmp_path / "song.wav"
    write_wav(wav, audio, sr, subtype="PCM_24")
    mp3 = tmp_path / "song.mp3"
    subprocess.run(["ffmpeg", "-v", "error", "-i", str(wav), "-b:a", "192k", str(mp3)],
                   check=True)
    manifest = separate_and_segment(
        input_uri=str(mp3), export_dir=str(tmp_path / "out"), mode="v2.2_mdd"
    )
    assert manifest["success"]
    assert manifest["stats"]["num_segments"] >= 2
