import numpy as np
import pytest

from audio_cut_tpu.api import separate_and_segment
from audio_cut_tpu.io import read_wav, write_wav


@pytest.fixture()
def song_file(tmp_path, song_audio):
    audio, sr = song_audio
    p = tmp_path / "song.wav"
    write_wav(p, audio, sr, subtype="FLOAT")
    return p, audio, sr


def test_v22_mdd_end_to_end(tmp_path, song_file):
    p, audio, sr = song_file
    out = tmp_path / "out"
    manifest = separate_and_segment(
        input_uri=str(p), export_dir=str(out), mode="v2.2_mdd", export_manifest=True,
    )
    assert manifest["success"] is True
    assert manifest["version"] == "v2.2_mdd"
    n = manifest["stats"]["num_segments"]
    assert n >= 2, "song with phrase gaps must split"

    # guard block present with stats + precision gate
    guard = manifest["guard"]
    assert "shift_stats" in guard and guard["precision_ok"] in (True, False)
    assert guard["threshold_ms"] == {"avg": 150.0, "p95": 220.0}

    # reconstruction: concatenated segments == PCM_24(input)
    pieces = [read_wav(out / s["mix_path"])[0] for s in manifest["segments"]]
    recon = np.concatenate(pieces)
    assert recon.size == audio.size
    q = np.round(np.clip(audio, -1, 1).astype(np.float64) * 8388607.0) / 8388607.0
    assert np.max(np.abs(recon.astype(np.float64) - q)) <= 1.0 / 8388607.0

    # segment durations respect layout soft bounds loosely
    durs = [s["duration"] for s in manifest["segments"]]
    assert all(d >= 1.0 for d in durs)

    # classification debug recorded
    assert any("debug" in s for s in manifest["segments"])


def test_v22_mdd_cuts_at_quiet_points(tmp_path, song_file):
    p, audio, sr = song_file
    out = tmp_path / "out2"
    manifest = separate_and_segment(input_uri=str(p), export_dir=str(out), mode="v2.2_mdd")
    interior = [c for c in manifest["cuts"]["samples"] if 0 < c < len(audio)]
    assert interior, "expected interior cuts"
    for c in interior:
        window = audio[max(0, c - 1000):c + 1000]
        # cut must be in a relatively quiet zone vs the track peak
        assert np.abs(window).max() < 0.5 * np.abs(audio).max()


def test_v22_mdd_single_segment_fallback(tmp_path):
    # constant loud tone with no pauses -> single segment, success
    sr = 44100
    audio = (0.5 * np.sin(2 * np.pi * 300 * np.arange(sr * 8) / sr)).astype(np.float32)
    p = tmp_path / "tone.wav"
    write_wav(p, audio, sr, subtype="FLOAT")
    manifest = separate_and_segment(input_uri=str(p), export_dir=str(tmp_path / "o"), mode="v2.2_mdd")
    assert manifest["success"]
    assert manifest["stats"]["num_segments"] >= 1
