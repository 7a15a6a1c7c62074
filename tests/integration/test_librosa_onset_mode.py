import json

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


def test_librosa_onset_end_to_end(tmp_path, song_file):
    p, audio, sr = song_file
    out = tmp_path / "out"
    manifest = separate_and_segment(
        input_uri=str(p), export_dir=str(out), mode="librosa_onset",
        export_manifest=True,
        runtime_overrides={"librosa_onset.use_vocal_separation": False},
    )
    assert manifest["success"] is True
    assert manifest["stats"]["num_segments"] >= 2
    assert manifest["audio"]["hash"].startswith("sha256:")
    assert manifest["smart_segmentation"]["method"] == "smart_segment_v2"
    assert manifest["qa_report"]["segments_count"] == manifest["stats"]["num_segments"]
    # manifest file written and json round-trips
    mp = out / "SegmentManifest.json"
    assert mp.exists()
    json.loads(mp.read_text())

    # exported files exist and names follow the contract
    files = sorted(out.glob("segment_*.wav"))
    assert len(files) == manifest["stats"]["num_segments"]
    assert files[0].name.startswith("segment_001_")
    assert any(x in files[0].name for x in ("_human", "_music"))


def test_librosa_onset_reconstruction_exact(tmp_path, song_file):
    """Concatenated PCM_24-exported segments must reproduce the PCM_24 full mix."""
    p, audio, sr = song_file
    out = tmp_path / "out2"
    manifest = separate_and_segment(
        input_uri=str(p), export_dir=str(out), mode="librosa_onset",
        runtime_overrides={"librosa_onset.use_vocal_separation": False},
    )
    pieces = []
    for seg in manifest["segments"]:
        wav_path = out / seg["mix_path"]
        data, _ = read_wav(wav_path)
        pieces.append(data)
    recon = np.concatenate(pieces)
    assert recon.size == audio.size
    # both passed through one PCM_24 quantization -> equal within 1 LSB
    q = np.round(np.clip(audio, -1, 1).astype(np.float64) * 8388607.0) / 8388607.0
    assert np.max(np.abs(recon.astype(np.float64) - q)) <= 1.0 / 8388607.0


def test_librosa_onset_with_separation_classifies(tmp_path, song_file):
    p, audio, sr = song_file
    out = tmp_path / "out3"
    manifest = separate_and_segment(
        input_uri=str(p), export_dir=str(out), mode="librosa_onset",
        export_types=("mix_segments", "vocal_segments"),
    )
    assert manifest["success"]
    # vocal subdir written
    vocal_files = list((out / "segments_vocal").glob("*.wav"))
    assert len(vocal_files) == manifest["stats"]["num_segments"]
    labels = {s["label"] for s in manifest["segments"]}
    assert labels <= {"human", "music"}


def test_vocal_separation_mode(tmp_path, song_file):
    p, audio, sr = song_file
    out = tmp_path / "sep"
    manifest = separate_and_segment(
        input_uri=str(p), export_dir=str(out), mode="vocal_separation",
    )
    assert manifest["success"]
    assert manifest["separation"]["backend"] == "spectral"
    arts = manifest["artifacts"]
    assert arts["vocal_full"] and arts["instrumental_full"]
    v, _ = read_wav(out / arts["vocal_full"])
    i, _ = read_wav(out / arts["instrumental_full"])
    assert v.size == audio.size and i.size == audio.size
    # stems sum back to the mix within PCM_24 quantization error
    err = np.abs((v.astype(np.float64) + i.astype(np.float64)) - audio.astype(np.float64)).max()
    assert err < 3e-4


def test_vocal_separation_downloads_only_vocal(tmp_path, song_file, monkeypatch):
    """stems-only mode must reconstruct the instrumental host-side (mix -
    vocal) instead of downloading the second full-track stem."""
    from audio_cut_tpu.separation.engine import SeparationResult

    orig = SeparationResult.instrumental_track

    def guarded(self):
        assert self._inst_host is not None or self.instrumental_device is None, (
            "instrumental must come from the host complement, not a device download"
        )
        return orig.fget(self)

    monkeypatch.setattr(
        SeparationResult, "instrumental_track", property(guarded, orig.fset)
    )
    p, audio, sr = song_file
    out = tmp_path / "sep_fast"
    manifest = separate_and_segment(
        input_uri=str(p), export_dir=str(out), mode="vocal_separation",
    )
    assert manifest["success"]
    arts = manifest["artifacts"]
    v, _ = read_wav(out / arts["vocal_full"])
    i, _ = read_wav(out / arts["instrumental_full"])
    # host complement: stems sum to the mix within TWO PCM_24 quantizations
    err = np.abs((v.astype(np.float64) + i.astype(np.float64)) - audio.astype(np.float64)).max()
    assert err <= 2.5 / 8388607.0
