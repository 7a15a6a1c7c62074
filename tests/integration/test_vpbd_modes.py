"""vpbd_acoustic / vpbd_asr end-to-end with the fake lyrics provider.

Mirrors the reference integration strategy
(tests/integration/test_pipeline_vpbd_asr_fake_provider.py): external ASR is
faked via FakeLyricsProvider + a JSON fixture enabled purely through runtime
config; scenario knobs via set_runtime_config.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from audio_cut_tpu.api import separate_and_segment
from audio_cut_tpu.config import reset_runtime_config
from audio_cut_tpu.io import write_wav

FIXTURE = Path(__file__).parent.parent / "fixtures" / "lyrics" / "simple_song_timeline.json"


@pytest.fixture(autouse=True)
def _clean_config():
    yield
    reset_runtime_config()


@pytest.fixture()
def song_file(tmp_path, song_audio):
    audio, sr = song_audio
    p = tmp_path / "song.wav"
    write_wav(p, audio, sr, subtype="FLOAT")
    return p, audio, sr


def test_vpbd_acoustic_end_to_end(tmp_path, song_file):
    p, audio, sr = song_file
    out = tmp_path / "out"
    manifest = separate_and_segment(
        input_uri=str(p), export_dir=str(out), mode="vpbd_acoustic", export_manifest=True,
    )
    assert manifest["success"]
    bd = manifest.get("boundary_detection")
    assert bd is not None
    assert bd["candidate_counts"]["merged"] > 0
    assert bd["planner"]["planner"] in ("dynamic_programming", "rescue")
    # candidate debug json written
    assert (out / "vpbd_candidates_debug.json").exists()
    # cuts.final enriched with candidate metadata when planner selected
    final = manifest["cuts"]["final"]
    if bd["planner"]["planner"] == "dynamic_programming" and bd["selected"]:
        assert any(isinstance(c, dict) and "source" in c for c in final)


def test_vpbd_asr_with_fake_provider(tmp_path, song_file):
    p, audio, sr = song_file
    out = tmp_path / "out_asr"
    manifest = separate_and_segment(
        input_uri=str(p), export_dir=str(out), mode="vpbd_asr",
        runtime_overrides={
            "lyrics_alignment.enabled": True,
            "lyrics_alignment.provider": "fake",
            "lyrics_alignment.fixture_path": str(FIXTURE),
        },
    )
    assert manifest["success"]
    la = manifest.get("lyrics_alignment")
    assert la is not None and la["provider"] == "fake"
    assert la["word_count"] == 8
    # lyrics attached to overlapping segments in the manifest
    texts = [s.get("lyrics", {}).get("text", "") for s in manifest["segments"]]
    assert any("hello" in t or "singing" in t or "forever" in t for t in texts)
    # QA derives lyrics metrics
    assert manifest["qa_report"]["lyrics_coverage_ratio"] is not None


def test_vpbd_asr_fallback_to_acoustic(tmp_path, song_file):
    p, audio, sr = song_file
    out = tmp_path / "out_fb"
    manifest = separate_and_segment(
        input_uri=str(p), export_dir=str(out), mode="vpbd_asr",
        runtime_overrides={
            "lyrics_alignment.enabled": True,
            "lyrics_alignment.provider": "fake",
            "lyrics_alignment.fixture_path": "/nonexistent/fixture.json",
            "lyrics_alignment.strict": False,
        },
    )
    assert manifest["success"]
    assert "lyrics_unavailable" in manifest.get("note", "")


def test_vpbd_asr_strict_raises(tmp_path, song_file):
    from audio_cut_tpu.exceptions import LyricsAlignmentUnavailable

    p, audio, sr = song_file
    with pytest.raises(LyricsAlignmentUnavailable):
        separate_and_segment(
            input_uri=str(p), export_dir=str(tmp_path / "x"), mode="vpbd_asr",
            runtime_overrides={
                "lyrics_alignment.enabled": True,
                "lyrics_alignment.provider": "null",
                "lyrics_alignment.strict": True,
            },
        )
