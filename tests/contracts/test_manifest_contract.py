"""SegmentManifest schema contract (parity: reference api.py:178-263 +
tests/contracts/test_agent_intent_contract.py): the agent-facing fields the
reference's consumers rely on must exist with the right shapes."""

import numpy as np
import pytest

from audio_cut_tpu.api import separate_and_segment
from audio_cut_tpu.io import write_wav

TOP_LEVEL = (
    "version", "success", "job", "export_plan", "audio", "layout_cfg",
    "cuts", "segments", "artifacts", "guard", "separation", "timings_ms",
    "stats", "qa_report",
)
QA_FIELDS = (
    "segments_count", "median_segment_s", "segment_5_15_pass_rate",
    "cut_inside_word_rate", "cut_inside_singing_rate", "avg_boundary_score",
    "lyrics_coverage_ratio", "asr_avg_confidence", "guard_shift_p50_ms",
    "guard_shift_p95_ms", "breath_cut_ratio", "beat_aligned_ratio",
    "fallback_reason",
)


@pytest.fixture(scope="module")
def manifest(tmp_path_factory):
    from tests.conftest import make_song

    audio, sr = make_song(duration_s=20.0, seed=5)
    root = tmp_path_factory.mktemp("manifest")
    p = root / "song.wav"
    write_wav(p, audio, sr, subtype="FLOAT")
    return separate_and_segment(
        input_uri=str(p), export_dir=str(root / "out"), mode="v2.2_mdd",
        export_manifest=True,
    )


def test_top_level_fields(manifest):
    for key in TOP_LEVEL:
        assert key in manifest, key


def test_audio_block(manifest):
    audio = manifest["audio"]
    assert audio["sr"] == 44100
    assert audio["channels"] == 1
    assert audio["hash"].startswith("sha256:") and len(audio["hash"]) == 71
    assert audio["duration"] == pytest.approx(20.0, abs=0.2)


def test_cuts_block(manifest):
    cuts = manifest["cuts"]
    assert set(cuts) == {"final", "samples", "suppressed"}
    assert cuts["samples"][0] == 0
    assert all(isinstance(s, int) for s in cuts["samples"])


def test_segments_block(manifest):
    for i, seg in enumerate(manifest["segments"]):
        assert seg["id"] == f"{i + 1:04d}"
        assert seg["label"] in ("human", "music")
        assert seg["end"] > seg["start"]
        assert seg["mix_path"].endswith(".wav")


def test_guard_block(manifest):
    guard = manifest["guard"]
    assert {"shift_stats", "adjustments", "precision_ok", "threshold_ms"} <= set(guard)
    assert guard["threshold_ms"] == {"avg": 150.0, "p95": 220.0}


def test_qa_report_fields(manifest):
    qa = manifest["qa_report"]
    for key in QA_FIELDS:
        assert key in qa, key
    assert qa["segments_count"] == manifest["stats"]["num_segments"]


def test_artifacts_paths_relative(manifest):
    arts = manifest["artifacts"]
    for p in arts.get("music_segments", []):
        assert not p.startswith("/"), "segment paths must be export-dir relative"
