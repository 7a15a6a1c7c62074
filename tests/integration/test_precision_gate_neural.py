"""PRD precision gate under the NEURAL default (model tier).

Round-3 regression this pins: when the trained ConvTDF became the default
backend, lyric-gap candidates (text-derived gap midpoints) landed on the
stem's vocal decay tails and the quiet guard dragged cuts 200-300 ms —
acceptance precision_guard_rate fell to 0.375 against the PRD gate
(avg<=150 ms / p95<=220 ms, reference seamless_splitter.py:66-67). The
pre-guard valley snap fixed it; this test runs the real packaged model so
the CPU suite's spectral pin cannot mask a recurrence.
"""

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[2]

pytestmark = pytest.mark.model


@pytest.mark.parametrize("seed", [1013, 1026])
def test_vpbd_asr_precision_gate_under_packaged_convtdf(tmp_path, seed):
    sys.path.insert(0, str(REPO / "scripts"))
    from vpbd_asr_acceptance import synth_song_with_timeline

    from audio_cut_tpu import separate_and_segment
    from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
    from audio_cut_tpu.io import write_wav

    audio, sr, timeline = synth_song_with_timeline(seed, 30.0)
    song = tmp_path / "song.wav"
    write_wav(song, audio, sr, subtype="FLOAT")
    fixture = tmp_path / "timeline.json"
    fixture.write_text(json.dumps(timeline))

    set_runtime_config({
        # the packaged neural default (the CPU tier pins spectral via env)
        "enhanced_separation.backend": "convtdf",
        "enhanced_separation.convtdf.checkpoint": "packaged",
        "lyrics_alignment.enabled": True,
        "lyrics_alignment.provider": "fake",
        "lyrics_alignment.fixture_path": str(fixture),
    })
    try:
        m = separate_and_segment(
            input_uri=str(song), export_dir=str(tmp_path / "out"), mode="vpbd_asr"
        )
    finally:
        reset_runtime_config()

    assert m["success"]
    guard = m.get("guard") or {}
    stats = guard.get("shift_stats") or {}
    assert guard.get("precision_ok") is True, stats
    assert float(stats.get("avg_ms", 1e9)) <= 150.0
    assert float(stats.get("p95_ms", 1e9)) <= 220.0
