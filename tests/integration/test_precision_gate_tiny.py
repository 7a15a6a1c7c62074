"""PRD precision gate under a NEURAL default in the ALWAYS-RUN CPU loop.

Round-3's precision regression (convtdf default -> text-derived lyric-gap
candidates landed on stem decay tails -> guard dragged cuts 200-300 ms,
precision_guard_rate 0.375) shipped because the gate only ran on the gated
model tier. This runs the same vpbd_asr acceptance assertion under the
packaged TINY ConvTDF checkpoint (trained by scripts/train_separator.py
--tiny; geometry small enough for the 1-core CPU tier), so `pytest -m "not
model"` exercises a neural default end-to-end on every commit (VERDICT r3
task #4; reference gate: seamless_splitter.py:66-67, avg<=150 ms /
p95<=220 ms).
"""

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[2]


def _tiny_available() -> bool:
    from audio_cut_tpu.models.convtdf import packaged_tiny_checkpoint_path

    return packaged_tiny_checkpoint_path() is not None


@pytest.mark.skipif(not _tiny_available(),
                    reason="no packaged tiny checkpoint in this build")
def test_vpbd_asr_precision_gate_under_tiny_convtdf(tmp_path):
    sys.path.insert(0, str(REPO / "scripts"))
    from vpbd_asr_acceptance import synth_song_with_timeline

    from audio_cut_tpu import separate_and_segment
    from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
    from audio_cut_tpu.io import write_wav

    audio, sr, timeline = synth_song_with_timeline(1013, 30.0)
    song = tmp_path / "song.wav"
    write_wav(song, audio, sr, subtype="FLOAT")
    fixture = tmp_path / "timeline.json"
    fixture.write_text(json.dumps(timeline))

    set_runtime_config({
        # neural default on the CPU tier: the tiny packaged geometry
        "enhanced_separation.backend": "convtdf",
        "enhanced_separation.convtdf.checkpoint": "packaged_tiny",
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


@pytest.mark.skipif(not _tiny_available(),
                    reason="no packaged tiny checkpoint in this build")
def test_tiny_backend_separates_on_cpu():
    """The tiny checkpoint must load with its sidecar geometry and produce a
    usable (better-than-nothing) vocal estimate on the training family."""
    import numpy as np

    from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
    from audio_cut_tpu.separation.backends import make_backend
    from audio_cut_tpu.training.sep_data import si_snr, synth_pair

    set_runtime_config({
        "enhanced_separation.convtdf.checkpoint": "packaged_tiny",
    })
    try:
        bk = make_backend("convtdf", 44100)
        assert bk.sep.n_fft < 6144, "tiny sidecar geometry must apply"
        mix, vocal = synth_pair(np.random.default_rng(3), 44100 * 3)
        v, i = bk.separate(mix)
        assert v.shape == mix.shape
        assert si_snr(v, vocal) > si_snr(mix, vocal) + 1.0, (
            "tiny model must beat mix-as-estimate by >1 dB"
        )
    finally:
        reset_runtime_config()
