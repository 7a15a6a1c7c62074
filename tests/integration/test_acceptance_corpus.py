"""Standing acceptance corpus (VERDICT r4 task #6).

Fast tier: the frozen manifest regenerates bit-stably (digest check — any
generator drift that would silently move the acceptance numbers fails here)
and timeline derivation from the clean stem is well-formed.

Acceptance tier (AUDIO_CUT_TPU_RUN_ACCEPTANCE=1): one long-form corpus track
end-to-end through vpbd_asr with PRD gates. The full 12-track protocol runs
via `python scripts/vpbd_asr_acceptance.py --corpus 0 --json
docs/acceptance_rN.json` (trend artifact).
"""

import subprocess
import sys
from pathlib import Path

import pytest

from audio_cut_tpu.training.corpus import (
    DEFAULT_TRACKS,
    MANIFEST_PATH,
    corpus_track,
    derive_timeline,
    load_manifest,
    verify_track,
)

REPO = Path(__file__).resolve().parents[2]


def test_manifest_matches_generator():
    manifest = load_manifest()
    assert manifest["version"] == "v1"
    assert len(manifest["tracks"]) == len(DEFAULT_TRACKS) == 12
    # regenerate the SHORTEST track and check both digests (full sweep is
    # the acceptance script's --corpus mode)
    spec = min(manifest["tracks"], key=lambda s: s["duration_s"])
    assert verify_track(spec), (
        f"corpus drift: {spec['id']} no longer regenerates to its frozen "
        "digest — the generator changed; refreeze deliberately and record why"
    )


def test_derived_timeline_well_formed():
    spec = min(load_manifest()["tracks"], key=lambda s: s["duration_s"])
    mix, vocal, sr = corpus_track(spec["seed"], spec["duration_s"])
    tl = derive_timeline(vocal, sr)
    assert len(tl["vad_regions"]) >= 10  # a 2-min song has many phrases
    assert len(tl["words"]) >= len(tl["sentences"]) >= len(tl["vad_regions"]) - 1
    for w in tl["words"]:
        assert w["end_s"] > w["start_s"] >= 0.0
    # genuine inter-phrase gaps exist for the cut planner to use
    gaps = [tl["vad_regions"][i + 1]["start_s"] - tl["vad_regions"][i]["end_s"]
            for i in range(len(tl["vad_regions"]) - 1)]
    assert max(gaps) >= 0.5


@pytest.mark.acceptance
def test_one_corpus_track_through_vpbd_asr(tmp_path):
    """PRD gates on one frozen long-form track (CI-slow tier)."""
    sys.path.insert(0, str(REPO / "scripts"))
    import vpbd_asr_acceptance as acc

    spec = min(load_manifest()["tracks"], key=lambda s: s["duration_s"])
    mix, vocal, sr = corpus_track(spec["seed"], spec["duration_s"])
    timeline = derive_timeline(vocal, sr)
    row = acc.run_song(spec["seed"], spec["duration_s"], tmp_path,
                       prebuilt=(mix, sr, timeline))
    assert row["success"]
    assert row["lyrics_used"]
    assert row["duration_band_rate"] >= 0.90
    assert row["cut_inside_word_rate"] <= 0.10
    assert row["natural_pause_rate"] >= 0.80
    assert row["precision_guard_ok"]
