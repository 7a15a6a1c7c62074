"""Real-ASR wire-format coverage (VERDICT r4 task #4).

The fixture `fireredasr2s_result.jsonl` is hand-authored to the PUBLISHED
FireRedASR2S output format (one row per wav: uttid/text/wav_path/dur_s,
words/sentences with start_ms/end_ms/asr_confidence, vad_segments_ms pairs —
reference scripts/fireredasr2s_worker.py:17-44,111-139). These tests drive it
through the real production chain at zero hardware cost:

    result.jsonl -> scripts/asr_worker_adapter.py (subprocess, the exact
    `--input-json - --output` worker contract) -> CliLyricsProvider ->
    protocol.normalize_response -> LyricsTimeline -> vpbd_asr end-to-end.

Unlike the reference's equivalent (tests/integration/
test_firered_cli_provider_real.py, gated on FIRERED_CLI_WORKER + a GPU),
nothing here is gated: the wire format itself is the unit under test.
"""

import json
import os
import stat
import subprocess
import sys
from pathlib import Path

import pytest

from audio_cut_tpu.config import reset_runtime_config
from audio_cut_tpu.io import write_wav

REPO = Path(__file__).resolve().parents[2]
ADAPTER = REPO / "scripts" / "asr_worker_adapter.py"
FIXTURE = REPO / "tests" / "fixtures" / "lyrics" / "fireredasr2s_result.jsonl"


@pytest.fixture(autouse=True)
def _clean_config():
    yield
    reset_runtime_config()


def _load_adapter_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location("asr_worker_adapter", ADAPTER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_convert_real_firered_jsonl_shape():
    """The converter understands the real one-row FireRed format."""
    mod = _load_adapter_module()
    payload = mod.convert_result_jsonl(FIXTURE.read_text().splitlines())
    assert len(payload["words"]) == 8
    assert len(payload["sentences"]) == 3
    assert len(payload["vad_regions"]) == 3
    # asr_confidence -> confidence alias
    assert payload["words"][0]["confidence"] == 0.95
    # ms keys pass through untouched (protocol scales them)
    assert payload["words"][0]["start_ms"] == 600
    assert payload["meta"]["uttid"] == "song_0000"
    assert payload["duration_s"] == 20.0

    from audio_cut_tpu.lyrics.protocol import normalize_response

    timeline = normalize_response(payload)
    assert len(timeline.words) == 8
    assert timeline.words[0].start_s == pytest.approx(0.6)
    assert timeline.words[-1].end_s == pytest.approx(14.0)
    assert len(timeline.vad_regions) == 3
    assert timeline.vad_regions[0].kind == "singing"


def test_convert_generic_per_line_stream_still_works():
    mod = _load_adapter_module()
    lines = [
        json.dumps({"text": "line one", "start": 1.0, "end": 2.0, "confidence": 0.8}),
        json.dumps({"text": "line two", "start": 3.0, "end": 4.5}),
    ]
    payload = mod.convert_result_jsonl(lines)
    assert [s["text"] for s in payload["sentences"]] == ["line one", "line two"]
    assert payload["words"] == []


def _write_worker_script(tmp_path: Path) -> Path:
    """Executable implementing the worker CLI contract by replaying the
    recorded result.jsonl through the adapter (`--asr-cmd 'cp fixture {out}'`
    substitutes the real FireRed CLI invocation)."""
    script = tmp_path / "firered_worker.sh"
    script.write_text(
        "#!/bin/sh\n"
        f'exec "{sys.executable}" "{ADAPTER}" --asr-cmd "cp {FIXTURE} {{out}}" "$@"\n'
    )
    script.chmod(script.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    return script


def test_adapter_subprocess_worker_contract(tmp_path):
    """Drive the adapter exactly as CliLyricsProvider spawns it."""
    worker = _write_worker_script(tmp_path)
    out = tmp_path / "lyrics_timeline.json"
    request = {"audio_path": str(tmp_path / "fake.wav"), "sample_rate": 16000,
               "global_t0_s": 0.0}
    proc = subprocess.run(
        [str(worker), "--input-json", "-", "--output", str(out)],
        input=json.dumps(request).encode(), capture_output=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr.decode(errors="replace")
    data = json.loads(out.read_text())
    assert len(data["words"]) == 8
    # adapter output is already normalized to seconds
    assert data["words"][0]["start_s"] == pytest.approx(0.6)


def test_vpbd_asr_end_to_end_through_cli_provider(tmp_path, song_audio):
    """Full pipeline: vpbd_asr -> CliLyricsProvider -> adapter subprocess ->
    recorded FireRed jsonl -> timeline -> cuts + lyrics attach."""
    from audio_cut_tpu.api import separate_and_segment

    audio, sr = song_audio
    p = tmp_path / "song.wav"
    write_wav(p, audio, sr, subtype="FLOAT")
    worker = _write_worker_script(tmp_path)

    manifest = separate_and_segment(
        input_uri=str(p), export_dir=str(tmp_path / "out"), mode="vpbd_asr",
        export_manifest=True,
        runtime_overrides={
            "lyrics_alignment.enabled": True,
            "lyrics_alignment.provider": "cli",
            "fire_red.cli.executable": str(worker),
        },
    )
    assert manifest["success"]
    la = manifest.get("lyrics_alignment")
    assert la is not None and la["provider"] == "cli"
    assert la["word_count"] == 8
    texts = [s.get("lyrics", {}).get("text", "") for s in manifest["segments"]]
    assert any("hello" in t or "singing" in t or "forever" in t for t in texts)
    assert manifest["qa_report"]["lyrics_coverage_ratio"] is not None
