"""CLI parameter contract (parity: reference tests/contracts/test_run_splitter_cli.py)."""

import pytest

from audio_cut_tpu.cli import build_parser, resolve_effective_mode, _parse_segments


def test_all_modes_accepted():
    parser = build_parser()
    for mode in ("vocal_separation", "v2.2_mdd", "librosa_onset", "hybrid_mdd",
                 "vpbd_acoustic", "vpbd_asr"):
        args = parser.parse_args(["song.wav", "--mode", mode])
        assert args.mode == mode


def test_intent_routes_to_vpbd_asr():
    parser = build_parser()
    args = parser.parse_args(["song.wav", "--segments", "medium"])
    assert resolve_effective_mode(args) == "vpbd_asr"
    args = parser.parse_args(["song.wav", "--align", "beat"])
    assert resolve_effective_mode(args) == "vpbd_asr"
    args = parser.parse_args(["song.wav"])
    assert resolve_effective_mode(args) == "v2.2_mdd"
    args = parser.parse_args(["song.wav", "--mode", "librosa_onset", "--segments", "few"])
    assert resolve_effective_mode(args) == "librosa_onset"


def test_segments_parsing():
    assert _parse_segments("few") == "few"
    assert _parse_segments("6-14") == [6.0, 14.0]
    assert _parse_segments(None) is None
    with pytest.raises(SystemExit):
        _parse_segments("lots")


def test_profile_choices():
    parser = build_parser()
    args = parser.parse_args(["song.wav", "--profile", "edm"])
    assert args.profile == "edm"
    with pytest.raises(SystemExit):
        parser.parse_args(["song.wav", "--profile", "jazz"])


def test_lyrics_flags():
    parser = build_parser()
    args = parser.parse_args([
        "song.wav", "--lyrics-provider", "fake", "--lyrics-fixture", "f.json",
        "--asr-chunk-s", "30", "--asr-strict",
    ])
    from audio_cut_tpu.cli import build_runtime_overrides

    ov = build_runtime_overrides(args)
    assert ov["lyrics_alignment.provider"] == "fake"
    assert ov["lyrics_alignment.enabled"] is True
    assert ov["lyrics_alignment.fixture_path"] == "f.json"
    assert ov["lyrics_alignment.chunk_s"] == 30
    assert ov["lyrics_alignment.strict"] is True


def test_missing_file_exit_code(tmp_path):
    from audio_cut_tpu.cli import main

    assert main(["/definitely/missing.wav", "-o", str(tmp_path)]) == 2
