#!/usr/bin/env python3
"""Coarse per-stage wall profile of any pipeline mode (diagnostic only).

Like profile_e2e.py but parameterised over mode, with the mode-specific hot
seams wrapped too (beat analysis for hybrid, lyrics/planning for vpbd_asr,
stem download/export for vocal_separation).

Usage:  python scripts/profile_modes.py --mode hybrid_mdd [--duration 60]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TIMES: dict = {}


def _wrap(obj, name, label):
    fn = getattr(obj, name, None)
    if fn is None:
        return

    def wrapped(*a, **k):
        t0 = time.time()
        out = fn(*a, **k)
        TIMES[label] = TIMES.get(label, 0.0) + (time.time() - t0)
        return out

    setattr(obj, name, wrapped)


def fake_timeline(duration_s: float) -> dict:
    words, sentences, t, k = [], [], 1.0, 0
    while t + 2.4 < duration_s:
        ws = [{"text": f"w{k}_{j}", "start_s": t + 0.6 * j,
               "end_s": t + 0.6 * j + 0.45, "confidence": 0.9} for j in range(4)]
        words += ws
        sentences.append({"text": " ".join(x["text"] for x in ws),
                          "start_s": ws[0]["start_s"], "end_s": ws[-1]["end_s"],
                          "confidence": 0.9})
        t = ws[-1]["end_s"] + 1.0
        k += 1
    return {"words": words, "sentences": sentences, "vad_regions": [],
            "duration_s": duration_s, "language": "en"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="hybrid_mdd")
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from bench import make_song
    from audio_cut_tpu.utils.device import configure_jax

    configure_jax()

    import audio_cut_tpu.pipeline.modes.pure_vocal as pv
    from audio_cut_tpu.separation.engine import SeparationEngine, SeparationResult
    from audio_cut_tpu.detection.pause_detector import PureVocalPauseDetector
    from audio_cut_tpu.io.segment_export import SegmentExporter

    _wrap(SeparationEngine, "separate_for_detection", "separation")
    _wrap(pv, "_build_bundle", "bundle")
    _wrap(PureVocalPauseDetector, "detect_pure_vocal_pauses", "pause_detect")
    _wrap(pv, "finalize_cut_points", "guard_finalize")
    _wrap(pv, "refine_layout", "layout")
    _wrap(pv, "classify_segments_vocal_presence", "classify")
    _wrap(pv, "split_at_sample_level", "split")
    _wrap(SegmentExporter, "export_segments", "export")
    _wrap(SegmentExporter, "export_full_track", "export_full_track")
    del SeparationResult
    from audio_cut_tpu.pipeline.splitter import SmartSplitter

    _wrap(SmartSplitter, "_load", "load_audio")

    # mode-specific seams
    try:
        import audio_cut_tpu.pipeline.modes.hybrid as hy
        from audio_cut_tpu.analysis.beat_analyzer import BeatAnalyzer

        _wrap(BeatAnalyzer, "analyze", "beat_analyze")
        _wrap(hy, "separate_and_detect_fused", "hybrid_fused")
    except Exception:
        pass
    try:
        from audio_cut_tpu.detection.vpbd import VocalPhraseBoundaryDetector

        _wrap(VocalPhraseBoundaryDetector, "detect", "vpbd_detect")
    except Exception:
        pass
    try:
        import audio_cut_tpu.lyrics.providers as lp

        _wrap(lp.FakeLyricsProvider, "align", "asr_align")
    except Exception:
        pass
    try:
        import audio_cut_tpu.pipeline.modes.separation_mode as vsm

        _wrap(vsm, "process_vocal_separation", "vocal_separation_mode")
    except Exception:
        pass

    from audio_cut_tpu import separate_and_segment
    from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
    from audio_cut_tpu.io import write_wav

    audio, sr = make_song(args.duration)
    with tempfile.TemporaryDirectory() as td:
        song = os.path.join(td, "song.wav")
        write_wav(song, audio, sr)
        overrides = {}
        if args.mode == "vpbd_asr":
            tl = os.path.join(td, "timeline.json")
            with open(tl, "w") as f:
                json.dump(fake_timeline(args.duration), f)
            overrides = {"lyrics_alignment.enabled": True,
                         "lyrics_alignment.provider": "fake",
                         "lyrics_alignment.fixture_path": tl}
        try:
            set_runtime_config(dict(overrides))
            separate_and_segment(input_uri=song, export_dir=os.path.join(td, "w"),
                                 mode=args.mode)
            best = None
            for r in range(args.runs):
                TIMES.clear()
                t0 = time.time()
                m = separate_and_segment(
                    input_uri=song, export_dir=os.path.join(td, f"o{r}"),
                    mode=args.mode)
                wall = time.time() - t0
                assert m["success"]
                row = dict(sorted(TIMES.items(), key=lambda kv: -kv[1]))
                row["_wall"] = wall
                row["_accounted"] = sum(TIMES.values())
                row["_xrt"] = args.duration / wall
                if best is None or wall < best["_wall"]:
                    best = row
        finally:
            reset_runtime_config()
    print(json.dumps({"mode": args.mode,
                      **{k: round(v, 4) for k, v in best.items()}}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
