#!/usr/bin/env python3
"""Coarse per-stage wall profile of the v2.2_mdd e2e path.

Wraps the hot seams (separation, bundle build, VAD, pause detection, guard
finalize, layout, split, export) with wall timers and prints a JSON breakdown
for a warm run. Diagnostic only — no product code changes.

Usage:  python scripts/profile_e2e.py [--duration 60] [--runs 2]
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

if os.environ.get("JAX_PLATFORMS"):
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

TIMES: dict = {}


def _wrap(obj, name, label):
    fn = getattr(obj, name)

    def wrapped(*a, **k):
        t0 = time.time()
        out = fn(*a, **k)
        TIMES[label] = TIMES.get(label, 0.0) + (time.time() - t0)
        return out

    setattr(obj, name, wrapped)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from bench import make_song

    from audio_cut_tpu.utils.device import configure_jax

    configure_jax()

    import audio_cut_tpu.pipeline.modes.pure_vocal as pv
    from audio_cut_tpu.separation.engine import SeparationEngine
    from audio_cut_tpu.detection.pause_detector import PureVocalPauseDetector
    from audio_cut_tpu.io.segment_export import SegmentExporter

    _wrap(SeparationEngine, "separate_for_detection", "separation")
    _wrap(pv, "_build_bundle", "bundle")
    from audio_cut_tpu.models import vad as vad_mod

    for cls_name in ("ConvVADDetector", "ConvVAD"):
        cls = getattr(vad_mod, cls_name, None)
        if cls is not None and hasattr(cls, "detect"):
            _wrap(cls, "detect", "vad")
            break
    _wrap(PureVocalPauseDetector, "detect_pure_vocal_pauses", "pause_detect")
    _wrap(pv, "finalize_cut_points", "guard_finalize")
    _wrap(pv, "refine_layout", "layout")
    _wrap(pv, "classify_segments_vocal_presence", "classify")
    _wrap(pv, "split_at_sample_level", "split")
    _wrap(SegmentExporter, "export_segments", "export")
    from audio_cut_tpu.pipeline.splitter import SmartSplitter

    _wrap(SmartSplitter, "_load", "load_audio")

    from audio_cut_tpu import separate_and_segment
    from audio_cut_tpu.io import write_wav

    audio, sr = make_song(args.duration)
    with tempfile.TemporaryDirectory() as td:
        song = os.path.join(td, "song.wav")
        write_wav(song, audio, sr)
        # warm-up (compile)
        separate_and_segment(input_uri=song, export_dir=os.path.join(td, "w"), mode="v2.2_mdd")
        best = None
        for r in range(args.runs):
            TIMES.clear()
            t0 = time.time()
            m = separate_and_segment(
                input_uri=song, export_dir=os.path.join(td, f"o{r}"), mode="v2.2_mdd"
            )
            wall = time.time() - t0
            assert m["success"]
            row = dict(sorted(TIMES.items(), key=lambda kv: -kv[1]))
            row["_wall"] = wall
            row["_accounted"] = sum(TIMES.values())
            row["_xrt"] = args.duration / wall
            if best is None or wall < best["_wall"]:
                best = row
    print(json.dumps({k: round(v, 4) for k, v in best.items()}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
