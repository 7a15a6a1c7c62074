"""Cold-start warmup: populate the persistent XLA compilation cache.

The packaged ConvTDF's first-track compile is heavy (~200 s cold on the
v5e tunnel; docs/profile_neural_r3.json) versus the reference's seconds-scale
ORT session load — blowing the reference PRD's "3-min song ≤ 1 min" first-track
latency target (reference PRD.md:61) on a fresh machine. This verb runs the
production program families ONCE on synthetic tracks so every later process
loads them from the persistent cache (utils/device.configure_jax) in ~1-2 s
each: `audio-cut warmup`.

What gets compiled: for each pad bucket in --durations (the engine pads
tracks to 15 s buckets up to 75 s, then 60 s buckets —
separation/engine.padded_track_len, so ONE long duration covers a whole
song-length band) the default-path
fused program family (separation OLA + detection bundle + ConvVAD), plus the
device PCM-24 stem pack (vocal_separation) and the device ASR-copy resampler
(vpbd_asr) on the longest bucket.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from typing import Dict, List

import numpy as np


def _synth_song(duration_s: float, sr: int = 44100, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(duration_s * sr)
    t = np.arange(n) / sr
    audio = 0.02 * rng.standard_normal(n)
    ph = 0.5
    while ph + 3.0 < duration_s:
        seg = (t >= ph) & (t < ph + 2.2)
        f0 = 200.0 + 60.0 * np.sin(2 * np.pi * 0.3 * ph)
        x = np.zeros(int(seg.sum()))
        for h in range(1, 4):
            x += np.sin(2 * np.pi * h * f0 * t[seg]) / h
        audio[seg] += 0.4 * x
        ph += 3.2
    peak = float(np.abs(audio).max()) or 1.0
    return (0.85 * audio / peak).astype(np.float32)


def _fake_timeline(duration_s: float) -> Dict:
    words = [
        {"text": f"w{k}", "start_s": 0.8 + 0.8 * k, "end_s": 1.2 + 0.8 * k,
         "confidence": 0.9}
        for k in range(max(1, int((duration_s - 2.0) / 0.8)))
    ]
    return {
        "words": words,
        "sentences": [{"text": "s", "start_s": words[0]["start_s"],
                       "end_s": words[-1]["end_s"], "confidence": 0.9}],
        "vad_regions": [], "duration_s": duration_s, "language": "en",
    }


def run_warmup(durations: List[float], extra_modes: bool = True,
               export_dir: str | None = None) -> Dict:
    """Compile the production program families into the persistent cache.

    Returns {"steps": [{name, wall_s}], "total_s": float}. Wall time of the
    FIRST run per (mode, bucket) is the compile cost being amortized; a
    repeat process pays ~1-2 s per program from the cache instead.
    """
    from audio_cut_tpu.api import separate_and_segment
    from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
    from audio_cut_tpu.io import write_wav
    from audio_cut_tpu.utils.device import configure_jax

    configure_jax()
    steps = []
    t_all = time.time()
    with tempfile.TemporaryDirectory() as td:
        out_root = export_dir or td
        for d in sorted(set(durations)):
            song = os.path.join(td, f"warm_{int(d)}s.wav")
            write_wav(song, _synth_song(d), 44100)
            t0 = time.time()
            m = separate_and_segment(
                input_uri=song, mode="v2.2_mdd",
                export_dir=os.path.join(out_root, f"v22_{int(d)}"),
            )
            steps.append({"name": f"v2.2_mdd_{int(d)}s", "ok": bool(m.get("success")),
                          "wall_s": round(time.time() - t0, 2)})
        if extra_modes and durations:
            d = max(durations)
            song = os.path.join(td, f"warm_{int(d)}s.wav")
            t0 = time.time()
            m = separate_and_segment(
                input_uri=song, mode="vocal_separation",
                export_dir=os.path.join(out_root, "sep"),
            )
            steps.append({"name": "vocal_separation", "ok": bool(m.get("success")),
                          "wall_s": round(time.time() - t0, 2)})
            tl_path = os.path.join(td, "tl.json")
            with open(tl_path, "w") as f:
                json.dump(_fake_timeline(d), f)
            try:
                set_runtime_config({
                    "lyrics_alignment.enabled": True,
                    "lyrics_alignment.provider": "fake",
                    "lyrics_alignment.fixture_path": tl_path,
                })
                t0 = time.time()
                m = separate_and_segment(
                    input_uri=song, mode="vpbd_asr",
                    export_dir=os.path.join(out_root, "asr"),
                )
                steps.append({"name": "vpbd_asr", "ok": bool(m.get("success")),
                              "wall_s": round(time.time() - t0, 2)})
            finally:
                reset_runtime_config()
    return {"steps": steps, "total_s": round(time.time() - t_all, 2)}


def warmup_main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="audio-cut warmup",
        description="Pre-compile the production XLA programs into the "
                    "persistent cache so first-track latency on this machine "
                    "drops from minutes to seconds.",
    )
    ap.add_argument("--durations", default="15,75,120,180,240",
                    help="comma-separated synthetic track lengths (s); one "
                         "compile per pad bucket — 15 s buckets up to 75 s, "
                         "then device_pipeline.long_bucket_seconds (60 s) "
                         "buckets. The default covers short clips and every "
                         "long bucket of the 1:16-4:00 production band (a "
                         "3:05 song shares the 240 s program; 1:16-2:00 "
                         "songs the 120 s one). Mid-short buckets (30/45/60) "
                         "stay cold unless listed here")
    ap.add_argument("--fast", action="store_true",
                    help="minimum warmup for the PRD first-track target: one "
                         "short bucket + the 3-min bucket (durations 15,180), "
                         "default mode only")
    ap.add_argument("--skip-extra-modes", action="store_true",
                    help="only the default v2.2_mdd family (skip the "
                         "vocal_separation pack + vpbd_asr copy programs)")
    ap.add_argument("--json", action="store_true", help="print a JSON report")
    args = ap.parse_args(argv)

    if args.fast:
        durations = [15.0, 180.0]
        report = run_warmup(durations, extra_modes=False)
    else:
        durations = [float(x) for x in str(args.durations).split(",") if x.strip()]
        report = run_warmup(durations, extra_modes=not args.skip_extra_modes)
    if args.json:
        print(json.dumps(report))
    else:
        for s in report["steps"]:
            print(f"  {s['name']:<22} {'ok' if s['ok'] else 'FAILED':<7} {s['wall_s']:8.1f} s")
        print(f"warmup complete in {report['total_s']:.1f} s — repeat runs load "
              "these programs from the persistent cache")
    return 0 if all(s["ok"] for s in report["steps"]) else 1


if __name__ == "__main__":
    sys.exit(warmup_main())
