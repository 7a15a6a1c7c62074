#!/usr/bin/env python3
"""TPU-vs-CPU baseline benchmark with gates.

Parity: reference scripts/bench/run_gpu_cpu_baseline.py + its README gates
(speedup_ratio >= 0.30, peak mem <= CPU + 10%) — re-targeted: the accelerated
run must beat the CPU run by >= 30%, and the end-to-end TPU throughput must
meet the reference's own GPU target (>= 0.7x realtime).

Emits JSON + Markdown reports under --out-dir.

Usage:
    python scripts/bench/run_tpu_cpu_baseline.py [--duration 60] [--out-dir bench_out]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]

_RUN_SNIPPET = r"""
import json, os, sys, tempfile, time
import numpy as np
platform = sys.argv[1]
duration = float(sys.argv[2])
song_path = sys.argv[3]
if platform == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
from audio_cut_tpu import separate_and_segment
from audio_cut_tpu.utils.device import device_memory_stats

with tempfile.TemporaryDirectory() as td:
    separate_and_segment(input_uri=song_path, export_dir=os.path.join(td, "w"), mode="v2.2_mdd")
    walls = []
    for k in range(3):
        t0 = time.time()
        m = separate_and_segment(input_uri=song_path, export_dir=os.path.join(td, str(k)), mode="v2.2_mdd")
        walls.append(time.time() - t0)
wall = min(walls)
mem = device_memory_stats()
peak = max((v.get("peak_bytes_in_use") or 0) for v in mem.values()) if mem else 0
print(json.dumps({
    "platform": platform,
    "wall_s": round(wall, 3),
    "throughput_xrt": round(duration / wall, 3),
    "segments": m["stats"]["num_segments"],
    "peak_bytes": peak,
}))
"""


def run_platform(platform: str, duration: float, song: Path) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _RUN_SNIPPET, platform, str(duration), str(song)],
        capture_output=True, text=True, timeout=1800,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"{platform} run failed:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--out-dir", default="bench_out")
    ap.add_argument("--skip-cpu", action="store_true")
    args = ap.parse_args()

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    sys.path.insert(0, str(REPO))
    from bench import make_song
    from audio_cut_tpu.io import write_wav

    audio, sr = make_song(args.duration)
    song = out_dir / "bench_song.wav"
    write_wav(song, audio, sr)

    tpu = run_platform("tpu", args.duration, song)
    cpu = None if args.skip_cpu else run_platform("cpu", args.duration, song)

    report = {"tpu": tpu, "cpu": cpu, "duration_s": args.duration}
    gates = {
        "tpu_meets_reference_gpu_target": tpu["throughput_xrt"] >= 0.7,
    }
    if cpu:
        speedup = (cpu["wall_s"] - tpu["wall_s"]) / cpu["wall_s"]
        report["speedup_ratio"] = round(speedup, 3)
        gates["speedup_ratio_ge_0.30"] = speedup >= 0.30
    report["gates"] = gates
    report["all_gates_pass"] = all(gates.values())

    (out_dir / "baseline.json").write_text(json.dumps(report, indent=2))
    md = ["# TPU/CPU baseline", "", "| platform | wall_s | xRT | segments |", "|---|---|---|---|"]
    for name, row in (("tpu", tpu), ("cpu", cpu)):
        if row:
            md.append(f"| {name} | {row['wall_s']} | {row['throughput_xrt']} | {row['segments']} |")
    md += ["", "## Gates", ""]
    for g, ok in gates.items():
        md.append(f"- {'PASS' if ok else 'FAIL'}: {g}")
    (out_dir / "baseline.md").write_text("\n".join(md) + "\n")

    print(json.dumps(report, indent=2))
    return 0 if report["all_gates_pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
