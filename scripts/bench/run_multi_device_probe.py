#!/usr/bin/env python3
"""Per-device pipeline probe with telemetry.

Parity: reference scripts/bench/run_multi_gpu_probe.py — run the whole
pipeline once per visible device and report per-device wall/throughput plus
memory telemetry. On a CPU host, probe over N virtual devices with
--virtual-devices N (the multi-chip dry-run configuration).
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--virtual-devices", type=int, default=0,
                    help="force N virtual CPU devices (0 = use real devices)")
    ap.add_argument("--strict-device", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    import jax

    if args.virtual_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.virtual_devices)

    from bench import make_song
    from audio_cut_tpu.io import write_wav
    from audio_cut_tpu.utils.device import device_info, device_memory_stats
    from audio_cut_tpu import separate_and_segment

    audio, sr = make_song(args.duration)
    rows = []
    with tempfile.TemporaryDirectory() as td:
        song = Path(td) / "probe.wav"
        write_wav(song, audio, sr)
        for dev in jax.devices():
            with jax.default_device(dev):
                t0 = time.time()
                try:
                    m = separate_and_segment(
                        input_uri=str(song), export_dir=str(Path(td) / f"d{dev.id}"),
                        mode="v2.2_mdd",
                        strict_gpu=args.strict_device or None,
                    )
                    ok = bool(m["success"])
                except Exception as exc:  # noqa: BLE001 - probe records failures
                    if args.strict_device:
                        raise
                    rows.append({"device": dev.id, "error": str(exc)[:200]})
                    continue
                wall = time.time() - t0
            rows.append({
                "device": dev.id,
                "platform": dev.platform,
                "ok": ok,
                "wall_s": round(wall, 2),
                "throughput_xrt": round(args.duration / wall, 2),
            })

    print(json.dumps({
        "devices": device_info(),
        "runs": rows,
        "memory": device_memory_stats(),
    }, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
