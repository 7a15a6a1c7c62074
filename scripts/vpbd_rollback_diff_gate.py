#!/usr/bin/env python3
"""Rollback gate: `vpbd.candidate_pool=legacy` must keep matching its pinned
baseline (parity: reference scripts/vpbd_rollback_diff_gate.py — verifies the
legacy candidate pool + pop profile reproduces the v2.6 behavior).

The legacy pool admits only acoustic pause/breath candidates — no weak-beat
and no lyrics candidates (detection/vpbd.py pool_mode gate). This script runs
vpbd_acoustic with that rollback + the pop style profile on a fixed synthetic
song and diffs the stable outputs against a recorded baseline.

Usage:
    python scripts/vpbd_rollback_diff_gate.py --record   # pin current behavior
    python scripts/vpbd_rollback_diff_gate.py            # verify vs pinned
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
BASELINE_PATH = REPO / "tests" / "fixtures" / "vpbd_rollback_baseline.json"


def run_rollback() -> dict:
    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REPO / "tests"))
    import jax

    jax.config.update("jax_platforms", "cpu")
    from conftest import make_song

    from audio_cut_tpu import separate_and_segment
    from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
    from audio_cut_tpu.config.auto_profile import profile_override_map
    from audio_cut_tpu.io import write_wav

    audio, sr = make_song(duration_s=24.0, seed=77)
    overrides = dict(profile_override_map("pop"))
    overrides["vpbd.candidate_pool"] = "legacy"
    with tempfile.TemporaryDirectory() as td:
        song = Path(td) / "rollback_song.wav"
        write_wav(song, audio, sr, subtype="FLOAT")
        set_runtime_config(overrides)
        try:
            m = separate_and_segment(
                input_uri=str(song), export_dir=str(Path(td) / "out"), mode="vpbd_acoustic"
            )
        finally:
            reset_runtime_config()
    bd = m.get("boundary_detection") or {}
    counts = bd.get("candidate_counts", {})
    return {
        "success": m.get("success"),
        "version": m.get("version"),
        "num_segments": m["stats"]["num_segments"],
        "cut_samples": m["cuts"]["samples"],
        "labels": [s["label"] for s in m["segments"]],
        "pool_mode": counts.get("pool_mode"),
        "beat_candidates": counts.get("beat"),
        "lyrics_candidates": counts.get("lyrics"),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true")
    args = ap.parse_args()

    current = run_rollback()
    if current.get("pool_mode") != "legacy":
        print(f"FATAL: rollback override not honored (pool_mode={current.get('pool_mode')!r})",
              file=sys.stderr)
        return 2
    if current.get("beat_candidates") or current.get("lyrics_candidates"):
        print("FATAL: legacy pool admitted beat/lyrics candidates", file=sys.stderr)
        return 2

    if args.record:
        BASELINE_PATH.parent.mkdir(parents=True, exist_ok=True)
        BASELINE_PATH.write_text(json.dumps(current, indent=2))
        print(f"baseline recorded: {BASELINE_PATH}")
        return 0

    if not BASELINE_PATH.exists():
        print("no baseline recorded; run with --record first", file=sys.stderr)
        return 2
    baseline = json.loads(BASELINE_PATH.read_text())
    failures = [
        f"{k}: baseline={baseline.get(k)!r} current={current.get(k)!r}"
        for k in current
        if baseline.get(k) != current.get(k)
    ]
    if failures:
        print("VPBD ROLLBACK GATE FAILED:")
        for f in failures:
            print("  " + f)
        return 1
    print("vpbd rollback gate OK: legacy candidate pool matches the pinned baseline")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
