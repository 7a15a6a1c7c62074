#!/usr/bin/env python3
"""Release gate: rerun legacy modes against a pinned baseline and diff.

Parity: reference scripts/legacy_mode_diff_gate.py:1-50 — rerun
v2.2_mdd / hybrid_mdd / librosa_onset on a fixed input and diff the
stable manifest fields + exported-filename pattern against a recorded
baseline JSON. Record a baseline with --record, gate with no args.

Usage:
    python scripts/legacy_mode_diff_gate.py --record   # pin current behavior
    python scripts/legacy_mode_diff_gate.py            # verify vs pinned
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
BASELINE_PATH = REPO / "tests" / "fixtures" / "legacy_mode_baseline.json"
MODES = ("v2.2_mdd", "hybrid_mdd", "librosa_onset")
_NAME_RE = re.compile(r"^segment_\d{3}_(human|music)(_lib)?(_vocal)?_\d+\.\d\.wav$")

_STABLE_FIELDS = ("success", "version")


def run_modes() -> dict:
    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REPO / "tests"))
    import jax

    jax.config.update("jax_platforms", "cpu")
    from conftest import make_song
    from audio_cut_tpu import separate_and_segment
    from audio_cut_tpu.io import write_wav

    audio, sr = make_song(duration_s=20.0, seed=99)
    results = {}
    with tempfile.TemporaryDirectory() as td:
        song = Path(td) / "gate_song.wav"
        write_wav(song, audio, sr, subtype="FLOAT")
        for mode in MODES:
            out = Path(td) / mode.replace(".", "_")
            m = separate_and_segment(input_uri=str(song), export_dir=str(out), mode=mode)
            names = sorted(p.name for p in out.glob("segment_*.wav"))
            bad = [n for n in names if not _NAME_RE.match(n)]
            results[mode] = {
                **{k: m.get(k) for k in _STABLE_FIELDS},
                "num_segments": m["stats"]["num_segments"],
                "cut_samples": m["cuts"]["samples"],
                "labels": [s["label"] for s in m["segments"]],
                "filename_pattern_ok": not bad,
                "bad_names": bad,
            }
    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true", help="pin current behavior as baseline")
    args = ap.parse_args()

    current = run_modes()
    if args.record:
        BASELINE_PATH.parent.mkdir(parents=True, exist_ok=True)
        BASELINE_PATH.write_text(json.dumps(current, indent=2))
        print(f"baseline recorded: {BASELINE_PATH}")
        return 0

    if not BASELINE_PATH.exists():
        print("no baseline recorded; run with --record first", file=sys.stderr)
        return 2
    baseline = json.loads(BASELINE_PATH.read_text())

    failures = []
    for mode in MODES:
        base, cur = baseline.get(mode, {}), current.get(mode, {})
        for key in ("success", "version", "num_segments", "cut_samples", "labels",
                    "filename_pattern_ok"):
            if base.get(key) != cur.get(key):
                failures.append(f"{mode}.{key}: baseline={base.get(key)!r} current={cur.get(key)!r}")
    if failures:
        print("DIFF GATE FAILED:")
        for f in failures:
            print("  " + f)
        return 1
    print("diff gate OK: all legacy modes match the pinned baseline")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
