#!/usr/bin/env python3
"""vpbd_asr acceptance harness over the fake lyrics provider.

Parity role: the reference ships a manual 20-song acceptance pipeline
(scripts/vpbd_asr_acceptance.py + prepare/sync/validate, SURVEY §2.9). Real
playlists can't exist in this environment, so this harness is fully
scriptable: N seeded synthetic songs, each with a generated word/sentence
timeline matching its vocal phrases, run end-to-end through vpbd_asr with
the fake provider, then gated on the PRD-derived acceptance metrics
(reference PRD.md:40-43: >=90% segments in duration band, >=80% cuts at
natural pauses; plus cut-inside-word rate, lyrics coverage, guard gate).

Usage: python scripts/vpbd_asr_acceptance.py [--songs 8] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

GATES = {
    "duration_band_rate": 0.90,   # >=90% segments in band (reference PRD.md:41)
    "cut_inside_word_rate": 0.10,  # cuts landing inside ASR words (lower=better)
    "natural_pause_rate": 0.80,   # >=80% cuts at natural pauses (PRD.md:42)
    "lyrics_used_rate": 1.0,      # songs where the ASR timeline actually loaded
    "precision_guard_rate": 1.0,  # guard avg<=150ms / p95<=220ms
}


def synth_song_with_timeline(seed: int, duration_s: float):
    """Seeded song + ground-truth word/sentence timeline for its phrases."""
    import numpy as np

    sr = 44100
    rng = np.random.default_rng(seed)
    n = int(duration_s * sr)
    t = np.arange(n, dtype=np.float64) / sr
    audio = np.zeros(n, dtype=np.float64)
    for beat in np.arange(0.0, duration_s, 0.5):
        i = int(beat * sr)
        env = np.exp(-np.arange(min(2000, n - i)) / 300.0)
        audio[i:i + env.size] += 0.12 * env * rng.standard_normal(env.size)

    words, sentences, regions = [], [], []
    phrase, widx = 0.0, 0
    while phrase + 2.8 < duration_s:
        start, end = phrase, phrase + rng.uniform(1.8, 2.6)
        seg = (t >= start) & (t < end)
        f0 = rng.uniform(180, 300) * (1 + 0.01 * np.sin(2 * np.pi * 5.5 * t[seg]))
        x = np.zeros(seg.sum())
        for h in range(1, 5):
            x += np.sin(2 * np.pi * h * np.cumsum(f0) / sr) / h
        fade = np.minimum(1.0, np.minimum(np.arange(seg.sum()), seg.sum() - np.arange(seg.sum()))
                          / (0.05 * sr))
        audio[seg] += 0.35 * x * fade

        # 3 "words" per phrase with tiny intra-phrase gaps
        w_edges = np.linspace(start, end, 4)
        sent_words = []
        for a, b in zip(w_edges[:-1], w_edges[1:]):
            words.append({"text": f"w{widx}", "start_s": round(a + 0.02, 3),
                          "end_s": round(b - 0.05, 3), "confidence": 0.95})
            sent_words.append(words[-1]["text"])
            widx += 1
        sentences.append({"text": " ".join(sent_words) + ".",
                          "start_s": round(start + 0.02, 3),
                          "end_s": round(end - 0.05, 3), "confidence": 0.92})
        regions.append({"start_s": round(start, 3), "end_s": round(end, 3),
                        "kind": "singing", "confidence": 0.9})
        phrase = end + rng.uniform(0.8, 1.4)

    peak = np.abs(audio).max()
    audio = (0.9 * audio / peak).astype(np.float32)
    timeline = {"language": "en", "words": words, "sentences": sentences,
                "vad_regions": regions}
    return audio, sr, timeline


def run_song(seed: int, duration_s: float, td: Path, prebuilt=None) -> dict:
    import numpy as np

    from audio_cut_tpu import separate_and_segment
    from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
    from audio_cut_tpu.io import write_wav

    if prebuilt is not None:
        audio, sr, timeline = prebuilt
    else:
        audio, sr, timeline = synth_song_with_timeline(seed, duration_s)
    song = td / f"song_{seed}.wav"
    write_wav(song, audio, sr, subtype="FLOAT")
    fixture = td / f"timeline_{seed}.json"
    fixture.write_text(json.dumps(timeline))

    set_runtime_config({
        "lyrics_alignment.enabled": True,
        "lyrics_alignment.provider": "fake",
        "lyrics_alignment.fixture_path": str(fixture),
    })
    try:
        m = separate_and_segment(
            input_uri=str(song), export_dir=str(td / f"out_{seed}"), mode="vpbd_asr"
        )
    finally:
        reset_runtime_config()

    qa = m.get("qa_report") or {}
    cuts = [s / sr for s in m["cuts"]["samples"] if 0 < s < len(audio)]
    word_hits = 0
    for c in cuts:
        for w in timeline["words"]:
            if w["start_s"] + 0.02 < c < w["end_s"] - 0.02:
                word_hits += 1
                break
    quiet_hits = 0
    for c in cuts:
        i = int(c * sr)
        win = audio[max(0, i - 2000):i + 2000]
        if win.size and np.abs(win).max() < 0.5 * np.abs(audio).max():
            quiet_hits += 1

    layout = m.get("layout_cfg") or {}
    lo = float(layout.get("soft_min_s", 5.0))
    hi = float(layout.get("soft_max_s", 12.0))
    durs = [s["duration"] for s in m["segments"]]
    in_band = sum(1 for d in durs if lo - 0.5 <= d <= hi + 0.5)

    la = m.get("lyrics_alignment") or {}
    return {
        "seed": seed,
        "success": bool(m.get("success")),
        "num_segments": len(durs),
        "duration_band_rate": in_band / max(1, len(durs)),
        "cut_inside_word_rate": word_hits / max(1, len(cuts)),
        "natural_pause_rate": quiet_hits / max(1, len(cuts)),
        "lyrics_used": la.get("provider") == "fake" and "timeline" in la,
        "precision_guard_ok": bool((m.get("guard") or {}).get("precision_ok", False)),
        "qa": {k: qa.get(k) for k in ("cut_inside_word_rate", "avg_boundary_score",
                                      "lyrics_coverage", "beat_aligned_ratio")},
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--songs", type=int, default=8)
    ap.add_argument("--duration", type=float, default=24.0)
    ap.add_argument("--json", default=None, help="write full report JSON here")
    ap.add_argument("--corpus", type=int, nargs="?", const=0, default=None,
                    metavar="N",
                    help="run over the FROZEN acceptance corpus "
                         "(tests/fixtures/acceptance/corpus_v1.json, "
                         "2-4 min full-arrangement tracks; VERDICT r4 "
                         "task #6) instead of the quick built-in songs; "
                         "bare --corpus (or N=0) means all manifest tracks, "
                         "N>0 the first N. Each track's digest is verified "
                         "before use.")
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    import jax

    jax.config.update("jax_platforms", "cpu")

    specs = None
    if args.corpus is not None:
        from audio_cut_tpu.training.corpus import (
            corpus_track,
            derive_timeline,
            load_manifest,
            track_digest,
        )

        manifest = load_manifest()
        specs = manifest["tracks"][: args.corpus or None]

    rows = []
    with tempfile.TemporaryDirectory() as tds:
        td = Path(tds)
        if specs is not None:
            for spec in specs:
                mix, vocal, sr = corpus_track(spec["seed"], spec["duration_s"])
                if track_digest(mix) != spec["sha256_mix_i16"]:
                    print(f"CORPUS DRIFT: {spec['id']} digest mismatch — the "
                          "generator changed; refreeze the manifest deliberately")
                    return 2
                timeline = derive_timeline(vocal, sr)
                row = run_song(spec["seed"], spec["duration_s"], td,
                               prebuilt=(mix, sr, timeline))
                row["id"] = spec["id"]
                rows.append(row)
                print(f"corpus {spec['id']} ({spec['duration_s']:.0f}s): "
                      f"segs={row['num_segments']} "
                      f"band={row['duration_band_rate']:.2f} "
                      f"in-word={row['cut_inside_word_rate']:.2f} "
                      f"quiet={row['natural_pause_rate']:.2f} "
                      f"lyrics={row['lyrics_used']} guard={row['precision_guard_ok']}",
                      flush=True)
        else:
            for k in range(args.songs):
                row = run_song(1000 + 13 * k, args.duration, td)
                rows.append(row)
                print(f"song {row['seed']}: segs={row['num_segments']} "
                      f"band={row['duration_band_rate']:.2f} "
                      f"in-word={row['cut_inside_word_rate']:.2f} "
                      f"quiet={row['natural_pause_rate']:.2f} "
                      f"lyrics={row['lyrics_used']} guard={row['precision_guard_ok']}")

    n = len(rows)
    agg = {
        "duration_band_rate": sum(r["duration_band_rate"] for r in rows) / n,
        "cut_inside_word_rate": sum(r["cut_inside_word_rate"] for r in rows) / n,
        "natural_pause_rate": sum(r["natural_pause_rate"] for r in rows) / n,
        "lyrics_used_rate": sum(1 for r in rows if r["lyrics_used"]) / n,
        "precision_guard_rate": sum(1 for r in rows if r["precision_guard_ok"]) / n,
        "all_success": all(r["success"] for r in rows),
    }
    print("\naggregate:", json.dumps(agg, indent=2))
    if args.json:
        Path(args.json).write_text(json.dumps({"songs": rows, "aggregate": agg}, indent=2))

    failures = []
    if not agg["all_success"]:
        failures.append("not all songs succeeded")
    for key, gate in GATES.items():
        val = agg[key]
        ok = val <= gate if key == "cut_inside_word_rate" else val >= gate
        if not ok:
            failures.append(f"{key}={val:.3f} fails gate {gate}")
    if failures:
        print("ACCEPTANCE FAILED:")
        for f in failures:
            print("  " + f)
        return 1
    print("vpbd_asr acceptance OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
