#!/usr/bin/env python3
"""Adapter: official ASR CLI output -> the lyrics timeline protocol.

Parity: reference scripts/fireredasr2s_worker.py:17-60 — wraps an external
ASR tool whose per-utterance results land in a result.jsonl, converting them
into the LyricsTimeline JSON consumed by CliLyricsProvider
(--input-json - --output <file> contract).

The external ASR binary is configured via --asr-cmd; each line of its JSONL
output is expected to carry text plus start/end times (s or ms keys).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
from pathlib import Path


def _alias_confidence(item: dict) -> dict:
    """FireRedASR2S emits `asr_confidence`; the timeline protocol reads
    `confidence` (reference scripts/fireredasr2s_worker.py:111-126)."""
    if isinstance(item, dict) and "confidence" not in item and "asr_confidence" in item:
        item = dict(item)
        item["confidence"] = item.pop("asr_confidence")
    return item


def convert_result_jsonl(lines) -> dict:
    """ASR CLI result.jsonl -> worker payload for protocol.normalize_response.

    Two shapes are accepted:

    * the REAL FireRedASR2S format (reference scripts/fireredasr2s_worker.py:
      17-44): ONE row per input wav carrying ``uttid``/``text``/``wav_path``/
      ``dur_s``, ``words``/``sentences`` lists with ``start_ms``/``end_ms``/
      ``text``/``(asr_)confidence``, and ``vad_segments_ms`` as either
      ``[start_ms, end_ms]`` pairs or dicts;
    * a generic per-utterance stream (one JSON object per line with ``text``
      + ``start``/``end`` seconds) for other ASR CLIs.

    Time units are NOT converted here — ``start_ms`` keys pass through and
    protocol._time_s scales them; that keeps this adapter a pure shape
    adapter with one normalization path.
    """
    words, sentences, vad_regions = [], [], []
    meta = {}
    for raw in lines:
        raw = raw.strip()
        if not raw:
            continue
        try:
            item = json.loads(raw)
        except json.JSONDecodeError:
            continue
        if not isinstance(item, dict):
            continue
        structured = any(k in item for k in ("words", "tokens", "sentences", "vad_segments_ms"))
        for w in item.get("words") or item.get("tokens") or []:
            words.append(_alias_confidence(w))
        for s in item.get("sentences") or []:
            sentences.append(_alias_confidence(s))
        for seg in item.get("vad_segments_ms") or []:
            if isinstance(seg, dict):
                vad_regions.append(_alias_confidence(seg))
            elif isinstance(seg, (list, tuple)) and len(seg) >= 2:
                vad_regions.append(
                    {"start_ms": seg[0], "end_ms": seg[1], "kind": "singing"})
        if item.get("text") and item.get("start") is not None and not structured:
            # generic one-utterance-per-line stream
            sentences.append({
                "text": item["text"],
                "start": item.get("start"),
                "end": item.get("end"),
                "confidence": item.get("confidence"),
            })
        for key in ("uttid", "wav_path", "dur_s"):
            if item.get(key) is not None and key not in meta:
                meta[key] = item[key]
    payload = {"words": words, "sentences": sentences, "vad_regions": vad_regions}
    if meta:
        payload["meta"] = meta
        if meta.get("dur_s") is not None:
            payload["duration_s"] = float(meta["dur_s"])
    return payload


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-json", default="-")
    ap.add_argument("--output", required=True)
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--asr-cmd", default=None,
                    help="external ASR command; {audio} and {out} are substituted")
    args = ap.parse_args()

    request = json.loads(sys.stdin.read() if args.input_json == "-" else Path(args.input_json).read_text())
    audio_path = request["audio_path"]

    if not args.asr_cmd:
        print("no --asr-cmd configured; emitting empty timeline", file=sys.stderr)
        Path(args.output).write_text(json.dumps({"words": [], "sentences": []}))
        return 0

    with tempfile.TemporaryDirectory() as td:
        result_path = Path(td) / "result.jsonl"
        cmd = args.asr_cmd.format(audio=audio_path, out=result_path)
        proc = subprocess.run(cmd, shell=True, capture_output=True, timeout=600)
        if proc.returncode != 0:
            print(proc.stderr.decode(errors="replace")[-1000:], file=sys.stderr)
            return 1
        lines = result_path.read_text().splitlines() if result_path.exists() else []

    payload = convert_result_jsonl(lines)

    # normalise through the package's protocol for consistent key handling
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from audio_cut_tpu.lyrics.protocol import normalize_response

    timeline = normalize_response(payload)
    Path(args.output).write_text(json.dumps(timeline.to_dict(), ensure_ascii=False))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
