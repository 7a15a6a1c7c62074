"""Standing acceptance corpus: versioned, regenerable long-form tracks.

The reference validates against a real 20-song playlist kept in
input/acceptance/ (reference PRD.md:40-56, scripts/vpbd_asr_acceptance.py).
This environment has no real/copyrighted audio, so the corpus is SYNTHETIC
but FROZEN: every track is a (seed, duration) pair through the rich
full-arrangement generator (training/rich_data.py::synth_pair_arrangement —
tempo-locked drums/bass/chords, sparse/dense sections, bar-aligned vocal
phrases with true rest bars), and the manifest in
tests/fixtures/acceptance/corpus_v1.json pins a digest of each track's
int16-quantized audio. Audio is regenerated on demand — nothing big is
committed — and any generator drift that would silently change the
acceptance numbers fails the digest check instead.

Ground-truth timelines are DERIVED from the clean vocal stem (we have it by
construction): RMS-gated activity spans become vad_regions/sentences, split
into word-sized pieces — the same shape the fake ASR provider serves, so the
vpbd_asr acceptance harness runs unchanged over corpus tracks.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

SR = 44100
CORPUS_VERSION = "v1"
MANIFEST_PATH = (Path(__file__).resolve().parents[2] / "tests" / "fixtures"
                 / "acceptance" / f"corpus_{CORPUS_VERSION}.json")

# 12 long-form tracks, 2-4 minutes each (PRD-scale songs). Seeds chosen
# arbitrarily and then FROZEN by the manifest digests.
DEFAULT_TRACKS: List[Dict] = [
    {"id": f"arr_{k:02d}", "seed": 52000 + 97 * k,
     "duration_s": [120.0, 150.0, 180.0, 240.0][k % 4]}
    for k in range(12)
]


def corpus_track(seed: int, duration_s: float) -> Tuple[np.ndarray, np.ndarray, int]:
    """(mix, clean_vocal, sr) for one corpus entry — deterministic in seed."""
    from audio_cut_tpu.training.rich_data import synth_pair_arrangement

    rng = np.random.default_rng(seed)
    n = int(round(duration_s * SR))
    mix, vocal = synth_pair_arrangement(rng, n)
    return mix, vocal, SR


def track_digest(audio: np.ndarray) -> str:
    """sha256 of the int16-quantized waveform.

    Quantization (~3e-5 steps) makes the digest robust to sub-ulp libm
    differences across hosts while still catching any real generator change.
    """
    x = np.asarray(audio, dtype=np.float32)
    peak = max(float(np.abs(x).max()), 1e-9)
    q = np.clip(np.round(x / peak * 32767.0), -32768, 32767).astype(np.int16)
    return hashlib.sha256(q.tobytes()).hexdigest()


def derive_timeline(vocal: np.ndarray, sr: int,
                    hop_s: float = 0.05,
                    merge_gap_s: float = 0.25,
                    min_span_s: float = 0.30,
                    word_s: float = 0.45) -> Dict:
    """Ground-truth lyrics timeline from the CLEAN vocal stem.

    RMS frames -> activity gate (relative to the stem's loud reference) ->
    merged spans. Each span becomes one sentence + one singing vad_region,
    split into ~word_s words. Mirrors the shape of a real ASR worker's
    normalized output (lyrics/protocol.py::normalize_response)."""
    hop = max(1, int(round(hop_s * sr)))
    n = vocal.shape[-1]
    n_frames = n // hop
    if n_frames == 0:
        return {"language": "en", "words": [], "sentences": [], "vad_regions": []}
    frames = vocal[: n_frames * hop].reshape(n_frames, hop)
    rms = np.sqrt(np.mean(np.square(frames, dtype=np.float64), axis=-1))
    loud = np.percentile(rms, 95) + 1e-12
    active = rms > 0.08 * loud

    # merge short gaps, drop short spans
    spans: List[Tuple[float, float]] = []
    start = None
    for i, a in enumerate(active):
        if a and start is None:
            start = i
        elif not a and start is not None:
            spans.append((start * hop_s, i * hop_s))
            start = None
    if start is not None:
        spans.append((start * hop_s, n_frames * hop_s))
    merged: List[List[float]] = []
    for s, e in spans:
        if merged and s - merged[-1][1] < merge_gap_s:
            merged[-1][1] = e
        else:
            merged.append([s, e])
    spans = [(s, e) for s, e in merged if e - s >= min_span_s]

    words, sentences, regions = [], [], []
    widx = 0
    for s, e in spans:
        n_words = max(1, int(round((e - s) / word_s)))
        edges = np.linspace(s, e, n_words + 1)
        texts = []
        for a, b in zip(edges[:-1], edges[1:]):
            words.append({"text": f"w{widx}", "start_s": round(float(a) + 0.01, 3),
                          "end_s": round(float(b) - 0.02, 3), "confidence": 0.95})
            texts.append(words[-1]["text"])
            widx += 1
        sentences.append({"text": " ".join(texts) + ".",
                          "start_s": round(float(s) + 0.01, 3),
                          "end_s": round(float(e) - 0.02, 3), "confidence": 0.92})
        regions.append({"start_s": round(float(s), 3), "end_s": round(float(e), 3),
                        "kind": "singing", "confidence": 0.9})
    return {"language": "en", "words": words, "sentences": sentences,
            "vad_regions": regions}


def build_manifest(tracks: List[Dict] = None) -> Dict:
    """Regenerate every track and record digests (used once to freeze the
    corpus, and by tests to detect generator drift)."""
    rows = []
    for spec in tracks or DEFAULT_TRACKS:
        mix, vocal, _sr = corpus_track(spec["seed"], spec["duration_s"])
        rows.append({**spec,
                     "sha256_mix_i16": track_digest(mix),
                     "sha256_vocal_i16": track_digest(vocal)})
    return {"version": CORPUS_VERSION, "sample_rate": SR,
            "generator": "training/rich_data.py::synth_pair_arrangement",
            "tracks": rows}


def load_manifest(path: Path = MANIFEST_PATH) -> Dict:
    return json.loads(Path(path).read_text())


def verify_track(spec: Dict) -> bool:
    """Regenerate one manifest entry and check both digests."""
    mix, vocal, _sr = corpus_track(spec["seed"], spec["duration_s"])
    return (track_digest(mix) == spec["sha256_mix_i16"]
            and track_digest(vocal) == spec["sha256_vocal_i16"])
