"""Chunk-local -> global timeline merge with overlap word dedup.

Parity: reference src/audio_cut/lyrics/timeline.py:21-119 — words from
overlapping ASR chunks deduplicated by text + interval overlap /
center distance, tie broken by confidence then chunk-center proximity;
`forbidden_cut_times_s` records the chunk joins.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from audio_cut_tpu.lyrics.chunker import AsrChunk, chunk_join_times
from audio_cut_tpu.lyrics.models import LyricsTimeline, Sentence, VadRegion, Word

_OVERLAP_DEDUP_RATIO = 0.5
_CENTER_DEDUP_S = 0.12


def _center(w) -> float:
    return (w.start_s + w.end_s) / 2.0


def _overlap_ratio(a: Word, b: Word) -> float:
    inter = min(a.end_s, b.end_s) - max(a.start_s, b.start_s)
    if inter <= 0:
        return 0.0
    shortest = min(a.end_s - a.start_s, b.end_s - b.start_s)
    return inter / max(shortest, 1e-9)


def _duplicate(a: Word, b: Word) -> bool:
    if a.text != b.text:
        return False
    return (
        _overlap_ratio(a, b) >= _OVERLAP_DEDUP_RATIO
        or abs(_center(a) - _center(b)) <= _CENTER_DEDUP_S
    )


def _better(a: Tuple[Word, float], b: Tuple[Word, float]) -> Tuple[Word, float]:
    """Pick the duplicate to keep: higher confidence, then nearer its chunk center."""
    (wa, da), (wb, db) = a, b
    ca = wa.confidence if wa.confidence is not None else -1.0
    cb = wb.confidence if wb.confidence is not None else -1.0
    if ca != cb:
        return a if ca > cb else b
    return a if da <= db else b


def merge_chunk_timelines(
    chunk_results: Sequence[Tuple[AsrChunk, LyricsTimeline]],
    duration_s: Optional[float] = None,
) -> LyricsTimeline:
    """Merge per-chunk timelines (already in chunk-LOCAL seconds) globally."""
    entries: List[Tuple[Word, float]] = []   # (global word, dist to chunk center)
    sentences: List[Sentence] = []
    regions: List[VadRegion] = []

    for chunk, timeline in chunk_results:
        shifted = timeline.shift(chunk.start_s)
        chunk_center = (chunk.start_s + chunk.end_s) / 2.0
        for w in shifted.words:
            entries.append((w, abs(_center(w) - chunk_center)))
        sentences.extend(shifted.sentences)
        regions.extend(shifted.vad_regions)

    entries.sort(key=lambda e: (e[0].start_s, e[0].end_s))
    kept: List[Tuple[Word, float]] = []
    for entry in entries:
        if kept and _duplicate(kept[-1][0], entry[0]):
            kept[-1] = _better(kept[-1], entry)
        else:
            kept.append(entry)

    # sentences: dedupe identical (text, ~same interval) from the overlap
    sent_kept: List[Sentence] = []
    for s in sorted(sentences, key=lambda x: (x.start_s, x.end_s)):
        if sent_kept and s.text == sent_kept[-1].text and abs(s.start_s - sent_kept[-1].start_s) < 0.5:
            continue
        sent_kept.append(s)

    joins = chunk_join_times([c for c, _ in chunk_results])
    return LyricsTimeline(
        words=[w for w, _ in kept],
        sentences=sent_kept,
        vad_regions=_merge_regions(regions),
        duration_s=duration_s,
        forbidden_cut_times_s=joins,
    )


def _merge_regions(regions: List[VadRegion]) -> List[VadRegion]:
    out: List[VadRegion] = []
    for r in sorted(regions, key=lambda x: (x.kind, x.start_s)):
        if out and out[-1].kind == r.kind and r.start_s <= out[-1].end_s + 1e-6:
            out[-1].end_s = max(out[-1].end_s, r.end_s)
        else:
            out.append(VadRegion(r.start_s, r.end_s, r.kind, r.confidence))
    return sorted(out, key=lambda x: (x.start_s, x.end_s))
