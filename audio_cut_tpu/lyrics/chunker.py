"""ASR-safe chunk planning (parity: reference src/audio_cut/lyrics/chunker.py:18-84):
overlapping chunks (default 35 s, 1 s overlap) hard-capped below the ASR
model's input limit (55 s < FireRed AED's 60 s)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List


@dataclass(frozen=True)
class AsrChunk:
    index: int
    start_s: float
    end_s: float

    @property
    def duration_s(self) -> float:
        return self.end_s - self.start_s


def plan_asr_chunks(
    duration_s: float,
    chunk_s: float = 35.0,
    overlap_s: float = 1.0,
    max_chunk_s: float = 55.0,
) -> List[AsrChunk]:
    duration_s = float(duration_s)
    if duration_s <= 0:
        return []
    chunk_s = min(float(chunk_s), float(max_chunk_s))
    overlap_s = max(0.0, min(float(overlap_s), chunk_s / 2.0))
    if duration_s <= chunk_s:
        return [AsrChunk(0, 0.0, duration_s)]

    stride = chunk_s - overlap_s
    chunks: List[AsrChunk] = []
    start = 0.0
    idx = 0
    while True:
        end = start + chunk_s
        if end >= duration_s:
            chunks.append(AsrChunk(idx, max(0.0, duration_s - chunk_s), duration_s))
            break
        chunks.append(AsrChunk(idx, start, end))
        start += stride
        idx += 1
    return chunks


def chunk_join_times(chunks: List[AsrChunk]) -> List[float]:
    """Overlap midpoints between consecutive chunks — forbidden cut times."""
    joins: List[float] = []
    for a, b in zip(chunks, chunks[1:]):
        joins.append((b.start_s + a.end_s) / 2.0)
    return joins
