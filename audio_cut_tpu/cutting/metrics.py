"""Chunk-vs-full consistency metrics (parity: reference src/audio_cut/cutting/metrics.py)."""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def compute_cut_time_diffs_ms(
    cuts_a: Sequence[float], cuts_b: Sequence[float], max_match_s: float = 1.0
) -> List[float]:
    """Per-cut |Δt| in ms between two aligned cut lists (greedy nearest match)."""
    a = np.asarray(sorted(cuts_a), dtype=np.float64)
    b = np.asarray(sorted(cuts_b), dtype=np.float64)
    if a.size == 0 or b.size == 0:
        return []
    diffs: List[float] = []
    used = np.zeros(b.size, dtype=bool)
    for t in a:
        cand = np.where(~used)[0]
        if cand.size == 0:
            break
        j = cand[np.argmin(np.abs(b[cand] - t))]
        if abs(b[j] - t) <= max_match_s:
            used[j] = True
            diffs.append(abs(b[j] - t) * 1000.0)
    return diffs


def summarize_diffs(diffs_ms: Sequence[float]) -> Dict[str, float]:
    if not diffs_ms:
        return {"count": 0, "mean_ms": 0.0, "p50_ms": 0.0, "p95_ms": 0.0, "max_ms": 0.0}
    d = np.asarray(diffs_ms, dtype=np.float64)
    return {
        "count": int(d.size),
        "mean_ms": float(d.mean()),
        "p50_ms": float(np.percentile(d, 50)),
        "p95_ms": float(np.percentile(d, 95)),
        "max_ms": float(d.max()),
    }
