"""Cut-point refinement: NMS, zero-crossing snap, quiet guards.

Behavioral parity with reference src/audio_cut/cutting/refine.py:268-410
(finalize_cut_points): score-ordered min-gap NMS with per-window caps,
vocal-then-mix guard staging, rightward quiet search, boundary/min-gap filter,
CutAdjustment bookkeeping (raw/guard/final times + ms shifts) and suppressed
points.

TPU-first differences: the per-sample RMS-dB lookups that power the quiet
guard are computed ONCE on device (ops.frames.moving_rms_db — a cumulative-sum
window reduction) for the whole track, and every per-point search is a
vectorised numpy gather over that array. There is no per-point Python rescan;
the reference's "slow path" (refine.py:113-157) is subsumed by the fast one.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from audio_cut_tpu.ops.frames import moving_rms_db

_EPS = 1e-12


@dataclass
class CutPoint:
    t: float
    score: float
    kind: str = "pause"


@dataclass
class CutContext:
    sr: int
    mix_wave: np.ndarray
    vocal_wave: Optional[np.ndarray] = None


@dataclass
class CutAdjustment:
    raw_time: float
    guard_time: float
    final_time: float
    score: float
    guard_shift_ms: float
    final_shift_ms: float

    def to_dict(self) -> Dict[str, float]:
        return {
            "raw_time": self.raw_time,
            "guard_time": self.guard_time,
            "final_time": self.final_time,
            "score": self.score,
            "guard_shift_ms": self.guard_shift_ms,
            "final_shift_ms": self.final_shift_ms,
        }


@dataclass
class CutRefineResult:
    final_points: List[CutPoint]
    sample_boundaries: List[int]
    adjustments: List[CutAdjustment]
    suppressed_points: List[CutPoint] = field(default_factory=list)


def _ensure_mono(wave: Optional[np.ndarray]) -> Optional[np.ndarray]:
    if wave is None:
        return None
    w = np.asarray(wave)
    if w.ndim == 2:
        return np.mean(w, axis=-1 if w.shape[-1] <= 2 else 0).astype(np.float32)
    return w.reshape(-1).astype(np.float32, copy=False)


class QuietLookup:
    """Track RMS-dB grid queried on host for rightward quiet searches.

    The grid may be decimated by ``stride`` samples (the detection bundle
    supplies stride-32 grids; guards operate on >=5 ms windows so decimation
    is lossless for them).
    """

    def __init__(
        self,
        wave: Optional[np.ndarray] = None,
        sr: int = 44100,
        window_ms: float = 10.0,
        floor_db: Optional[float] = -60.0,
        floor_percentile: float = 0.5,
        *,
        db_grid: Optional[np.ndarray] = None,
        stride: int = 1,
    ):
        self.sr = sr
        if db_grid is not None:
            self.rms_db = np.asarray(db_grid)
            self.stride = int(stride)
        else:
            win = max(1, int(round(window_ms / 1000.0 * sr)))
            self.rms_db = np.asarray(moving_rms_db(jnp.asarray(wave), win))
            self.stride = 1
        if floor_db is None:
            floor_db = float(np.percentile(self.rms_db, floor_percentile))
        self.floor_db = float(floor_db)

    def guard_right(self, times: np.ndarray, max_shift_ms: float, guard_db: float) -> np.ndarray:
        """Vectorised rightward quiet search for all cut times at once."""
        if times.size == 0:
            return times
        n = self.rms_db.size
        grid_sr = self.sr / self.stride
        span = max(1, int(round(max_shift_ms / 1000.0 * grid_sr)))
        idx = np.clip(np.round(times * grid_sr).astype(np.int64), 0, n - 1)
        offs = np.arange(span)
        win_idx = np.minimum(idx[:, None] + offs[None, :], n - 1)       # [K, span]
        win_db = self.rms_db[win_idx]
        orig_db = self.rms_db[idx]
        # Nearest offset that already satisfies the quiet conditions, not the
        # globally quietest one: the precision gate (avg<=150ms / p95<=220ms)
        # budgets DISPLACEMENT, so once a point clears guard_db + floor there
        # is nothing to gain by sliding further right.
        qualify = ((orig_db[:, None] - win_db) >= guard_db) & (win_db <= self.floor_db)
        # staying put is "no adjustment", not a grid-snapped move: this kills
        # offset 0 AND every end-of-array column that clamps back onto idx
        # (a cut on the last grid frame with guard_db<=0 used to "accept" a
        # zero-length move and get quantized onto the dB grid)
        qualify &= win_idx != idx[:, None]
        accept = qualify.any(axis=1)
        best_off = np.argmax(qualify, axis=1)                           # first True
        target_idx = np.minimum(idx + best_off, n - 1)
        out = np.where(accept, target_idx.astype(np.float64) / grid_sr, times)
        return out


def align_to_zero_cross(wave: Optional[np.ndarray], sr: int, t: float, win_ms: float = 8.0) -> float:
    """Snap one time to the nearest zero crossing (sub-sample interpolated)."""
    out = align_to_zero_cross_many(wave, sr, np.asarray([t], dtype=np.float64), win_ms)
    return float(out[0])


def align_to_zero_cross_many(
    wave: Optional[np.ndarray], sr: int, times: np.ndarray, win_ms: float = 8.0
) -> np.ndarray:
    """Vectorised zero-cross snap for all times. Parity: refine.py:72-110."""
    wave = _ensure_mono(wave)
    if wave is None or wave.size < 3 or sr <= 0 or times.size == 0:
        return times
    n = wave.size
    half = max(1, int(round(win_ms / 1000.0 * sr)))
    idx = np.round(times * sr).astype(np.int64)
    valid = (idx > 0) & (idx < n)

    lo = np.clip(idx - half, 1, n - 1)
    width = 2 * half + 1
    offs = np.arange(width)
    pos = np.minimum(lo[:, None] + offs[None, :], n - 1)               # [K, W]
    left = wave[pos - 1]
    right = wave[pos]
    crossing = (left == 0.0) | (right == 0.0) | (left * right < 0.0)
    denom = np.abs(left) + np.abs(right)
    frac = np.where(denom > _EPS, np.abs(left) / np.maximum(denom, _EPS), 0.5)
    zero_pos = np.where(left == 0.0, (pos - 1).astype(np.float64), (pos - 1) + frac)
    zero_pos = np.where(right == 0.0, pos.astype(np.float64), zero_pos)
    dist = np.where(crossing, np.abs(zero_pos - idx[:, None]), np.inf)
    best = np.argmin(dist, axis=1)
    rows = np.arange(times.size)
    found = np.isfinite(dist[rows, best])
    snapped = zero_pos[rows, best] / float(sr)
    return np.where(valid & found, snapped, times)


def nms_min_gap(
    points: Iterable[CutPoint],
    min_gap_s: float,
    topk: Optional[int] = None,
    *,
    max_per_window: Optional[int] = None,
    window_s: float = 10.0,
) -> List[CutPoint]:
    """Greedy score-ordered suppression with min time gap and per-window cap.

    Parity: refine.py:218-245.
    """
    ordered = sorted(points, key=lambda p: p.score, reverse=True)
    kept: List[CutPoint] = []
    kept_times: List[float] = []
    window_counts: Dict[int, int] = {}
    span = max(window_s, min_gap_s, 1e-6)
    for p in ordered:
        if kept_times and np.min(np.abs(np.asarray(kept_times) - p.t)) < min_gap_s:
            continue
        bucket = int(p.t // span) if max_per_window is not None else None
        if bucket is not None and window_counts.get(bucket, 0) >= max_per_window:
            continue
        kept.append(p)
        kept_times.append(p.t)
        if bucket is not None:
            window_counts[bucket] = window_counts.get(bucket, 0) + 1
        if topk is not None and len(kept) >= topk:
            break
    return sorted(kept, key=lambda p: p.t)


def _filter_cut_times(
    times: Sequence[float], *, duration_s: float, min_gap_s: float, min_boundary_s: float
) -> List[float]:
    out: List[float] = []
    if duration_s <= 0.0:
        return out
    boundary = min(min_boundary_s, duration_s / 2.0)
    for t in sorted(times):
        if t <= boundary or t >= duration_s - boundary:
            continue
        if out and (t - out[-1]) < min_gap_s:
            continue
        out.append(t)
    return out


def finalize_cut_points(
    ctx: CutContext,
    raw_points: Iterable[CutPoint],
    *,
    use_vocal_guard_first: bool = True,
    min_gap_s: float = 1.0,
    max_keep: Optional[int] = None,
    topk_per_10s: Optional[int] = None,
    nms_window_s: float = 10.0,
    guard_db: float = 2.0,
    search_right_ms: float = 150.0,
    guard_win_ms: float = 10.0,
    floor_db: Optional[float] = -60.0,
    floor_percentile: float = 0.5,
    enable_mix_guard: bool = True,
    enable_vocal_guard: bool = True,
    zero_cross_win_ms: float = 8.0,
    min_boundary_s: float = 0.5,
    vocal_lookup: Optional[QuietLookup] = None,
    mix_lookup: Optional[QuietLookup] = None,
) -> CutRefineResult:
    """NMS -> zero-cross snap -> vocal quiet guard -> mix guard -> filter."""
    sr = ctx.sr
    mix = _ensure_mono(ctx.mix_wave)
    vocal = _ensure_mono(ctx.vocal_wave)
    duration_s = mix.size / float(sr) if mix is not None and sr > 0 else 0.0

    if mix is None or mix.size == 0 or sr <= 0:
        return CutRefineResult([], [0, 0 if mix is None else mix.size], [])

    base = list(raw_points)
    if not base:
        return CutRefineResult([], [0, mix.size], [])

    cap = topk_per_10s if (topk_per_10s or 0) > 0 else None
    pruned = nms_min_gap(base, min_gap_s=min_gap_s, topk=max_keep, max_per_window=cap, window_s=nms_window_s)
    kept_ids = {id(p) for p in pruned}
    suppressed = [CutPoint(float(p.t), float(p.score), p.kind) for p in base if id(p) not in kept_ids]

    raw_times = np.asarray([p.t for p in pruned], dtype=np.float64)
    scores = np.asarray([p.score for p in pruned], dtype=np.float64)

    # stage 1: vocal zero-cross + vocal quiet guard. The quiet guard only
    # needs the precomputed dB lookup, so it runs even without a host vocal
    # waveform (wave-free bundle path); the vocal zero-cross align is a
    # sub-ms adjustment that the mix-stage zero-cross supersedes anyway.
    guard_times = raw_times.copy()
    if use_vocal_guard_first:
        has_wave = vocal is not None and vocal.size
        if has_wave:
            guard_times = align_to_zero_cross_many(vocal, sr, guard_times, zero_cross_win_ms)
        if enable_vocal_guard and (vocal_lookup is not None or has_wave):
            vlook = vocal_lookup or QuietLookup(vocal, sr, guard_win_ms, floor_db, floor_percentile)
            guard_times = vlook.guard_right(guard_times, search_right_ms, guard_db)

    # stage 2: mix zero-cross + mix quiet guard
    final_times = align_to_zero_cross_many(mix, sr, guard_times, zero_cross_win_ms)
    if enable_mix_guard:
        mlook = mix_lookup or QuietLookup(mix, sr, guard_win_ms, floor_db, floor_percentile)
        final_times = mlook.guard_right(final_times, search_right_ms, guard_db)
    final_times = np.clip(final_times, 0.0, max(duration_s, 0.0))

    adjustments = [
        CutAdjustment(
            raw_time=float(rt),
            guard_time=float(gt),
            final_time=float(ft),
            score=float(sc),
            guard_shift_ms=float((gt - rt) * 1000.0),
            final_shift_ms=float((ft - rt) * 1000.0),
        )
        for rt, gt, ft, sc in zip(raw_times, guard_times, final_times, scores)
    ]

    kept_times = _filter_cut_times(
        final_times.tolist(), duration_s=duration_s, min_gap_s=min_gap_s, min_boundary_s=min_boundary_s
    )
    kept_adjustments: List[CutAdjustment] = []
    if adjustments:
        finals = np.asarray([a.final_time for a in adjustments])
        for t in kept_times:
            kept_adjustments.append(adjustments[int(np.argmin(np.abs(finals - t)))])

    final_points = [CutPoint(t=float(t), score=1.0) for t in kept_times]
    boundaries = sorted({0, mix.size, *(int(round(t * sr)) for t in kept_times)})
    return CutRefineResult(final_points, boundaries, kept_adjustments, suppressed)


def merge_word_intervals(word_intervals) -> List[Tuple[float, float]]:
    """Merge overlapping/touching (start, end) intervals into a disjoint
    sorted list. ASR word intervals DO overlap (layered/backing vocals);
    searchsorted-based inside-word checks are only correct on disjoint
    intervals — an overlapped longer word would otherwise be missed."""
    iv = sorted((float(a), float(b)) for a, b in word_intervals)
    merged: List[Tuple[float, float]] = []
    for a, b in iv:
        if merged and a <= merged[-1][1]:
            if b > merged[-1][1]:
                merged[-1] = (merged[-1][0], b)
        else:
            merged.append((a, b))
    return merged


def restore_guards_outside_words(
    cut_times: Sequence[float],
    adjustments: Sequence[CutAdjustment],
    word_intervals: Sequence[Tuple[float, float]],
    *,
    duration_s: float,
    sr: int,
    min_gap_s: float,
) -> Tuple[List[float], Optional[List[CutAdjustment]], int]:
    """Undo guard moves that push a boundary from outside an ASR word into one.

    Parity: reference seamless_splitter.py:1880-1947
    (_restore_guard_points_outside_lyrics_words), applied only on vpbd_asr:
    a quiet-guard shift is meant to land in silence; if it instead lands
    strictly inside a recognised word while the raw candidate was outside any
    word, the raw time was the better boundary. Each restore must keep the
    min-gap invariant against its neighbours; restored adjustments become
    zero-shift entries so guard statistics stay honest.

    Returns (times, adjustments-or-None-when-unchanged, restored_count).
    """
    times = sorted(float(t) for t in cut_times)
    if not times or not adjustments or not word_intervals:
        return times, None, 0

    intervals = merge_word_intervals(word_intervals)
    starts = np.asarray([a for a, _ in intervals])
    ends = np.asarray([b for _, b in intervals])

    def _inside(t: float) -> bool:
        i = int(np.searchsorted(starts, t, side="right")) - 1
        return i >= 0 and starts[i] < t < ends[i]

    def _key(t: float) -> int:
        return int(round(t * sr))

    points = sorted({_key(t) for t in times if 0 < _key(t) < _key(duration_s)})
    min_gap = max(0, int(round(min_gap_s * sr)))
    restored_raw: set = set()

    for adj in adjustments:
        raw_t, final_t = float(adj.raw_time), float(adj.final_time)
        if not _inside(final_t) or _inside(raw_t):
            continue
        raw_sample, final_sample = _key(raw_t), _key(final_t)
        if final_sample not in points or raw_sample in (0, _key(duration_s)):
            continue
        candidate = sorted(raw_sample if p == final_sample else p for p in points)
        idx = candidate.index(raw_sample)
        left_ok = idx == 0 or candidate[idx] - candidate[idx - 1] >= min_gap
        right_ok = idx == len(candidate) - 1 or candidate[idx + 1] - candidate[idx] >= min_gap
        if not (left_ok and right_ok):
            continue
        points = candidate
        restored_raw.add(raw_t)

    if not restored_raw:
        return times, None, 0

    new_adjustments = [
        CutAdjustment(
            raw_time=a.raw_time, guard_time=a.raw_time, final_time=a.raw_time,
            score=a.score, guard_shift_ms=0.0, final_shift_ms=0.0,
        )
        if float(a.raw_time) in restored_raw
        else a
        for a in adjustments
    ]
    return [p / float(sr) for p in points], new_adjustments, len(restored_raw)


def guard_shift_stats(adjustments: Sequence[CutAdjustment]) -> Dict[str, float]:
    """avg/max/p95 |final shift| in ms + count (parity: guard_shift_stats)."""
    if not adjustments:
        return {"count": 0, "avg_ms": 0.0, "max_ms": 0.0, "p95_ms": 0.0}
    shifts = np.abs(np.asarray([a.final_shift_ms for a in adjustments]))
    return {
        "count": int(shifts.size),
        "avg_ms": float(shifts.mean()),
        "max_ms": float(shifts.max()),
        "p95_ms": float(np.percentile(shifts, 95)),
    }
