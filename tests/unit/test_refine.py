import numpy as np

from audio_cut_tpu.cutting.refine import (
    CutContext,
    CutPoint,
    align_to_zero_cross,
    finalize_cut_points,
    guard_shift_stats,
    nms_min_gap,
)


def test_nms_min_gap_orders_and_gaps():
    pts = [CutPoint(1.0, 0.9), CutPoint(1.5, 0.8), CutPoint(3.0, 0.7), CutPoint(3.2, 0.95)]
    kept = nms_min_gap(pts, min_gap_s=1.0)
    times = [p.t for p in kept]
    assert times == sorted(times)
    assert all(b - a >= 1.0 for a, b in zip(times, times[1:]))
    # 3.2 has the highest score, so 3.0 must be suppressed
    assert 3.2 in times and 3.0 not in times


def test_nms_window_cap():
    pts = [CutPoint(t, 0.5 + 0.01 * t) for t in np.arange(0.5, 9.5, 1.0)]
    kept = nms_min_gap(pts, min_gap_s=0.5, max_per_window=2, window_s=10.0)
    assert len(kept) == 2


def test_nms_topk():
    pts = [CutPoint(float(t), 1.0 - 0.01 * t) for t in range(20)]
    kept = nms_min_gap(pts, min_gap_s=0.5, topk=5)
    assert len(kept) == 5


def test_zero_cross_snap():
    sr = 1000
    t = np.arange(sr, dtype=np.float64) / sr
    wave = np.sin(2 * np.pi * 10 * t).astype(np.float32)  # zeros every 50 ms
    snapped = align_to_zero_cross(wave, sr, 0.513, win_ms=30.0)
    # nearest zero crossing of sin(2*pi*10 t) to 0.513 is 0.5 or 0.55 -> 0.5 is closer? |0.513-0.5|=13ms, |0.55-0.513|=37ms
    assert abs(snapped - 0.5) < 0.002


def test_finalize_guards_move_into_silence():
    sr = 44100
    audio = np.ones(sr * 4, dtype=np.float32) * 0.5
    # true silence from 2.05s to 2.4s; raw cut at 2.0 (still loud)
    audio[int(2.05 * sr):int(2.4 * sr)] = 0.0
    # add tiny noise so zero-crossings exist
    rng = np.random.default_rng(0)
    audio += rng.standard_normal(audio.size).astype(np.float32) * 1e-4
    res = finalize_cut_points(
        CutContext(sr=sr, mix_wave=audio),
        [CutPoint(2.0, 0.9)],
        search_right_ms=450.0,
        guard_db=1.5,
        guard_win_ms=10.0,
        floor_db=None,  # derive from percentile
        min_gap_s=1.0,
    )
    assert len(res.final_points) == 1
    t = res.final_points[0].t
    assert 2.04 < t < 2.41  # moved rightward into the quiet zone
    assert res.adjustments[0].final_shift_ms > 30


def test_finalize_filters_boundaries_and_reports_suppressed():
    sr = 8000
    audio = np.random.default_rng(1).standard_normal(sr * 10).astype(np.float32) * 0.2
    pts = [CutPoint(0.1, 0.5), CutPoint(5.0, 0.9), CutPoint(5.2, 0.4), CutPoint(9.95, 0.5)]
    res = finalize_cut_points(
        CutContext(sr=sr, mix_wave=audio), pts,
        min_gap_s=1.0, min_boundary_s=0.5,
        enable_mix_guard=False, enable_vocal_guard=False,
    )
    times = [p.t for p in res.final_points]
    assert all(0.5 < t < 9.5 for t in times)
    sup_times = {round(p.t, 2) for p in res.suppressed_points}
    assert 5.2 in sup_times


def test_finalize_empty_candidates():
    sr = 8000
    audio = np.zeros(sr, dtype=np.float32)
    res = finalize_cut_points(CutContext(sr=sr, mix_wave=audio), [])
    assert res.final_points == []
    assert res.sample_boundaries == [0, sr]


def test_guard_shift_stats():
    from audio_cut_tpu.cutting.refine import CutAdjustment

    adjs = [CutAdjustment(0, 0, 0.01, 1.0, 10.0, 10.0),
            CutAdjustment(1, 1, 1.1, 1.0, 100.0, 100.0)]
    stats = guard_shift_stats(adjs)
    assert stats["count"] == 2
    assert abs(stats["avg_ms"] - 55.0) < 1e-9
    assert stats["max_ms"] == 100.0


# -- guard restore outside ASR words (reference seamless_splitter.py:1880-1947) --


def _adj(raw, final):
    from audio_cut_tpu.cutting.refine import CutAdjustment

    return CutAdjustment(raw, final, final, 1.0,
                         (final - raw) * 1000.0, (final - raw) * 1000.0)


def test_restore_guard_moved_into_word():
    from audio_cut_tpu.cutting.refine import restore_guards_outside_words

    # raw 4.0 (outside words), guard pushed it to 4.5 (inside word 4.3-4.8)
    times, adjs, n = restore_guards_outside_words(
        [4.5, 9.0], [_adj(4.0, 4.5), _adj(9.0, 9.0)],
        [(4.3, 4.8)], duration_s=20.0, sr=44100, min_gap_s=1.0,
    )
    assert n == 1
    assert abs(times[0] - 4.0) < 1e-9 and abs(times[1] - 9.0) < 1e-9
    assert adjs is not None
    assert adjs[0].final_time == 4.0 and adjs[0].final_shift_ms == 0.0
    assert adjs[1].final_time == 9.0


def test_no_restore_when_raw_also_inside_word():
    from audio_cut_tpu.cutting.refine import restore_guards_outside_words

    times, adjs, n = restore_guards_outside_words(
        [4.5], [_adj(4.4, 4.5)], [(4.3, 4.8)],
        duration_s=20.0, sr=44100, min_gap_s=1.0,
    )
    assert n == 0 and adjs is None and abs(times[0] - 4.5) < 1e-9


def test_no_restore_when_min_gap_violated():
    from audio_cut_tpu.cutting.refine import restore_guards_outside_words

    # restoring 4.5 -> 4.0 would leave only 0.3 s to the neighbour at 3.7
    times, adjs, n = restore_guards_outside_words(
        [3.7, 4.5], [_adj(4.0, 4.5)], [(4.3, 4.8)],
        duration_s=20.0, sr=44100, min_gap_s=1.0,
    )
    assert n == 0 and adjs is None
    assert [round(t, 3) for t in times] == [3.7, 4.5]


def test_restore_noop_without_words():
    from audio_cut_tpu.cutting.refine import restore_guards_outside_words

    times, adjs, n = restore_guards_outside_words(
        [4.5], [_adj(4.0, 4.5)], [], duration_s=20.0, sr=44100, min_gap_s=1.0,
    )
    assert n == 0 and adjs is None and times == [4.5]


def test_guard_right_prefers_nearest_qualifying_point():
    """The guard budgets DISPLACEMENT (precision gate avg<=150/p95<=220 ms):
    once an offset clears guard_db + floor, a quieter-but-farther point must
    not win. Two quiet zones right of the cut — the near one qualifies, the
    far one is even quieter; the guard must land in the near one."""
    from audio_cut_tpu.cutting.refine import QuietLookup

    sr = 44100
    audio = np.ones(sr * 4, dtype=np.float32) * 0.5
    audio[int(2.06 * sr):int(2.12 * sr)] = 1e-5   # near quiet zone (~60ms away)
    audio[int(2.30 * sr):int(2.40 * sr)] = 1e-7   # far, quieter zone (~300ms away)
    look = QuietLookup(audio, sr, window_ms=10.0, floor_db=-40.0)
    out = look.guard_right(np.array([2.0]), max_shift_ms=450.0, guard_db=1.5)
    shift_ms = (out[0] - 2.0) * 1000.0
    assert 30.0 < shift_ms < 160.0, f"expected the near zone, shifted {shift_ms:.1f}ms"


def test_guard_right_stays_put_when_nothing_qualifies():
    sr = 44100
    audio = np.ones(sr * 2, dtype=np.float32) * 0.5  # uniformly loud
    from audio_cut_tpu.cutting.refine import QuietLookup
    look = QuietLookup(audio, sr, window_ms=10.0, floor_db=-40.0)
    out = look.guard_right(np.array([1.0]), max_shift_ms=450.0, guard_db=1.5)
    assert out[0] == 1.0


def test_guard_right_no_inplace_snap_at_array_end():
    """A cut on the LAST grid frame with guard_db=0 over a quiet tail: every
    rightward offset clamps back onto the same frame, so nothing actually
    moves — the time must come back untouched, not quantized onto the dB
    grid (the end-of-array variant of the offset-0 in-place snap)."""
    from audio_cut_tpu.cutting.refine import QuietLookup

    sr = 44100
    audio = np.full(sr * 2, 1e-6, dtype=np.float32)  # quiet everywhere
    look = QuietLookup(audio, sr, window_ms=10.0, floor_db=-40.0,
                       db_grid=np.full(200, -90.0), stride=441)
    grid_sr = sr / 441
    t = 199.4 / grid_sr  # rounds to the last grid index, off-grid time
    out = look.guard_right(np.array([t]), max_shift_ms=450.0, guard_db=0.0)
    assert out[0] == t, f"in-place snap at array end: {t} -> {out[0]}"
