"""Pre-guard candidate valley snap (pipeline/modes/pure_vocal._valley_snap_points).

Why this exists: vpbd planner candidates from lyric gaps carry text-derived
times (gap midpoints). On separated stems with real vocal decay tails the
midpoint sits on the slope and the quiet guard would drag the cut hundreds of
ms rightward, failing the PRD precision gate (avg<=150 ms / p95<=220 ms,
reference seamless_splitter.py:66-67). The snap moves candidates to the
quietest point of the guard's own dB grid first, so the guard accepts in
place.
"""

import numpy as np

from audio_cut_tpu.cutting.refine import CutPoint
from audio_cut_tpu.pipeline.modes.pure_vocal import _valley_snap_points

SR = 44100
STRIDE = 32
GRID_SR = SR / STRIDE


def _grid(duration_s: float, db: float = -60.0) -> np.ndarray:
    return np.full(int(duration_s * GRID_SR), db, np.float64)


def test_snaps_to_quietest_point_within_radius():
    env = _grid(10.0, -30.0)
    # decay slope: valley 300 ms right of the candidate
    t0 = 5.0
    vi = int((t0 + 0.3) * GRID_SR)
    env[vi - 3: vi + 3] = -55.0
    pts = [CutPoint(t0, 0.8, kind="lyrics_gap")]
    out = _valley_snap_points(pts, env, SR, STRIDE, radius_ms=450.0, min_drop_db=1.5)
    assert abs(out[0].t - (t0 + 0.3)) < 0.01
    assert out[0].score == 0.8 and out[0].kind == "lyrics_gap"


def test_flat_silence_does_not_move():
    """Clean stems (flat dB in the gap) must be untouched — this is what keeps
    the pinned rollback/diff-gate baselines identical."""
    env = _grid(10.0, -80.0)
    pts = [CutPoint(4.0, 0.5, kind="lyrics_gap"), CutPoint(7.0, 0.6, kind="pause")]
    out = _valley_snap_points(pts, env, SR, STRIDE, radius_ms=450.0, min_drop_db=1.5)
    assert [p.t for p in out] == [4.0, 7.0]


def test_snap_rejects_positions_inside_words():
    env = _grid(10.0, -30.0)
    vi = int(5.3 * GRID_SR)
    env[vi] = -55.0
    pts = [CutPoint(5.0, 0.8, kind="lyrics_gap")]
    out = _valley_snap_points(
        pts, env, SR, STRIDE, radius_ms=450.0, min_drop_db=1.5,
        word_intervals=[(5.2, 5.4)],
    )
    assert out[0].t == 5.0  # valley is inside a recognised word -> keep


def test_snap_rejects_positions_inside_overlapping_words():
    """Overlapping ASR word intervals (layered vocals) must be MERGED before
    the inside-word check: the searchsorted check alone would test only the
    latest-starting word and accept a position inside an earlier longer one."""
    env = _grid(20.0, -30.0)
    vi = int(11.5 * GRID_SR)
    env[vi] = -55.0
    pts = [CutPoint(10.95, 0.8, kind="lyrics_gap")]
    out = _valley_snap_points(
        pts, env, SR, STRIDE, radius_ms=900.0, min_drop_db=1.5,
        word_intervals=[(10.0, 12.0), (10.8, 11.0)],
    )
    assert out[0].t == 10.95  # 11.5 is inside (10.0, 12.0) -> rejected


def test_merge_word_intervals():
    from audio_cut_tpu.cutting.refine import merge_word_intervals

    assert merge_word_intervals([(10.0, 12.0), (10.8, 11.0), (12.5, 13.0)]) == [
        (10.0, 12.0), (12.5, 13.0)
    ]
    assert merge_word_intervals([(1.0, 2.0), (2.0, 3.0)]) == [(1.0, 3.0)]
    assert merge_word_intervals([]) == []


def test_small_drop_below_gate_does_not_move():
    env = _grid(10.0, -30.0)
    vi = int(5.2 * GRID_SR)
    env[vi] = -31.0  # only 1 dB quieter
    pts = [CutPoint(5.0, 0.8, kind="lyrics_gap")]
    out = _valley_snap_points(pts, env, SR, STRIDE, radius_ms=450.0, min_drop_db=1.5)
    assert out[0].t == 5.0


def test_vpbd_guard_shift_zero_after_snap():
    """End-to-end on a decay-tail stem: after snapping with radius equal to
    the guard's search window on the SAME grid, the rightward quiet guard
    finds nothing quieter -> shift exactly 0."""
    from audio_cut_tpu.cutting.refine import QuietLookup

    env = _grid(20.0, -30.0)
    # long decay slope into a deep valley
    t0 = 8.0
    for k in range(int(0.4 * GRID_SR)):
        env[int(t0 * GRID_SR) + k] = -30.0 - k * (25.0 / (0.4 * GRID_SR))
    pts = [CutPoint(t0, 0.9, kind="lyrics_gap")]
    snapped = _valley_snap_points(pts, env, SR, STRIDE, radius_ms=450.0, min_drop_db=1.5)
    lk = QuietLookup(sr=SR, db_grid=env, stride=STRIDE, floor_db=None, floor_percentile=50.0)
    t_in = np.asarray([snapped[0].t])
    t_out = lk.guard_right(t_in, max_shift_ms=450.0, guard_db=1.5)
    assert abs(t_out[0] - t_in[0]) < 1e-9
