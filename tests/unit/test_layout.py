import numpy as np

from audio_cut_tpu.cutting.layout import LayoutConfig, LayoutRefiner, RescueCandidate, refine_layout


def make_refiner(duration=60.0, **kw):
    return LayoutRefiner(LayoutConfig(**kw), duration)


def test_micro_merge_removes_fragment():
    r = make_refiner(micro_merge_s=2.0, soft_min_s=0.0, soft_max_s=1e9, min_gap_s=0.0, beat_snap_ms=0)
    res = r.refine([10.0, 11.0, 20.0])  # 1 s fragment between 10 and 11
    assert len(res.cut_times) == 2
    assert res.meta["micro_merged"] >= 1


def test_soft_min_merges_into_cheaper_side():
    r = make_refiner(micro_merge_s=0.0, soft_min_s=5.0, soft_max_s=1e9, min_gap_s=0.0, beat_snap_ms=0)
    # segments: [0,10],[10,13],[13,60]: middle 3s < soft_min -> one cut dropped
    res = r.refine([10.0, 13.0])
    assert len(res.cut_times) == 1
    assert res.meta["soft_min_merged"] == 1


def test_soft_max_rescue_prefers_suppressed_candidate():
    r = make_refiner(micro_merge_s=0.0, soft_min_s=0.0, soft_max_s=12.0, min_gap_s=1.0, beat_snap_ms=0)
    sup = [RescueCandidate(t=15.0, score=0.9)]
    res = r.refine([30.0], suppressed=sup)   # [0,30] too long -> split at 15
    assert any(abs(t - 15.0) < 1e-6 for t in res.cut_times)
    assert res.meta["rescued"] >= 1


def test_soft_max_midpoint_fallback():
    r = make_refiner(micro_merge_s=0.0, soft_min_s=0.0, soft_max_s=20.0, min_gap_s=1.0, beat_snap_ms=0)
    res = r.refine([])  # [0,60] -> splits recursively at midpoints
    assert len(res.cut_times) >= 2
    segs = np.diff([0.0, *res.cut_times, 60.0])
    assert (segs <= 20.0 + 1e-6).all()


def test_min_gap_enforced():
    r = make_refiner(micro_merge_s=0.0, soft_min_s=0.0, soft_max_s=1e9, min_gap_s=2.0, beat_snap_ms=0)
    res = r.refine([5.0, 6.0, 10.0])
    times = res.cut_times
    assert all(b - a >= 2.0 for a, b in zip([0.0, *times], [*times, 60.0]))


def test_beat_snap():
    cfg = LayoutConfig(micro_merge_s=0.0, soft_min_s=0.0, soft_max_s=1e9, min_gap_s=0.0, beat_snap_ms=50)
    r = LayoutRefiner(cfg, 60.0, beat_times=np.arange(0.0, 60.0, 0.5))
    res = r.refine([10.02, 20.3])
    assert any(abs(t - 10.0) < 1e-9 for t in res.cut_times)   # snapped (20 ms away)
    assert any(abs(t - 20.3) < 1e-9 for t in res.cut_times)   # not snapped (200 ms away)
    assert res.meta["beat_snapped"] == 1


def test_disabled_layout_passthrough():
    res = refine_layout([10.0, 11.0], 60.0, config={"enable": False})
    assert res.cut_times == [10.0, 11.0]


def test_lib_kind_cuts_protected():
    r = make_refiner(micro_merge_s=2.0, soft_min_s=0.0, soft_max_s=1e9, min_gap_s=0.0, beat_snap_ms=0)
    res = r.refine([10.0, 11.0], cut_kinds=["beat", "beat"])
    assert res.cut_times == [10.0, 11.0]  # beat cuts never micro-merged
