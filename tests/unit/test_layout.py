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


def test_lib_segment_never_merged_away():
    """A '_lib' segment is skipped by merges (reference :151-153, :209-211)."""
    r = make_refiner(micro_merge_s=2.0, soft_min_s=5.0, soft_max_s=1e9, min_gap_s=0.0, beat_snap_ms=0)
    res = r.refine([10.0, 11.0], segment_kinds=["human", "human_lib", "human"])
    assert res.cut_times == [10.0, 11.0]


def test_soft_min_prefers_same_kind_neighbour():
    """Kind-aware cost: merging into a different-kind neighbour costs
    combined+1 extra (reference :221-226)."""
    r = make_refiner(micro_merge_s=0.0, soft_min_s=5.0, soft_max_s=1e9, min_gap_s=0.0, beat_snap_ms=0)
    # segments [0,20](music) [20,23](human) [23,30](human) [30,60](...)
    # the 3 s human fragment must merge RIGHT into the same-kind human
    # neighbour even though the left music segment is much longer
    res = r.refine([20.0, 23.0, 30.0],
                   segment_kinds=["music", "human", "human", "music"])
    assert 20.0 in res.cut_times          # music|human boundary preserved
    assert 23.0 not in res.cut_times      # human fragment absorbed rightward


def test_soft_min_never_exceeds_soft_max():
    """A merge that would exceed soft-max has infinite cost (reference :223)."""
    r = make_refiner(duration=22.0, micro_merge_s=0.0, soft_min_s=5.0, soft_max_s=12.0,
                     min_gap_s=0.0, beat_snap_ms=0)
    # [0,11] + [11,14] would be 14 s > soft_max; [11,14]+[14,22] = 11 s OK
    res = r.refine([11.0, 14.0], segment_kinds=["human", "human", "human"])
    assert 11.0 in res.cut_times
    assert 14.0 not in res.cut_times


def test_soft_min_unmergeable_fragment_left_alone():
    """Both merges exceeding soft-max -> fragment survives (cost inf both ways)."""
    r = make_refiner(micro_merge_s=0.0, soft_min_s=5.0, soft_max_s=12.0,
                     min_gap_s=0.0, beat_snap_ms=0)
    res = r.refine([11.0, 14.0], segment_kinds=["human", "human", "human"])
    assert 11.0 in res.cut_times and 14.0 in res.cut_times
    assert res.meta["soft_min_merged"] == 0


def test_rescue_consumes_candidates():
    """Each suppressed candidate is used at most once (reference :348)."""
    r = make_refiner(micro_merge_s=0.0, soft_min_s=0.0, soft_max_s=12.0, min_gap_s=1.0, beat_snap_ms=0)
    sup = [RescueCandidate(t=15.0, score=0.9)]
    res = r.refine([40.0], suppressed=sup)  # [0,40] needs >=2 splits
    assert sum(1 for t in res.cut_times if abs(t - 15.0) < 1e-6) == 1


def test_rescue_inside_word_penalized():
    from audio_cut_tpu.cutting.layout import LayoutConfig, LayoutRefiner

    cfg = LayoutConfig(micro_merge_s=0.0, soft_min_s=0.0, soft_max_s=12.0,
                       min_gap_s=1.0, beat_snap_ms=0)
    r = LayoutRefiner(cfg, 30.0, word_intervals=[(14.0, 16.0)])
    sup = [RescueCandidate(t=15.0, score=0.9),      # inside a word: 0.9-0.75
           RescueCandidate(t=18.0, score=0.5)]      # clean: 0.5
    res = r.refine([], suppressed=sup)
    assert any(abs(t - 18.0) < 1e-6 for t in res.cut_times)


def test_rescue_prefers_asr_boundary_affinity():
    from audio_cut_tpu.cutting.layout import LayoutConfig, LayoutRefiner

    cfg = LayoutConfig(micro_merge_s=0.0, soft_min_s=0.0, soft_max_s=12.0,
                       min_gap_s=1.0, beat_snap_ms=0)
    r = LayoutRefiner(cfg, 30.0, asr_boundaries=[15.1])
    sup = [RescueCandidate(t=15.0, score=0.5),      # 0.5 + 0.5*affinity(~0.87)
           RescueCandidate(t=20.0, score=0.6)]      # 0.6, no affinity
    res = r.refine([], suppressed=sup)
    assert any(abs(t - 15.0) < 1e-6 for t in res.cut_times)


def test_valley_split_uses_features_grid():
    import types

    from audio_cut_tpu.cutting.layout import LayoutConfig, LayoutRefiner

    hop_s = 0.05
    n = int(40.0 / hop_s) + 1
    rng = np.random.default_rng(0)
    rms = 0.5 + 0.05 * rng.standard_normal(n)  # realistic spread (>2% of median)
    rms[int(17.0 / hop_s)] = 0.01              # deep quiet valley at 17 s
    feats = types.SimpleNamespace(
        rms=rms, hop_s=hop_s, n_frames=n,
        frame_slice=lambda a, b: slice(int(a / hop_s), int(b / hop_s)),
    )
    cfg = LayoutConfig(micro_merge_s=0.0, soft_min_s=0.0, soft_max_s=25.0,
                       min_gap_s=1.0, beat_snap_ms=0, allow_midpoint_fallback=False)
    r = LayoutRefiner(cfg, 40.0, features=feats)  # [0,40] too long
    res = r.refine([])
    assert any(abs(t - 17.0) < 0.1 for t in res.cut_times)


def test_valley_split_rejects_flat_segment():
    """No valley in flat audio and midpoint disabled -> no split (ref :420-424)."""
    import types

    from audio_cut_tpu.cutting.layout import LayoutConfig, LayoutRefiner

    hop_s = 0.05
    n = int(40.0 / hop_s) + 1
    feats = types.SimpleNamespace(
        rms=np.full(n, 0.5), hop_s=hop_s, n_frames=n,
        frame_slice=lambda a, b: slice(int(a / hop_s), int(b / hop_s)),
    )
    cfg = LayoutConfig(micro_merge_s=0.0, soft_min_s=0.0, soft_max_s=25.0,
                       min_gap_s=1.0, beat_snap_ms=0, allow_midpoint_fallback=False)
    r = LayoutRefiner(cfg, 40.0, features=feats)
    res = r.refine([])
    assert res.cut_times == []
