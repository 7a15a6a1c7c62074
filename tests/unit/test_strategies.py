import numpy as np
import pytest

from audio_cut_tpu.analysis.beat_analyzer import BeatAnalyzer
from audio_cut_tpu.analysis.features import build_track_features
from audio_cut_tpu.pipeline.strategies import (
    BeatOnlyStrategy,
    SegmentationContext,
    SnapToBeatStrategy,
    build_strategy,
)


@pytest.fixture(scope="module")
def analyzed_song():
    from tests.conftest import make_song

    audio, sr = make_song(duration_s=30.0, seed=21)
    feats = build_track_features(audio, sr)
    ba = BeatAnalyzer().analyze(feats)
    return audio, sr, feats, ba


def make_ctx(feats, ba, mdd_cuts, **cfg):
    return SegmentationContext(
        duration_s=feats.duration_s,
        mdd_cuts=mdd_cuts,
        beat_analysis=ba,
        features=feats,
        vocal_rms=feats.rms,
        config={"snap_tolerance_ms": 200, "vad_protection": False,
                "beat_cut_density": "medium", "bars_per_cut": 2, **cfg},
    )


def test_beat_analyzer_result(analyzed_song):
    _, _, feats, ba = analyzed_song
    assert ba.beat_times.size > 10
    assert ba.bar_times.size > 2
    assert ba.bar_energies.size == ba.bar_times.size - 1
    assert ba.high_energy_mask.dtype == bool
    meta = ba.to_meta()
    assert meta["bar_count"] == ba.bar_energies.size


def test_snap_to_beat_force_snaps_to_beats(analyzed_song):
    _, _, feats, ba = analyzed_song
    mdd = [7.3, 14.8, 22.1]
    ctx = make_ctx(feats, ba, mdd, chorus_force_snap=True)
    res = SnapToBeatStrategy().generate_cut_points(ctx)
    assert len(res.cuts) == 3
    for t, lib in zip(res.cuts, res.lib_flags):
        if lib:
            d = np.abs(ba.beat_times - t).min()
            assert d < 1e-6, "lib cuts must sit exactly on beats"
    assert any(res.lib_flags), "with force snap and 200ms tolerance, some cut should snap"


def test_snap_respects_tolerance(analyzed_song):
    _, _, feats, ba = analyzed_song
    period = 60.0 / ba.bpm
    # a cut maximally far from any beat cannot snap under min(tol, 0.4*period)
    far = float(ba.beat_times[10]) + period / 2.0
    ctx = make_ctx(feats, ba, [far], chorus_force_snap=True, snap_tolerance_ms=50)
    res = SnapToBeatStrategy().generate_cut_points(ctx)
    assert res.lib_flags == [False]
    assert res.cuts == [far]


def test_beat_only_cuts_in_high_energy_bars(analyzed_song):
    _, _, feats, ba = analyzed_song
    ctx = make_ctx(feats, ba, [5.0, 25.0])
    res = BeatOnlyStrategy().generate_cut_points(ctx)
    # every lib cut must be a bar boundary
    for t, lib in zip(res.cuts, res.lib_flags):
        if lib:
            assert np.abs(ba.bar_times - t).min() < 1e-6


def test_build_strategy():
    assert build_strategy("snap_to_beat").name == "snap_to_beat"
    assert build_strategy("beat_only").name == "beat_only"
    with pytest.raises(ValueError):
        build_strategy("nope")
