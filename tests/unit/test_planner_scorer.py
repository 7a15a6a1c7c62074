import numpy as np
import pytest

from audio_cut_tpu.analysis.boundary_features import BoundaryFeatureExtractor, BoundaryFeatures
from audio_cut_tpu.cutting.candidates import (
    CandidateSource,
    CutCandidate,
    merge_candidate_pool,
)
from audio_cut_tpu.cutting.planner import (
    GlobalCutPlanner,
    GlobalCutPlannerConfig,
    apply_guard_shift_metadata,
)
from audio_cut_tpu.cutting.refine import CutAdjustment
from audio_cut_tpu.cutting.scorer import PhraseBoundaryScorer
from audio_cut_tpu.lyrics.models import LyricsTimeline, Sentence, VadRegion, Word


def cand(t, score, source=CandidateSource.ACOUSTIC_PAUSE, **features):
    return CutCandidate(t=t, score=score, source=source, features=features)


class TestPlanner:
    def test_plan_selects_feasible_path(self):
        cfg = GlobalCutPlannerConfig(hard_min_s=2, hard_max_s=18, target_min_s=5, target_max_s=12)
        cands = [cand(t, 0.8) for t in (6.0, 12.0, 19.0, 25.0)]
        res = GlobalCutPlanner(cfg).plan(cands, duration_s=30.0)
        assert res.feasible
        assert res.cut_times[0] == 0.0 and res.cut_times[-1] == 30.0
        segs = np.diff(res.cut_times)
        assert (segs >= 2.0).all() and (segs <= 18.0).all()
        assert len(res.selected_candidates) >= 2

    def test_vocal_risk_penalty_changes_choice(self):
        cfg = GlobalCutPlannerConfig(hard_min_s=2, hard_max_s=18, target_min_s=5, target_max_s=12)
        risky = cand(10.0, 0.8, vocal_cut_risk=1.0)
        safe = cand(10.3, 0.7, vocal_cut_risk=0.0)
        res = GlobalCutPlanner(cfg).plan([risky, safe], duration_s=20.0)
        times = [c.t for c in res.selected_candidates]
        assert 10.3 in times and 10.0 not in times

    def test_per_second_prune(self):
        cfg = GlobalCutPlannerConfig(max_candidates_per_second=1.0)
        cands = [cand(5.1 + 0.01 * i, 0.5 + 0.01 * i) for i in range(10)]
        kept, suppressed = GlobalCutPlanner(cfg)._prune(cands, 20.0)
        assert len(kept) == 1 and len(suppressed) == 9
        assert kept[0].score == max(c.score for c in cands)

    def test_rescue_on_infeasible(self):
        cfg = GlobalCutPlannerConfig(hard_min_s=2, hard_max_s=10)
        res = GlobalCutPlanner(cfg).plan([], duration_s=35.0)  # no candidates, 35s > 10s
        assert res.metadata["planner"] == "rescue"
        segs = np.diff(res.cut_times)
        assert (segs <= 10.0 + 1e-6).all()
        assert res.cut_times[-1] == 35.0

    def test_no_rescue_when_disabled(self):
        cfg = GlobalCutPlannerConfig(hard_min_s=2, hard_max_s=10, rescue_enabled=False)
        res = GlobalCutPlanner(cfg).plan([], duration_s=35.0)
        assert not res.feasible

    def test_guard_shift_metadata(self):
        res = GlobalCutPlanner().plan([cand(7.0, 0.9)], duration_s=14.0)
        adj = [CutAdjustment(7.0, 7.02, 7.05, 0.9, 20.0, 50.0)]
        res2 = apply_guard_shift_metadata(res, adj)
        assert res2.metadata["final_time_by_raw_time"][7.0] == 7.05
        assert res2.metadata["guard_shift_ms_by_raw_time"][7.0] == 20.0


class TestScorer:
    def test_weights_and_penalties(self):
        s = PhraseBoundaryScorer()
        good = BoundaryFeatures(acoustic_pause=1.0, asr_gap=1.0, sentence_end=1.0)
        bad = BoundaryFeatures(acoustic_pause=1.0, inside_word_penalty=1.0)
        assert s.score(good) > s.score(bad)
        assert s.score(bad) == 0.0  # 0.35 - 0.8 clamps to 0

    def test_priority_ordering(self):
        """Long pause > breath+sentence > beat (reference behavioral test)."""
        s = PhraseBoundaryScorer()
        long_pause = s.score(BoundaryFeatures(acoustic_pause=1.0, asr_gap=0.8, sentence_end=0.5))
        breath_sentence = s.score(BoundaryFeatures(breath=1.0, sentence_end=1.0))
        beat_only = s.score(BoundaryFeatures(beat_affinity=1.0))
        assert long_pause > breath_sentence > beat_only


class TestBoundaryFeatures:
    @pytest.fixture()
    def extractor(self):
        tl = LyricsTimeline(
            words=[Word("aa", 1.0, 2.0, 0.9), Word("bb", 3.0, 4.0, 0.9)],
            sentences=[Sentence("aa bb.", 1.0, 4.0, 0.9)],
            vad_regions=[VadRegion(0.8, 4.2, "singing", 0.9)],
        )
        rng = np.random.default_rng(0)
        return BoundaryFeatureExtractor(
            timeline=tl,
            beat_times=[0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0],
            mdd_times=[2.5],
            rms_series=rng.random(200) * 0.1,
            hop_s=0.05,
        )

    def test_inside_word_penalty(self, extractor):
        f_mid = extractor.extract(1.5)
        f_out = extractor.extract(2.5)
        assert f_mid.inside_word_penalty == 1.0  # high confidence word interior
        assert f_out.inside_word_penalty == 0.0

    def test_word_edge_softening(self, extractor):
        f_edge = extractor.extract(1.01)  # 10ms inside vs 60ms tolerance
        assert 0.0 < f_edge.inside_word_penalty < 0.5

    def test_asr_gap(self, extractor):
        f = extractor.extract(2.5)
        assert abs(f.asr_gap - (1.0 / 1.5)) < 1e-6

    def test_sentence_end_proximity(self, extractor):
        assert extractor.extract(4.0).sentence_end > 0.8
        assert extractor.extract(5.0).sentence_end == 0.0

    def test_beat_affinity_and_conflict(self, extractor):
        on_beat = extractor.extract(2.0)
        off_beat = extractor.extract(2.25)
        assert on_beat.beat_affinity == 1.0 and on_beat.beat_conflict == 0.0
        assert off_beat.beat_affinity == 0.0 and off_beat.beat_conflict == 1.0

    def test_singing_penalty(self, extractor):
        assert extractor.extract(2.0).singing_penalty == 1.0
        assert extractor.extract(6.0).singing_penalty == 0.0

    def test_batch_matches_single(self, extractor):
        times = [0.5, 1.5, 2.5, 4.0]
        batch = extractor.extract_batch(times)
        for t, f in zip(times, batch):
            single = extractor.extract(t)
            assert single.to_dict() == f.to_dict()


class TestPoolMerge:
    def test_cluster_and_provenance(self):
        a = [cand(5.00, 0.9)]
        b = [cand(5.05, 0.4, CandidateSource.BREATH)]
        c = [cand(8.0, 0.3, CandidateSource.BEAT)]
        merged = merge_candidate_pool([a, b, c], cluster_ms=120.0)
        assert len(merged) == 2
        first = merged[0]
        assert first.t == 5.00  # strongest member wins
        assert set(first.meta["sources"]) == {"acoustic_pause", "breath"}
