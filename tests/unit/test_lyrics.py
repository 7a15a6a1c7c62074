import json
from pathlib import Path

import pytest

from audio_cut_tpu.exceptions import LyricsAlignmentUnavailable, TimelineValidationError
from audio_cut_tpu.lyrics.candidates import LyricsBoundaryCandidateGenerator
from audio_cut_tpu.lyrics.chunker import chunk_join_times, plan_asr_chunks
from audio_cut_tpu.lyrics.models import LyricsTimeline, Sentence, VadRegion, Word
from audio_cut_tpu.lyrics.protocol import normalize_response
from audio_cut_tpu.lyrics.providers import FakeLyricsProvider, NullLyricsProvider
from audio_cut_tpu.lyrics.segment_attach import attach_lyrics_to_segments, join_words
from audio_cut_tpu.lyrics.timeline import merge_chunk_timelines
from audio_cut_tpu.lyrics.cache import TimelineCache, compute_cache_key

FIXTURE = Path(__file__).parent.parent / "fixtures" / "lyrics" / "simple_song_timeline.json"


class TestModels:
    def test_roundtrip(self):
        data = json.loads(FIXTURE.read_text())
        tl = LyricsTimeline.from_dict(data)
        back = tl.to_dict()
        assert len(back["words"]) == 8
        assert back["words"][0]["text"] == "hello"
        tl2 = LyricsTimeline.from_dict(back)
        assert [w.text for w in tl2.words] == [w.text for w in tl.words]

    def test_validation_rejects_bad_interval(self):
        with pytest.raises(TimelineValidationError):
            Word(text="x", start_s=2.0, end_s=1.0)
        with pytest.raises(TimelineValidationError):
            Word(text="x", start_s=-1.0, end_s=1.0)
        with pytest.raises(TimelineValidationError):
            Word(text="x", start_s=0.0, end_s=1.0, confidence=1.5)

    def test_strict_vs_lenient(self):
        bad = {"words": [{"text": "a", "start_s": 5, "end_s": 1}]}
        with pytest.raises(TimelineValidationError):
            LyricsTimeline.from_dict(bad, strict=True)
        tl = LyricsTimeline.from_dict(bad, strict=False)
        assert tl.words == []

    def test_tail_clamp(self):
        tl = LyricsTimeline(
            words=[Word("x", 9.0, 10.004)], duration_s=10.0,
        )
        assert tl.words[0].end_s == 10.0
        with pytest.raises(TimelineValidationError):
            LyricsTimeline(words=[Word("x", 9.0, 10.5)], duration_s=10.0)

    def test_sorted(self):
        tl = LyricsTimeline(words=[Word("b", 2, 3), Word("a", 0, 1)])
        assert [w.text for w in tl.words] == ["a", "b"]


class TestProviders:
    def test_null_strict_raises(self):
        with pytest.raises(LyricsAlignmentUnavailable):
            NullLyricsProvider(strict=True).align(None)

    def test_null_lenient_empty(self):
        assert NullLyricsProvider(strict=False).align(None).words == []

    def test_fake_provider(self):
        p = FakeLyricsProvider(fixture_path=str(FIXTURE))
        assert p.available()
        tl = p.align(None)
        assert len(tl.words) == 8
        assert tl.source == "fake"


class TestProtocol:
    def test_normalize_ms_and_aliases(self):
        payload = {
            "tokens": [{"word": "hey", "start_ms": 500, "end_ms": 900, "confidence": 0.8}],
            "segments": [{"sentence": "hey", "start": 0.5, "end": 0.9}],
            "vad": [{"start_s": 0.4, "end_s": 1.0, "kind": "singing"}],
        }
        tl = normalize_response(payload, global_t0_s=10.0)
        assert abs(tl.words[0].start_s - 10.5) < 1e-9
        assert tl.words[0].text == "hey"
        assert abs(tl.vad_regions[0].end_s - 11.0) < 1e-9


class TestChunker:
    def test_short_track_single_chunk(self):
        chunks = plan_asr_chunks(20.0)
        assert len(chunks) == 1 and chunks[0].duration_s == 20.0

    def test_long_track_overlap_and_cap(self):
        chunks = plan_asr_chunks(120.0, chunk_s=35.0, overlap_s=1.0, max_chunk_s=55.0)
        assert all(c.duration_s <= 55.0 for c in chunks)
        assert chunks[-1].end_s == 120.0
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_s < a.end_s  # overlapping
        assert len(chunk_join_times(chunks)) == len(chunks) - 1


class TestTimelineMerge:
    def test_word_dedup_in_overlap(self):
        from audio_cut_tpu.lyrics.chunker import AsrChunk

        c0 = AsrChunk(0, 0.0, 35.0)
        c1 = AsrChunk(1, 34.0, 69.0)
        t0 = LyricsTimeline(words=[Word("dup", 34.2, 34.8, 0.7)])  # chunk-local
        t1 = LyricsTimeline(words=[Word("dup", 0.2, 0.8, 0.9), Word("next", 2.0, 2.5)])
        merged = merge_chunk_timelines([(c0, t0), (c1, t1)], duration_s=69.0)
        dups = [w for w in merged.words if w.text == "dup"]
        assert len(dups) == 1
        assert dups[0].confidence == 0.9  # higher-confidence copy wins
        assert merged.forbidden_cut_times_s  # join recorded


class TestCandidates:
    def test_generation(self):
        tl = LyricsTimeline.from_dict(json.loads(FIXTURE.read_text()))
        cands = LyricsBoundaryCandidateGenerator().generate(tl)
        sources = {c.source.value for c in cands}
        assert {"lyrics_gap", "sentence_end", "mvad_boundary"} <= sources
        # the 1.9 -> 3.4 gap (1.5s) must produce a full-score gap candidate
        gap = [c for c in cands if c.source.value == "lyrics_gap" and abs(c.t - 2.65) < 0.01]
        assert gap and gap[0].score == 1.0
        # punctuation sentence end gets the bonus
        sent = [c for c in cands if c.source.value == "sentence_end"]
        assert any("punctuation_end" in c.reasons for c in sent)


class TestAttach:
    def test_attach_and_cjk_join(self):
        assert join_words(["你", "好", "world"]) == "你好 world"
        tl = LyricsTimeline.from_dict(json.loads(FIXTURE.read_text()))
        segments = [{"start": 0.0, "end": 2.5}, {"start": 2.5, "end": 8.0}]
        out = attach_lyrics_to_segments(segments, tl)
        assert out[0]["lyrics"]["text"] == "hello world"
        assert "singing along tonight" in out[1]["lyrics"]["text"]


class TestCache:
    def test_roundtrip(self, tmp_path):
        key = compute_cache_key("abc", separator="spectral", provider="fake",
                                chunking={"chunk_s": 35})
        cache = TimelineCache(str(tmp_path))
        assert cache.get(key) is None
        tl = LyricsTimeline(words=[Word("hi", 0.0, 0.5)])
        cache.put(key, tl)
        back = cache.get(key)
        assert back is not None and back.words[0].text == "hi"
        # key changes with config
        key2 = compute_cache_key("abc", separator="spectral", provider="fake",
                                 chunking={"chunk_s": 40})
        assert key2 != key
