"""in_process lyrics provider slot + auto fallback chain contract.

Reference parity: src/audio_cut/lyrics/providers.py:123-195 — the auto chain
probes sidecar -> cli -> in_process -> null, a "null" entry terminates the
chain, and provider_order accepts all four names.
"""

import sys
import textwrap

import pytest

from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
from audio_cut_tpu.lyrics.in_process import InProcessLyricsProvider
from audio_cut_tpu.lyrics.providers import (
    AlignRequest,
    NullLyricsProvider,
    build_lyrics_provider,
)


@pytest.fixture(autouse=True)
def _clean_config():
    reset_runtime_config()
    yield
    reset_runtime_config()


@pytest.fixture
def entrypoint_module(tmp_path):
    mod = tmp_path / "fake_inproc_asr.py"
    mod.write_text(textwrap.dedent(
        """
        def analyze(payload):
            assert "audio_path" in payload
            return {
                "words": [
                    {"text": "la", "start_s": 0.5, "end_s": 0.9, "confidence": 0.8},
                    {"text": "da", "start_s": 1.2, "end_s": 1.6, "confidence": 0.7},
                ],
                "sentences": [
                    {"text": "la da", "start_s": 0.5, "end_s": 1.6, "confidence": 0.75},
                ],
            }

        not_callable = 42
        """
    ))
    sys.path.insert(0, str(tmp_path))
    yield "fake_inproc_asr:analyze"
    sys.path.remove(str(tmp_path))
    sys.modules.pop("fake_inproc_asr", None)


class TestInProcessProvider:
    def test_unconfigured_is_unavailable(self):
        p = InProcessLyricsProvider(entrypoint=None)
        assert not p.available()

    def test_bad_entrypoint_is_unavailable(self):
        assert not InProcessLyricsProvider(entrypoint="no_such_module:fn").available()
        assert not InProcessLyricsProvider(entrypoint="json").available()  # no colon

    def test_non_callable_is_unavailable(self, entrypoint_module):
        p = InProcessLyricsProvider(entrypoint="fake_inproc_asr:not_callable")
        assert not p.available()

    def test_align(self, entrypoint_module, tmp_path):
        p = InProcessLyricsProvider(entrypoint=entrypoint_module)
        assert p.available()
        tl = p.align(AlignRequest(audio_path=str(tmp_path / "x.wav")))
        assert [w.text for w in tl.words] == ["la", "da"]
        assert len(tl.sentences) == 1
        assert tl.source == "in_process"


class TestAutoChain:
    def test_all_four_names_build(self):
        from audio_cut_tpu.lyrics.cli_provider import CliLyricsProvider
        from audio_cut_tpu.lyrics.sidecar import SidecarLyricsProvider

        assert isinstance(build_lyrics_provider("sidecar"), SidecarLyricsProvider)
        assert isinstance(build_lyrics_provider("cli"), CliLyricsProvider)
        assert isinstance(build_lyrics_provider("in_process"), InProcessLyricsProvider)
        assert isinstance(build_lyrics_provider("null"), NullLyricsProvider)

    def test_auto_selects_in_process_when_configured(self, entrypoint_module):
        set_runtime_config({
            "fire_red.provider_order": ["sidecar", "cli", "in_process", "null"],
            "fire_red.in_process.entrypoint": entrypoint_module,
        })
        p = build_lyrics_provider("auto")
        assert isinstance(p, InProcessLyricsProvider)

    def test_null_terminates_chain(self, entrypoint_module):
        # in_process is configured but sits BEHIND the null terminator:
        # reference parity says the chain stops at null
        set_runtime_config({
            "fire_red.provider_order": ["null", "in_process"],
            "fire_red.in_process.entrypoint": entrypoint_module,
        })
        p = build_lyrics_provider("auto")
        assert isinstance(p, NullLyricsProvider)

    def test_default_order_unconfigured_falls_to_null(self):
        p = build_lyrics_provider("auto")
        assert isinstance(p, NullLyricsProvider)
