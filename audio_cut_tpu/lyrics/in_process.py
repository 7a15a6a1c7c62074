"""In-process ASR provider slot.

Parity: reference src/audio_cut/lyrics/providers.py:123-195 — the `auto`
fallback chain probes an `in_process` slot between the CLI worker and the
null terminator. The reference reserves the slot ("in_process provider is
not configured"); here it is fully wired: configure
``fire_red.in_process.entrypoint`` as ``"package.module:callable"`` and the
callable is invoked with the analyze-request payload dict (the same JSON the
sidecar/CLI workers receive, protocol.build_analyze_request) and must return
a timeline-protocol response dict (protocol.normalize_response shapes it).
Unconfigured == unavailable, matching the reference's probe behavior.
"""

from __future__ import annotations

import importlib
import logging
from typing import Any, Callable, Optional

from audio_cut_tpu.config import get_config
from audio_cut_tpu.exceptions import LyricsProviderError
from audio_cut_tpu.lyrics.models import LyricsTimeline
from audio_cut_tpu.lyrics.protocol import build_analyze_request, normalize_response
from audio_cut_tpu.lyrics.providers import AlignRequest, LyricsProvider

logger = logging.getLogger(__name__)


def _load_entrypoint(spec: str) -> Callable[[dict], dict]:
    module_name, _, attr = str(spec).partition(":")
    if not module_name or not attr:
        raise LyricsProviderError(
            f"in_process entrypoint must be 'module:callable', got {spec!r}"
        )
    module = importlib.import_module(module_name)
    fn = module
    for part in attr.split("."):
        fn = getattr(fn, part)
    if not callable(fn):
        raise LyricsProviderError(f"in_process entrypoint {spec!r} is not callable")
    return fn  # type: ignore[return-value]


class InProcessLyricsProvider(LyricsProvider):
    name = "in_process"

    def __init__(self, entrypoint: Optional[str] = None):
        self.entrypoint = entrypoint or get_config("fire_red.in_process.entrypoint")
        self._fn: Optional[Callable[[dict], dict]] = None

    def available(self) -> bool:
        if not self.entrypoint:
            return False
        if self._fn is not None:
            return True
        try:
            self._fn = _load_entrypoint(str(self.entrypoint))
            return True
        except Exception as exc:
            logger.debug("in_process entrypoint unavailable: %s", exc)
            return False

    def align(self, request: AlignRequest) -> LyricsTimeline:
        if not self.available() or self._fn is None:
            raise LyricsProviderError(
                f"in_process provider not configured/loadable: {self.entrypoint!r}"
            )
        payload = build_analyze_request(
            request.audio_path, request.sample_rate, request.language
        )
        response: Any = self._fn(payload)
        if not isinstance(response, dict):
            raise LyricsProviderError(
                f"in_process entrypoint returned {type(response).__name__}, expected dict"
            )
        timeline = normalize_response(response)
        timeline.source = self.name
        return timeline
