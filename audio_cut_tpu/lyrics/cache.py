"""Deterministic lyrics timeline cache.

Parity: reference src/audio_cut/lyrics/cache.py:14-48 — cache key =
sha256(audio bytes) + separator + provider + chunking + scorer/planner config,
so identical input + config reuses the cached timeline (the reproducibility
contract: same input + intent + config + models -> same output).
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Any, Dict, Mapping, Optional

from audio_cut_tpu.lyrics.models import LyricsTimeline


def compute_cache_key(
    audio_sha256: str,
    *,
    separator: str,
    provider: str,
    chunking: Mapping[str, Any],
    scoring: Optional[Mapping[str, Any]] = None,
) -> str:
    payload = json.dumps(
        {
            "audio": audio_sha256,
            "separator": separator,
            "provider": provider,
            "chunking": dict(chunking),
            "scoring": dict(scoring or {}),
        },
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()


def hash_file(path: str) -> str:
    digest = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            digest.update(chunk)
    return digest.hexdigest()


class TimelineCache:
    def __init__(self, cache_dir: str) -> None:
        self.dir = Path(cache_dir)
        self.dir.mkdir(parents=True, exist_ok=True)

    def _path(self, key: str) -> Path:
        return self.dir / f"{key}.json"

    def get(self, key: str) -> Optional[LyricsTimeline]:
        p = self._path(key)
        if not p.exists():
            return None
        try:
            return LyricsTimeline.from_dict(json.loads(p.read_text(encoding="utf-8")), strict=False)
        except (json.JSONDecodeError, OSError):
            return None

    def put(self, key: str, timeline: LyricsTimeline) -> None:
        self._path(key).write_text(
            json.dumps(timeline.to_dict(), ensure_ascii=False), encoding="utf-8"
        )
