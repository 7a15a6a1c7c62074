"""vocal_separation mode: stems only, no cuts.

Parity: reference seamless_splitter.py:958-1037 (_process_vocal_separation_only)
— export naming `{stem}_vocal_{dur:.1f}` / `{stem}_instrumental_{dur:.1f}`,
result dict fields incl. precision_guard_threshold_ms.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

from audio_cut_tpu.pipeline.result import (
    PRECISION_GUARD_AVG_MS,
    PRECISION_GUARD_P95_MS,
)


def process_vocal_separation(
    splitter,
    input_path: str,
    output_dir: str,
    *,
    export_plan: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    t0 = time.time()
    audio = splitter._load(input_path)
    sep = splitter.separator.separate_for_detection(audio)

    if sep.vocal_track is None:
        return {"success": False, "error": "vocal_separation_failed", "input_file": input_path}

    flags = splitter._normalize_export_plan(
        export_plan, default=("full_vocal", "full_instrumental")
    )
    stem = Path(input_path).stem
    sr = splitter.sample_rate
    saved = []
    full_vocal = full_inst = None

    if "full_vocal" in flags:
        dur = len(sep.vocal_track) / float(sr)
        full_vocal = splitter.segment_exporter.export_full_track(
            sep.vocal_track,
            Path(output_dir) / f"{stem}_vocal_{dur:.1f}",
            export_format=splitter._export_format,
            export_options=splitter._export_options,
        )
        saved.append(full_vocal)

    if "full_instrumental" in flags and sep.instrumental_track is not None:
        dur = len(sep.instrumental_track) / float(sr)
        full_inst = splitter.segment_exporter.export_full_track(
            sep.instrumental_track,
            Path(output_dir) / f"{stem}_instrumental_{dur:.1f}",
            export_format=splitter._export_format,
            export_options=splitter._export_options,
        )
        saved.append(full_inst)

    result: Dict[str, Any] = {
        "success": True,
        "method": "vocal_separation_only",
        "num_segments": 0,
        "saved_files": saved,
        "mix_segment_files": [],
        "vocal_segment_files": [],
        "full_vocal_file": full_vocal,
        "full_instrumental_file": full_inst,
        "export_plan": sorted(flags),
        "backend_used": sep.backend_used,
        "separation_confidence": sep.separation_confidence,
        "processing_time": time.time() - t0,
        "segment_durations": [],
        "guard_shift_stats": {"count": 0, "avg_ms": 0.0, "max_ms": 0.0, "p95_ms": 0.0},
        "precision_guard_ok": True,
        "precision_guard_threshold_ms": {
            "avg": PRECISION_GUARD_AVG_MS,
            "p95": PRECISION_GUARD_P95_MS,
        },
        "input_file": input_path,
        "output_dir": output_dir,
    }
    result.update(dict(sep.device_meta or {}))
    return result
