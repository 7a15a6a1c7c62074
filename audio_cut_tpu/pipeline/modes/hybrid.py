"""hybrid_mdd mode — wired in a later milestone."""

from __future__ import annotations


def process_hybrid_mdd(splitter, input_path, output_dir, *, export_plan=None):
    raise NotImplementedError("hybrid_mdd lands with the beat-strategy milestone")
