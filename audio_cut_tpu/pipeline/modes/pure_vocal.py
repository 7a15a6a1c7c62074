"""v2.2_mdd / vpbd_* modes — wired in a later milestone."""

from __future__ import annotations


def process_pure_vocal_split(splitter, input_path, output_dir, *, mode, export_plan=None):
    raise NotImplementedError(f"mode {mode!r} lands with the detection milestone")
