"""audio_cut_tpu — TPU-native vocal smart splitter.

A ground-up JAX/XLA/Pallas re-design of the capabilities of BDMstudio/audio-cut
("Vocal Smart Splitter"): vocal/instrumental source separation plus smart,
sample-accurate segmentation at natural vocal pauses, engineered for TPU
hardware (MXU-friendly batched kernels, static shapes, chunked overlap-add
streaming, pjit/shard_map scale-out).

Public surface (parity with reference src/audio_cut/api.py:31):

    from audio_cut_tpu import separate_and_segment
    manifest = separate_and_segment(input_uri="song.wav", export_dir="out",
                                    segments="medium", alignment="balanced")
"""

__version__ = "0.1.0"

from audio_cut_tpu.exceptions import (
    AudioCutError,
    GlobalCutPlanningError,
    LyricsAlignmentUnavailable,
    LyricsProviderError,
    TimelineValidationError,
)


def separate_and_segment(*args, **kwargs):
    """Lazy wrapper around :func:`audio_cut_tpu.api.separate_and_segment`."""
    from audio_cut_tpu.api import separate_and_segment as _impl

    return _impl(*args, **kwargs)


def separate_and_segment_batch(*args, **kwargs):
    """Lazy wrapper around :func:`audio_cut_tpu.api.separate_and_segment_batch`:
    N tracks separated in one dp-sharded mesh pass, then detection/cutting
    per track on host workers — one manifest per track."""
    from audio_cut_tpu.api import separate_and_segment_batch as _impl

    return _impl(*args, **kwargs)


def __getattr__(name):
    # lazy heavyweight exports (importing them pulls in jax)
    if name == "SmartSplitter":
        from audio_cut_tpu.pipeline.splitter import SmartSplitter

        return SmartSplitter
    if name == "SeparationEngine":
        from audio_cut_tpu.separation.engine import SeparationEngine

        return SeparationEngine
    raise AttributeError(name)


__all__ = [
    "__version__",
    "separate_and_segment",
    "separate_and_segment_batch",
    "SmartSplitter",
    "SeparationEngine",
    "AudioCutError",
    "LyricsAlignmentUnavailable",
    "LyricsProviderError",
    "TimelineValidationError",
    "GlobalCutPlanningError",
]
