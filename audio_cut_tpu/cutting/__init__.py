from audio_cut_tpu.cutting.refine import (
    CutAdjustment,
    CutContext,
    CutPoint,
    CutRefineResult,
    finalize_cut_points,
    nms_min_gap,
)

__all__ = [
    "CutPoint",
    "CutContext",
    "CutAdjustment",
    "CutRefineResult",
    "finalize_cut_points",
    "nms_min_gap",
]
