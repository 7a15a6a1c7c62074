from audio_cut_tpu.detection.vad import EnergyGateDetector, VadResult, to_focus_windows
from audio_cut_tpu.detection.pause_detector import PureVocalPause, PureVocalPauseDetector

__all__ = [
    "EnergyGateDetector",
    "VadResult",
    "to_focus_windows",
    "PureVocalPause",
    "PureVocalPauseDetector",
]
