from audio_cut_tpu.ops.stft import frame_signal, istft, stft
from audio_cut_tpu.ops.frames import (
    frame_rms,
    moving_rms_db,
    onset_envelope,
    spectral_flatness,
)

__all__ = [
    "stft",
    "istft",
    "frame_signal",
    "frame_rms",
    "spectral_flatness",
    "onset_envelope",
    "moving_rms_db",
]
