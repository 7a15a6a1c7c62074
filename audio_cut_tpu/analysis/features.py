"""TrackFeatures: the single shared per-track feature store.

Parity: reference src/audio_cut/analysis/features_cache.py:40-91 —
TrackFeatureCache with a hop_s=0.05 global frame grid holding RMS, spectral
flatness, onset envelope, BPM features, beat times and the MDD series, plus
frame_index/frame_slice/window_stats helpers. Consumers: detection, MDD
enhancement, AutoProfile, beat candidates, layout rescue.

TPU design: all framewise math runs as ONE fused jitted program over the
whole (bucket-padded) track — there is no per-chunk Python loop on the hot
path. The store itself holds host numpy views because every consumer is
host-side planning logic over small arrays.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audio_cut_tpu.ops import frames as F
from audio_cut_tpu.ops import beats as B

DEFAULT_HOP_S = 0.05
_FEATURE_NFFT = 2048
_RMS_FRAME = 2048

# audio lengths are padded up to a multiple of this many seconds so jit
# recompiles stay bounded (log-bucketing would be fine too). 15 s matches
# the separation engine's SHORT-track bucket (PAD_BUCKET_S); past
# LONG_TRACK_S the engine widens to 60 s buckets + align, so paths that
# must match the engine's compiled lengths bit-for-bit (the detection
# bundle over engine/mesh handles) pad with engine.padded_track_len
# instead — this helper serves the host-side feature fallback only.
_BUCKET_S = 15.0


def pad_to_bucket(x: np.ndarray, sr: int, bucket_s: float = _BUCKET_S) -> np.ndarray:
    bucket = int(round(bucket_s * sr))
    n = x.shape[-1]
    target = ((n + bucket - 1) // bucket) * bucket if n else bucket
    if target == n:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, target - n)]
    return np.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("hop", "fps"))
def _compute_features(audio: jnp.ndarray, hop: int, fps: float) -> Dict[str, jnp.ndarray]:
    from audio_cut_tpu.ops.pallas.frame_stats import spectral_stats
    from audio_cut_tpu.ops.stft import stft

    rms = F.frame_rms(audio, _RMS_FRAME, hop)
    # one STFT feeds both spectral stats (fused Pallas kernel on TPU opt-in)
    mag = jnp.abs(stft(audio, n_fft=_FEATURE_NFFT, hop=hop))
    flat, onset = spectral_stats(mag)
    mdd = F.mdd_series(rms, flat, onset)
    tempo = B.estimate_tempo(onset, fps=fps)
    return {
        "rms": rms,
        "flatness": flat,
        "onset": onset,
        "mdd": mdd,
        "bpm": tempo.bpm,
        "period_frames": tempo.period_frames,
        "phase_frames": tempo.phase_frames,
        "tempo_strength": tempo.strength,
    }


@dataclass
class TrackFeatures:
    sr: int
    hop_s: float
    duration_s: float
    rms: np.ndarray
    flatness: np.ndarray
    onset: np.ndarray
    mdd: np.ndarray
    bpm: float
    tempo_strength: float
    beat_times: np.ndarray
    extras: Dict[str, np.ndarray] = field(default_factory=dict)

    # -- grid helpers (parity: features_cache.py:62-91) -------------------

    @property
    def n_frames(self) -> int:
        return int(self.rms.shape[-1])

    @property
    def fps(self) -> float:
        return 1.0 / self.hop_s

    def frame_index(self, t: float) -> int:
        return int(np.clip(round(t / self.hop_s), 0, self.n_frames - 1))

    def frame_slice(self, start_s: float, end_s: float) -> slice:
        lo = self.frame_index(start_s)
        hi = int(np.clip(round(end_s / self.hop_s), lo + 1, self.n_frames))
        return slice(lo, hi)

    def window_stats(self, feature: str, start_s: float, end_s: float) -> Dict[str, float]:
        arr = getattr(self, feature) if hasattr(self, feature) else self.extras[feature]
        seg = arr[self.frame_slice(start_s, end_s)]
        if seg.size == 0:
            return {"mean": 0.0, "min": 0.0, "max": 0.0}
        return {"mean": float(seg.mean()), "min": float(seg.min()), "max": float(seg.max())}

    def times(self) -> np.ndarray:
        return np.arange(self.n_frames) * self.hop_s

    def bpm_category(self) -> str:
        return B.classify_bpm(self.bpm)


def build_track_features(
    audio: np.ndarray,
    sr: int,
    hop_s: float = DEFAULT_HOP_S,
    beat_source: Optional[np.ndarray] = None,
) -> TrackFeatures:
    """Compute the full feature store in one device program.

    ``audio`` is 1-D float32 at ``sr``. Padding to the 30 s bucket bounds the
    number of distinct compiled shapes; padded tail frames are trimmed off.
    """
    audio = np.asarray(audio, dtype=np.float32)
    n_true = audio.shape[-1]
    duration_s = n_true / float(sr)
    hop = max(1, int(round(hop_s * sr)))
    fps = sr / float(hop)

    padded = pad_to_bucket(audio, sr)
    out = _compute_features(jnp.asarray(padded), hop, fps)
    out = jax.device_get(out)

    n_frames = n_true // hop + 1
    rms = out["rms"][:n_frames]
    flat = out["flatness"][:n_frames]
    onset = out["onset"][:n_frames]
    mdd = out["mdd"][:n_frames]

    if beat_source is not None:
        beat_times = np.asarray(beat_source, dtype=np.float64)
        bpm = 60.0 / float(np.median(np.diff(beat_times))) if beat_times.size > 1 else 0.0
        strength = 1.0
    else:
        tempo = B.TempoResult(
            bpm=out["bpm"], period_frames=out["period_frames"],
            phase_frames=out["phase_frames"], strength=out["tempo_strength"],
        )
        beat_times = B.beat_times_from_tempo(tempo, fps=fps, duration_s=duration_s)
        bpm = float(out["bpm"])
        strength = float(out["tempo_strength"])

    return TrackFeatures(
        sr=sr,
        hop_s=hop_s,
        duration_s=duration_s,
        rms=rms,
        flatness=flat,
        onset=onset,
        mdd=mdd,
        bpm=bpm,
        tempo_strength=strength,
        beat_times=beat_times,
    )
