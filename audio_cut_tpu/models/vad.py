"""ConvVAD: a Silero-class learned voice-activity model in Flax.

Seam parity: the reference wraps Silero VAD (ONNX opset-15 / TorchScript,
reference src/vocal_smart_splitter/core/vocal_pause_detector.py:55-296) with
16 kHz resampling, length bucketing and fp32-retry. Silero's weights cannot
be redistributed here, so this provides (a) the same-class architecture —
a strided 1-D conv encoder over 16 kHz audio emitting per-frame speech
probabilities, trainable with training/vad_train.py — and (b) a wrapper with
the reference's operational contract: resample to 16 kHz, pad to the length
bucket, frame timestamps rescaled to the native sample rate.

Config: `vad.backend: energy_gate | conv`, `vad.checkpoint` for weights.
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

VAD_SR = 16000
FRAME = 512            # 32 ms at 16 kHz
LENGTH_BUCKET = 4096   # pad-to-bucket (reference: silero_length_bucket)


class ConvVADNet(nn.Module):
    channels: int = 32
    depth: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, T] 16 kHz waveform -> [B, T//FRAME] speech logits."""
        h = x[..., None]                                  # [B, T, 1]
        ch = self.channels
        stride_total = 1
        for d in range(self.depth):
            stride = 4 if stride_total * 4 <= FRAME else FRAME // stride_total
            h = nn.Conv(ch, (9,), strides=(stride,), padding="SAME")(h)
            h = nn.GroupNorm(num_groups=4)(h)
            h = nn.gelu(h)
            stride_total *= stride
            ch = min(ch * 2, 128)
        # collapse any residual stride mismatch onto the FRAME grid
        target = x.shape[-1] // FRAME
        h = h[:, :target * (h.shape[1] // max(target, 1)), :]
        if target > 0 and h.shape[1] != target:
            h = h[:, : target * (h.shape[1] // target), :]
            h = h.reshape(h.shape[0], target, -1, h.shape[-1]).mean(axis=2)
        logits = nn.Dense(1)(h)[..., 0]
        return logits


class ConvVAD:
    """Operational wrapper: native-SR audio in, speech segments out."""

    def __init__(self, sample_rate: int, checkpoint: Optional[str] = None,
                 threshold: float = 0.5):
        self.native_sr = int(sample_rate)
        self.threshold = float(threshold)
        self.net = ConvVADNet()
        if checkpoint:
            import orbax.checkpoint as ocp

            self.params = ocp.StandardCheckpointer().restore(checkpoint)
        else:
            dummy = jnp.zeros((1, LENGTH_BUCKET), jnp.float32)
            self.params = self.net.init(jax.random.PRNGKey(0), dummy)["params"]
        self._fwd = jax.jit(lambda p, x: jax.nn.sigmoid(self.net.apply({"params": p}, x)))

    def speech_probs(self, audio: np.ndarray) -> Tuple[np.ndarray, float]:
        """(per-frame speech probability, frames-per-second at native scale)."""
        from audio_cut_tpu.io.audio import resample_poly, to_mono

        x16 = resample_poly(to_mono(np.asarray(audio, np.float32)), self.native_sr, VAD_SR)
        pad = (-x16.shape[-1]) % LENGTH_BUCKET
        xp = np.pad(x16, (0, pad))
        probs = np.asarray(self._fwd(self.params, jnp.asarray(xp[None, :]))[0])
        true_frames = x16.shape[-1] // FRAME
        return probs[:true_frames], VAD_SR / FRAME

    def detect(self, audio: np.ndarray, min_speech_s: float = 0.1,
               min_silence_s: float = 0.15) -> List[Tuple[float, float]]:
        """Speech segments in native-SR seconds."""
        probs, fps = self.speech_probs(audio)
        mask = probs > self.threshold
        # close short gaps, drop short bursts
        min_sil = max(1, int(round(min_silence_s * fps)))
        min_sp = max(1, int(round(min_speech_s * fps)))
        inv = ~mask
        edges = np.diff(inv.astype(np.int8), prepend=0, append=0)
        for s, e in zip(np.nonzero(edges == 1)[0], np.nonzero(edges == -1)[0]):
            if e - s <= min_sil:
                mask[s:e] = True
        out: List[Tuple[float, float]] = []
        edges = np.diff(mask.astype(np.int8), prepend=0, append=0)
        for s, e in zip(np.nonzero(edges == 1)[0], np.nonzero(edges == -1)[0]):
            if e - s >= min_sp:
                out.append((s / fps, e / fps))
        return out


def build_vad(sample_rate: int):
    """Factory honoring `vad.backend` config with energy-gate fallback."""
    from audio_cut_tpu.config import get_config
    from audio_cut_tpu.detection.vad import EnergyGateDetector

    backend = str(get_config("vad.backend", "energy_gate"))
    if backend == "conv":
        ckpt = get_config("vad.checkpoint")
        if ckpt:
            try:
                return ConvVAD(sample_rate, checkpoint=str(ckpt))
            except Exception:  # pragma: no cover
                pass
        # a conv VAD without trained weights is worse than the energy gate
    return EnergyGateDetector(sample_rate)
