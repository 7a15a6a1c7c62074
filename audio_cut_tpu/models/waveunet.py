"""WaveUNet: waveform-domain separator — the second neural tier.

Role parity: the reference's Demucs v4 PyTorch fallback behind the MDX23
ONNX default (reference src/audio_cut/separation/backends.py:409-497) — a
DIFFERENT architecture family from the spectrogram mask net, so the fallback
tier fails differently from the primary. This is a ground-up Flax
implementation of the Demucs-class waveform U-Net idea, NOT a weight port.

TPU-first design choices:

* pure 1-D conv encoder/decoder (stride 4 per level) — all compute lands on
  the MXU as batched convolutions; no LSTM (sequential state serializes on
  TPU) — the bottleneck context comes from dilated convs instead;
* GLU gating after each encoder/decoder conv (the Demucs recipe) as an
  elementwise VPU op that XLA fuses into the conv epilogue;
* bfloat16 activations, float32 params/outputs;
* static native window (2^18 samples ≈ 5.94 s at 44.1 kHz) divisible by the
  total stride 4^depth, declared to the engine via engine_geometry() so the
  whole track runs as ONE batched forward through the device-OLA program.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audio_cut_tpu.config import get_config

NATIVE_WINDOW = 1 << 18  # 262144 samples = 5.94 s @ 44.1 kHz; 4^4 divides it


def _glu(x: jnp.ndarray) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=-1)
    return a * nn.sigmoid(b)


class WaveUNetNet(nn.Module):
    """[B, T, 1] waveform -> [B, T, 1] vocal estimate."""

    channels: int = 24
    depth: int = 4
    stride: int = 4
    kernel: int = 8
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x.astype(self.dtype)
        skips = []
        ch = self.channels
        for _ in range(self.depth):
            y = nn.Conv(ch, (self.kernel,), strides=(self.stride,),
                        padding="SAME", dtype=self.dtype)(y)
            y = nn.gelu(y)
            y = _glu(nn.Conv(ch * 2, (1,), dtype=self.dtype)(y))
            skips.append(y)
            ch *= 2
        # dilated-conv context bottleneck (Demucs used BiLSTM; dilations give
        # a ~quarter-second receptive field without sequential state)
        for dil in (1, 2, 4):
            r = nn.Conv(ch // 2, (3,), kernel_dilation=(dil,), padding="SAME",
                        dtype=self.dtype)(y)
            r = nn.gelu(r)
            r = nn.Conv(ch // 2, (1,), dtype=self.dtype)(r)
            y = y + r
        for _ in range(self.depth):
            ch //= 2
            skip = skips.pop()
            y = y[:, :skip.shape[1], :] + skip
            y = _glu(nn.Conv(ch * 2, (1,), dtype=self.dtype)(y))
            y = nn.ConvTranspose(max(ch // 2, self.channels) if skips else 1,
                                 (self.kernel,), strides=(self.stride,),
                                 padding="SAME", dtype=self.dtype)(y)
            if skips:
                y = nn.gelu(y)
        return y.astype(jnp.float32)


class WaveUNetSeparator:
    """Functional wrapper: waveform window batch -> (vocal, instrumental)."""

    def __init__(self, sample_rate: int, window_samples: int = NATIVE_WINDOW,
                 channels: int = 24, depth: int = 4):
        self.sr = int(sample_rate)
        self.window_samples = int(window_samples)
        assert self.window_samples % (4 ** depth) == 0, "stride must divide window"
        self.net = WaveUNetNet(channels=channels, depth=depth)

    def init_params(self, rng: jax.Array) -> Any:
        dummy = jnp.zeros((1, self.window_samples, 1), jnp.float32)
        return self.net.init(rng, dummy)["params"]

    def separate_fn(self, params: Any, audio: jnp.ndarray, length: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[B, S] -> (vocal [B, length], inst [B, length]).

        Demucs-style per-sample std normalization: the net sees unit-scale
        input and the estimate is rescaled back.
        """
        std = jnp.std(audio, axis=-1, keepdims=True) + 1e-6
        y = self.net.apply({"params": params}, (audio / std)[..., None])[..., 0]
        vocal = (y * std)[..., :length]
        return vocal, audio[..., :length] - vocal


PACKAGED_CHECKPOINT = "waveunet_bootstrap_v1.msgpack"


def packaged_checkpoint_path() -> Optional[str]:
    import os

    path = os.path.join(os.path.dirname(__file__), "weights", PACKAGED_CHECKPOINT)
    return path if os.path.exists(path) else None


class WaveUNetBackend:
    """Engine-facing backend (same seam as ConvTDFBackend)."""

    name = "waveunet"

    def __init__(self, sample_rate: int):
        from audio_cut_tpu.models.convtdf import load_checkpoint

        cfg = get_config("enhanced_separation.waveunet", {}) or {}
        self.sample_rate = int(sample_rate)
        geometry = {
            "window_samples": int(cfg.get("window_samples", NATIVE_WINDOW)),
            "channels": int(cfg.get("channels", 24)),
            "depth": int(cfg.get("depth", 4)),
        }
        ckpt = cfg.get("checkpoint")
        if ckpt == "packaged":
            ckpt = packaged_checkpoint_path()
            if ckpt is None:
                raise RuntimeError(
                    "enhanced_separation.waveunet.checkpoint=packaged but no "
                    "packaged checkpoint ships in this build "
                    f"(models/weights/{PACKAGED_CHECKPOINT})"
                )
        if ckpt:
            # the geometry sidecar (<ckpt>.json) is authoritative for ANY
            # msgpack checkpoint that ships one — candidates included, same
            # rule as ConvTDFBackend
            meta = _packaged_geometry(str(ckpt))
            for key in ("channels", "depth"):
                if key in meta:
                    geometry[key] = int(meta[key])
        self.sep = WaveUNetSeparator(sample_rate, **geometry)
        if ckpt:
            self.params = load_checkpoint(
                str(ckpt), template=lambda: self.sep.init_params(jax.random.PRNGKey(0)))
        else:
            if bool(get_config("enhanced_separation.enable_fallback", True)):
                raise RuntimeError(
                    "waveunet backend selected but enhanced_separation.waveunet."
                    "checkpoint is unset — no trained weights; engine falls back"
                )
            import logging

            logging.getLogger(__name__).warning(
                "waveunet backend running with RANDOM weights (no checkpoint)")
            self.params = self.sep.init_params(jax.random.PRNGKey(0))
        self.map_group = max(1, int(cfg.get("map_group", 4)))
        self._tiled = jax.jit(self._tiled_separate, static_argnames=("length",))

    def engine_geometry(self) -> Dict[str, float]:
        """Native schedule: engine windows == model windows; halo covers the
        encoder/decoder receptive-field edge; align 4096 (no STFT phase
        constraint in the waveform domain — alignment only bounds compiled
        shapes)."""
        sr = float(self.sample_rate)
        target = self.sep.window_samples
        # overlap first, then halo = overlap/4 — keeps overlap > 2*halo with
        # a positive cross-fade ramp for ANY window size (coverage invariant
        # asserted by engine.ola_plan)
        overlap = max(4096, min(16384, (target // 4) // 4096 * 4096))
        halo = overlap // 4
        return {
            "chunk_s": target / sr,
            "overlap_s": overlap / sr,
            "halo_s": halo / sr,
            "align": 4096,
        }

    def _forward_batch(self, params, windows: jnp.ndarray):
        from audio_cut_tpu.separation.tiling import mapped_forward

        length = int(windows.shape[-1])
        return mapped_forward(
            lambda batch: self.sep.separate_fn(params, batch, length),
            windows, self.map_group,
        )

    def separate_windows_fn(self, windows: jnp.ndarray):
        length = int(windows.shape[-1])
        if length == self.sep.window_samples:
            return self._forward_batch(self.params, windows)

        from audio_cut_tpu.separation.tiling import tiled_forward_batch

        def forward(tiles: jnp.ndarray) -> jnp.ndarray:
            v, _ = self._forward_batch(self.params, tiles)
            return v

        vocal = tiled_forward_batch(forward, self.sep.window_samples, windows, length)
        return vocal, windows[:, :length] - vocal

    def _tiled_separate(self, params, x: jnp.ndarray, length: int):
        from audio_cut_tpu.separation.tiling import tiled_separate

        target = self.sep.window_samples

        def forward(windows: jnp.ndarray) -> jnp.ndarray:
            v, _ = self.sep.separate_fn(params, windows, target)
            return v

        return tiled_separate(forward, target, x, length)

    def separate_window(self, window: jnp.ndarray):
        return self._tiled(self.params, window, int(window.shape[-1]))

    def separate(self, audio: np.ndarray):
        from audio_cut_tpu.separation.engine import SeparationEngine

        eng = SeparationEngine(self.sample_rate, backend=self)
        eng.enable_fallback = False
        v_dev, i_dev, _m, _meta = eng.separate_on_device(np.asarray(audio, np.float32))
        both = np.asarray(jnp.stack([v_dev, i_dev]))
        return both[0], both[1]


def _packaged_geometry(ckpt_path: str) -> Dict[str, Any]:
    import json
    import os

    sidecar = str(ckpt_path) + ".json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return json.load(f)
    return {}
