"""Conv-TDF spectrogram mask network — the flagship separation model.

Role parity: the MDX23 `Conv_TDF_net_trim` ONNX net the reference drives
through onnxruntime (reference src/audio_cut/separation/backends.py:90-388,
n_fft=6144, hop=1024, STFT -> mask -> iSTFT, vocal/instrumental by
subtraction). This is a ground-up Flax implementation of the same model
family — a U-Net over the complex spectrogram whose bottleneck blocks contain
TDF (time-distributed fully-connected) layers mixing the frequency axis —
NOT a weight-compatible port.

TPU-first design choices:

* activations are laid out [B, T, F, C] so frequency (the largest axis) is
  adjacent to channels for MXU-friendly 1x1/dense mixing; all convs are NHWC;
* TDF layers are dense matmuls over F — they land on the MXU directly;
* bfloat16 activations with float32 params/outputs;
* the whole window (dim_t STFT frames) is processed in one static-shape
  program; the chunked OLA engine feeds fixed windows, so one compile serves
  any track length.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audio_cut_tpu.config import get_config
from audio_cut_tpu.ops.stft import hann_window


class TDF(nn.Module):
    """Time-distributed frequency MLP: dense bottleneck across the F axis."""

    bottleneck: int
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, F, C]
        b, t, f, c = x.shape
        y = jnp.swapaxes(x, -1, -2)                      # [B, T, C, F]
        y = nn.Dense(self.bottleneck, dtype=x.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(f, dtype=x.dtype)(y)
        y = jnp.swapaxes(y, -1, -2)
        return y


class ConvBlock(nn.Module):
    channels: int
    tdf_bottleneck: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=x.dtype)(x)
        y = nn.GroupNorm(num_groups=4, dtype=x.dtype)(y)
        y = nn.gelu(y)
        if self.tdf_bottleneck:
            y = y + TDF(self.tdf_bottleneck, self.channels)(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=x.dtype)(y)
        y = nn.GroupNorm(num_groups=4, dtype=x.dtype)(y)
        y = nn.gelu(y)
        return y


class ConvTDFNet(nn.Module):
    """U-Net over [B, T, F, 2] (real/imag) predicting a complex ratio mask."""

    channels: int = 24
    depth: int = 3
    tdf_bottleneck: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, spec_ri: jnp.ndarray) -> jnp.ndarray:
        x = spec_ri.astype(self.dtype)
        skips = []
        ch = self.channels
        x = ConvBlock(ch, self.tdf_bottleneck)(x)
        for _ in range(self.depth):
            skips.append(x)
            x = nn.Conv(ch * 2, (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype)(x)
            ch *= 2
            x = ConvBlock(ch, self.tdf_bottleneck)(x)
        x = ConvBlock(ch, self.tdf_bottleneck)(x)       # bottleneck
        for _ in range(self.depth):
            ch //= 2
            x = nn.ConvTranspose(ch, (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype)(x)
            skip = skips.pop()
            x = x[:, :skip.shape[1], :skip.shape[2], :]
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(ch, self.tdf_bottleneck)(x)
        mask = nn.Conv(2, (3, 3), padding="SAME", dtype=jnp.float32)(x)
        return mask.astype(jnp.float32)                  # [B, T, F, 2]


def apply_complex_mask(spec: jnp.ndarray, mask_ri: jnp.ndarray) -> jnp.ndarray:
    """Complex ratio mask: (mr + i*mi) * spec."""
    mr = mask_ri[..., 0]
    mi = mask_ri[..., 1]
    return (mr + 1j * mi).astype(jnp.complex64) * spec


class ConvTDFSeparator:
    """Functional wrapper: waveform window -> (vocal, instrumental).

    Static geometry: n_fft, hop, dim_f (cropped bins), dim_t (frames/window).
    """

    def __init__(
        self,
        sample_rate: int,
        n_fft: int = 6144,
        hop: int = 1024,
        dim_f: int = 2048,
        dim_t: int = 256,
        channels: int = 24,
        depth: int = 3,
        tdf_bottleneck: int = 64,
    ) -> None:
        self.sr = sample_rate
        self.n_fft = n_fft
        self.hop = hop
        self.dim_f = dim_f
        self.dim_t = dim_t
        self.window_samples = (dim_t - 1) * hop
        self.net = ConvTDFNet(channels=channels, depth=depth, tdf_bottleneck=tdf_bottleneck)

    def init_params(self, rng: jax.Array) -> Any:
        dummy = jnp.zeros((1, self.dim_t, self.dim_f, 2), jnp.float32)
        return self.net.init(rng, dummy)["params"]

    # -- pure fns (jit/pjit these) -----------------------------------------

    def spec_forward(self, params: Any, spec_ri: jnp.ndarray) -> jnp.ndarray:
        """Mask prediction on a [B, T, F, 2] real/imag spectrogram crop."""
        return self.net.apply({"params": params}, spec_ri)

    def analyze(self, audio: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """waveform [B, S] -> (full complex spec [B, T, Fall], cropped RI [B, T, F, 2])."""
        from audio_cut_tpu.ops.stft import stft

        spec = stft(audio, n_fft=self.n_fft, hop=self.hop, center=True)
        spec = spec[..., :self.dim_t, :]                  # [B, T, Fall]
        crop = spec[..., :self.dim_f]
        ri = jnp.stack([crop.real, crop.imag], axis=-1).astype(jnp.float32)
        return spec, ri

    def synthesize(self, spec_full: jnp.ndarray, mask_ri: jnp.ndarray, length: int) -> jnp.ndarray:
        from audio_cut_tpu.ops.stft import istft

        masked = apply_complex_mask(spec_full[..., :self.dim_f], mask_ri)
        rest = jnp.zeros_like(spec_full[..., self.dim_f:])
        full = jnp.concatenate([masked, rest], axis=-1)
        return istft(full, n_fft=self.n_fft, hop=self.hop, length=length)

    def separate_fn(self, params: Any, audio: jnp.ndarray, length: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        spec, ri = self.analyze(audio)
        mask = self.spec_forward(params, ri)
        vocal = self.synthesize(spec, mask, length)
        return vocal, audio[..., :length] - vocal

    def separate_shifted_fn(
        self, params: Any, audio: jnp.ndarray, length: int, shifts: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sub-hop shift averaging on the vocal head (see
        separation.tiling.shift_averaged); instrumental stays the exact
        complement. Opt-in via enhanced_separation.convtdf.shifts."""
        from audio_cut_tpu.separation.tiling import shift_averaged

        if int(shifts) <= 1:
            return self.separate_fn(params, audio, length)
        fwd = shift_averaged(
            lambda x: self.separate_fn(params, x, length)[0], self.hop, shifts)
        vocal = fwd(audio)
        return vocal, audio[..., :length] - vocal


class ConvTDFBackend:
    """Engine-facing backend (same seam as SpectralMaskBackend)."""

    name = "convtdf"

    def __init__(self, sample_rate: int):
        cfg = get_config("enhanced_separation.convtdf", {}) or {}
        self.sample_rate = int(sample_rate)
        ckpt = cfg.get("checkpoint")
        geometry = {
            "n_fft": int(cfg.get("n_fft", 6144)),
            "hop": int(cfg.get("hop", 1024)),
            "dim_f": int(cfg.get("dim_f", 2048)),
            "dim_t": int(cfg.get("dim_t", 256)),
            "channels": int(cfg.get("channels", 24)),
            "depth": int(cfg.get("num_blocks", 9)) // 3,
            "tdf_bottleneck": int(cfg.get("tdf_bottleneck", 64)),
        }
        if ckpt in ("packaged", "packaged_tiny"):
            resolved = (
                packaged_tiny_checkpoint_path()
                if ckpt == "packaged_tiny"
                else packaged_checkpoint_path()
            )
            if resolved is None:
                raise RuntimeError(
                    f"enhanced_separation.convtdf.checkpoint={ckpt} but no "
                    "such checkpoint ships in this build (models/weights/)"
                )
            # the packaged checkpoint pins its own network geometry (sidecar
            # JSON written by scripts/train_separator.py --bootstrap/--tiny);
            # the bootstrap sidecar omits dim_t (window stays config-driven —
            # the net is fully convolutional over T) while the tiny sidecar
            # pins its own serving dim_t for the CPU tier
            ckpt = resolved
        if ckpt:
            # any msgpack checkpoint may carry a geometry sidecar (<ckpt>.json,
            # written by scripts/train_separator.py) pinning the net it was
            # trained with — candidate/promoted checkpoints included, not just
            # the packaged ones; the saved params only deserialize against
            # that geometry, so the sidecar is authoritative where present
            meta = _packaged_geometry(ckpt)
            for key in ("n_fft", "hop", "dim_f", "dim_t", "channels", "depth",
                        "tdf_bottleneck"):
                if key in meta:
                    geometry[key] = int(meta[key])
        self.sep = ConvTDFSeparator(sample_rate, **geometry)
        onnx_path = cfg.get("onnx_path")
        if ckpt:
            self.params = load_checkpoint(ckpt, template=lambda: self.sep.init_params(jax.random.PRNGKey(0)))
        elif onnx_path:
            raise ValueError(
                "enhanced_separation.convtdf.onnx_path points at an ONNX model; "
                "use enhanced_separation.backend=onnx for ONNX-weighted separation"
            )
        else:
            # random params produce garbage masks — selecting this backend
            # without a trained checkpoint must be loud, and with fallback
            # enabled must hand control back to the engine's spectral path
            if bool(get_config("enhanced_separation.enable_fallback", True)):
                raise RuntimeError(
                    "convtdf backend selected but enhanced_separation.convtdf.checkpoint "
                    "is unset — no trained weights; engine falls back to spectral"
                )
            import logging

            logging.getLogger(__name__).warning(
                "convtdf backend running with RANDOM weights (no checkpoint configured); "
                "separation output will be unusable"
            )
            self.params = self.sep.init_params(jax.random.PRNGKey(0))
        # test-time shift averaging (Demucs "shifts" trick): >1 runs each
        # window at N sub-hop offsets in one batched forward and averages.
        # map_group shrinks so activation memory stays bounded at shifts x batch.
        self.shifts = max(1, int(cfg.get("shifts", 1)))
        self.map_group = max(1, int(cfg.get("map_group", 4)) // self.shifts)
        self._tiled = jax.jit(self._tiled_separate, static_argnames=("length",))

    def engine_geometry(self) -> Dict[str, float]:
        """Native chunk schedule for the engine's OLA paths.

        Engine windows ARE model windows ((dim_t-1)*hop samples), so the
        batched windows path is a single batched forward — no inner re-tiling.
        Halo = n_fft/2 (iSTFT edge spread) is recomputed by neighbours; a
        short cross-fade ramp smooths the joins. align = hop keeps every
        window start on the STFT frame grid, so chunk-vs-full equivalence
        holds to float precision (same constraint as the reference's
        align_hop=4096 padding, backends.py:268-281).
        """
        from audio_cut_tpu.separation.tiling import stft_engine_geometry

        return stft_engine_geometry(
            self.sample_rate, self.sep.window_samples, self.sep.n_fft, self.sep.hop
        )

    def _forward_batch(self, params: Any, windows: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[n, window_samples] -> (vocal, inst), sub-batched via lax.map so
        U-Net activation memory stays bounded while the MXU runs full tiles."""
        from audio_cut_tpu.separation.tiling import mapped_forward

        length = int(windows.shape[-1])
        return mapped_forward(
            lambda batch: self.sep.separate_shifted_fn(params, batch, length, self.shifts),
            windows, self.map_group,
        )

    def separate_windows_fn(self, windows: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Batched windows path for the device-OLA / fused / sp-sharded
        engines: [N, W] -> 2x[N, W].

        When the engine scheduled windows at this backend's native geometry
        (the default — see engine_geometry), this is ONE batched model
        forward. A generic window size (e.g. an sp-sharded caller pinned to
        the 10 s schedule) falls back to in-graph 50%-overlap tiling with all
        tiles fused into one batched forward.
        """
        length = int(windows.shape[-1])
        if length == self.sep.window_samples:
            return self._forward_batch(self.params, windows)

        from audio_cut_tpu.separation.tiling import tiled_forward_batch

        def forward(tiles: jnp.ndarray) -> jnp.ndarray:
            v, _ = self._forward_batch(self.params, tiles)
            return v

        vocal = tiled_forward_batch(forward, self.sep.window_samples, windows, length)
        return vocal, windows[:, :length] - vocal

    def _tiled_separate(self, params: Any, x: jnp.ndarray, length: int):
        """Tile a long window into BATCHED model windows (50% overlap,
        triangular cross-fade OLA) — one MXU-friendly batched forward."""
        from audio_cut_tpu.separation.tiling import tiled_separate

        target = self.sep.window_samples

        def forward(windows: jnp.ndarray) -> jnp.ndarray:
            vocal_w, _ = self.sep.separate_shifted_fn(params, windows, target, self.shifts)
            return vocal_w

        return tiled_separate(forward, target, x, length)

    def separate_window(self, window: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self._tiled(self.params, window, int(window.shape[-1]))

    def separate(self, audio: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Whole-track separation via the engine's device-OLA machinery at
        this backend's native geometry (real constructor, not field surgery)."""
        from audio_cut_tpu.separation.engine import SeparationEngine

        eng = SeparationEngine(self.sample_rate, backend=self)
        eng.enable_fallback = False
        v_dev, i_dev, _mix, _meta = eng.separate_on_device(np.asarray(audio, np.float32))
        both = np.asarray(jnp.stack([v_dev, i_dev]))
        return both[0], both[1]


PACKAGED_CHECKPOINT = "convtdf_large_v1.msgpack"
PACKAGED_TINY_CHECKPOINT = "convtdf_tiny_v1.msgpack"


def packaged_checkpoint_path() -> Optional[str]:
    """Path of the packaged bootstrap checkpoint, if this build ships one."""
    import os

    path = os.path.join(os.path.dirname(__file__), "weights", PACKAGED_CHECKPOINT)
    return path if os.path.exists(path) else None


def packaged_tiny_checkpoint_path() -> Optional[str]:
    """Tiny CPU-tier checkpoint (checkpoint='packaged_tiny'), if shipped."""
    import os

    path = os.path.join(os.path.dirname(__file__), "weights", PACKAGED_TINY_CHECKPOINT)
    return path if os.path.exists(path) else None


def _packaged_geometry(ckpt_path: str) -> Dict[str, Any]:
    """Geometry sidecar (<ckpt>.json) written next to a msgpack checkpoint."""
    import json
    import os

    sidecar = str(ckpt_path) + ".json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return json.load(f)
    return {}


def load_checkpoint(path: str, template=None) -> Any:
    """Load params from an orbax directory or a single-file flax .msgpack.

    msgpack needs a params pytree template to restore into; pass a zero-arg
    callable building one (deferred — orbax restores need no template).
    """
    if str(path).endswith(".msgpack"):
        from flax import serialization

        if template is None:
            raise ValueError("msgpack checkpoints need a params template")
        with open(path, "rb") as f:
            return serialization.from_bytes(template(), f.read())
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)
