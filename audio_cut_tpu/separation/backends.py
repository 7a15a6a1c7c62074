"""Separation backends: the compute kernels behind the chunked engine.

Seam parity: reference src/audio_cut/separation/backends.py:69-87
(IVocalSeparatorBackend.{load_model,sample_rate,infer_chunk,flush}) — here a
backend exposes ``separate(audio_padded) -> (vocal, instrumental)`` as a pure
jittable function over a fixed-length window, plus metadata. The engine owns
chunking/OLA; backends own per-window spectral math.

Backends:

* SpectralMaskBackend — model-free HPSS-style separator: median-filtered
  harmonic/percussive soft masks + a vocal-band emphasis, fully in JAX
  (replaces the reference's librosa legacy DSP separator,
  vocal_separator.py:48, and serves as the always-available fallback the way
  Demucs was for MDX23).
* ConvTDFBackend — Flax MDX-style Conv-TDF mask net (flagship neural path),
  in models/convtdf.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audio_cut_tpu.config import get_config
from audio_cut_tpu.ops.stft import istft, stft


@functools.lru_cache(maxsize=None)
def _batcher_pairs(n: int) -> Tuple[Tuple[int, int], ...]:
    """Compare-exchange pairs of Batcher's odd-even mergesort for n lanes."""
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(min(k, n - j - k)):
                    if (i + j) // (p * 2) == (i + j + k) // (p * 2):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return tuple(pairs)


def _median_of(parts: list) -> jnp.ndarray:
    """Exact elementwise median of a list of same-shape arrays via a
    min/max sorting network — pure VPU elementwise ops instead of XLA's
    generic sort (measured ~40% of the spectral window cost)."""
    vals = list(parts)
    for a, b in _batcher_pairs(len(vals)):
        lo = jnp.minimum(vals[a], vals[b])
        hi = jnp.maximum(vals[a], vals[b])
        vals[a], vals[b] = lo, hi
    return vals[len(vals) // 2]


def _median_filter_axis(x: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    """Median filter along one axis via stacked shifted slices (edge-padded)."""
    half = size // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (half, half)
    xp = jnp.pad(x, pad, mode="edge")
    idx = [slice(None)] * x.ndim
    stack = []
    for k in range(size):
        idx[axis] = slice(k, k + x.shape[axis])
        stack.append(xp[tuple(idx)])
    return _median_of(stack)


class SpectralMaskBackend:
    """Model-free vocal/instrumental split via harmonic-percussive masking."""

    name = "spectral"

    def __init__(self, sample_rate: int, n_fft: int = 2048, hop: int = 512):
        self.sample_rate = int(sample_rate)
        self.n_fft = n_fft
        self.hop = hop
        cfg = get_config("enhanced_separation.spectral", {}) or {}
        self.kernel_t = int(cfg.get("kernel_t", 31))
        self.kernel_f = int(cfg.get("kernel_f", 31))
        power = float(cfg.get("hpss_power", 2.0))
        # integral exponents MUST stay ints: jnp.power with a float constant
        # exponent lowers to exp/log and blows XLA CPU compile time ~12x
        self.power = int(power) if power == int(power) else power
        vs = get_config("vocal_separation", {}) or {}
        self.vocal_freq = (float(vs.get("vocal_freq_min", 100)), float(vs.get("vocal_freq_max", 4000)))
        self.vocal_core = (float(vs.get("vocal_core_min", 200)), float(vs.get("vocal_core_max", 1000)))
        self._separate = self._build()

    def _build(self):
        n_fft, hop = self.n_fft, self.hop
        kt, kf, p = self.kernel_t, self.kernel_f, self.power
        sr = self.sample_rate
        lo, hi = self.vocal_freq
        core_lo, core_hi = self.vocal_core

        freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr)
        band = np.clip(
            np.minimum((freqs - lo) / max(core_lo - lo, 1.0), (hi - freqs) / max(hi - core_hi, 1.0)),
            0.0,
            1.0,
        ).astype(np.float32)

        @functools.partial(jax.jit, static_argnames=("length",))
        def run(audio: jnp.ndarray, length: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
            spec = stft(audio, n_fft=n_fft, hop=hop)           # [T, F]
            mag = jnp.abs(spec)
            harm = _median_filter_axis(mag, kt, axis=-2)        # smooth across time
            perc = _median_filter_axis(mag, kf, axis=-1)        # smooth across freq
            hp = jnp.power(harm, p)
            pp = jnp.power(perc, p)
            total = hp + pp + 1e-10
            h_mask = hp / total
            # vocals: harmonically sustained energy inside the vocal band that
            # is NOT flat across frequency (percussive) — band-weighted Wiener
            v_mask = h_mask * jnp.asarray(band)[None, :]
            vocal_spec = spec * v_mask
            vocal = istft(vocal_spec, n_fft=n_fft, hop=hop, length=length)
            instrumental = audio[:length] - vocal
            return vocal, instrumental

        return run

    def separate(self, audio: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        length = int(audio.shape[-1])
        v, i = self._separate(jnp.asarray(audio, dtype=jnp.float32), length)
        return np.asarray(v), np.asarray(i)

    def separate_window(self, window: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Pure jittable per-window path used by the chunked engine."""
        return self._separate(window, int(window.shape[-1]))

    def separate_windows_fn(self, windows: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Pure batched path for the on-device OLA engine: [N, S] -> 2x[N, S].

        Sub-batches of 4 windows bound the median-filter stack memory
        (31 x spectrogram per window) while keeping the MXU/VPU busy.
        """
        length = int(windows.shape[-1])
        n = windows.shape[0]
        group = 4
        pad_n = (-n) % group
        wp = jnp.pad(windows, ((0, pad_n), (0, 0)))

        def body(batch):
            return self._separate(batch, length)

        batches = wp.reshape(-1, group, length)
        v, i = jax.lax.map(body, batches)
        v = v.reshape(-1, length)[:n]
        i = i.reshape(-1, length)[:n]
        return v, i


# backend instances (and their jitted programs) survive across engine/API
# calls — a fresh instance per call would recompile identical programs
# (zero-recompile gate in tests/performance). Keyed by name + sample rate +
# the config values the backend reads, so runtime-config changes rebuild.
_BACKEND_CACHE: Dict[Tuple, object] = {}


def _config_key(name: str) -> Tuple:
    if name == "spectral":
        cfg = get_config("enhanced_separation.spectral", {}) or {}
        vs = get_config("vocal_separation", {}) or {}
        return tuple(sorted((k, str(v)) for k, v in {**cfg, **vs}.items()))
    if name == "convtdf":
        cfg = get_config("enhanced_separation.convtdf", {}) or {}
        return tuple(sorted((k, str(v)) for k, v in cfg.items()))
    if name == "waveunet":
        cfg = get_config("enhanced_separation.waveunet", {}) or {}
        return tuple(sorted((k, str(v)) for k, v in cfg.items()))
    if name == "onnx":
        cfg = get_config("enhanced_separation.onnx", {}) or {}
        import os

        env = (os.environ.get("AUDIO_CUT_ONNX_MODEL"), os.environ.get("MDX23_MODEL_FILENAME"))
        return tuple(sorted((k, str(v)) for k, v in cfg.items())) + env
    return ()


def make_backend(name: str, sample_rate: int):
    key = (name, int(sample_rate), _config_key(name))
    cached = _BACKEND_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "spectral":
        backend = SpectralMaskBackend(sample_rate)
    elif name == "convtdf":
        from audio_cut_tpu.models.convtdf import ConvTDFBackend

        backend = ConvTDFBackend(sample_rate)
    elif name == "waveunet":
        from audio_cut_tpu.models.waveunet import WaveUNetBackend

        backend = WaveUNetBackend(sample_rate)
    elif name == "onnx":
        from audio_cut_tpu.separation.onnx_backend import OnnxSeparatorBackend

        backend = OnnxSeparatorBackend(sample_rate)
    else:
        raise ValueError(f"unknown separation backend {name!r}")
    _BACKEND_CACHE[key] = backend
    return backend
