"""Chunked separation engine: schedule, per-window device compute, OLA.

Replaces the reference's CUDA-stream chunk pipeline (reference
src/audio_cut/utils/gpu_pipeline.py:333-375 chunk_schedule 10/2.5/0.5 s with
align_hop=4096, and enhanced_vocal_separator.py:300-458 overlap-add loop).

TPU design: every chunk is the SAME static shape, so one jitted window
program serves all chunks; JAX async dispatch overlaps host slicing/accumulate
with device compute (replacing pinned buffers + stream events). Halo samples
are trimmed on device; cross-fade OLA weights normalise the overlap region.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from audio_cut_tpu.config import get_config

logger = logging.getLogger(__name__)

# compiled device-OLA programs, keyed by backend/geometry — survives engine
# instances so repeat API calls never recompile
_OLA_PROGRAM_CACHE: Dict[Any, Any] = {}
# entries hold jitted programs and (for piece layouts) device-resident OLA
# weight arrays; tokens are per-backend-instance, so an unbounded dict grows
# HBM forever in long-lived processes that build many backends. LRU-bounded:
# production serving touches a handful of keys; 64 is far above any steady
# state while capping churn-heavy test/notebook sessions.
_OLA_CACHE_MAX = 64


def _ola_cache_get(key):
    if key in _OLA_PROGRAM_CACHE:
        val = _OLA_PROGRAM_CACHE.pop(key)
        _OLA_PROGRAM_CACHE[key] = val  # re-insert: dict order == LRU order
        return True, val
    return False, None


def _ola_cache_put(key, val):
    _OLA_PROGRAM_CACHE.pop(key, None)
    _OLA_PROGRAM_CACHE[key] = val
    while len(_OLA_PROGRAM_CACHE) > _OLA_CACHE_MAX:
        _OLA_PROGRAM_CACHE.pop(next(iter(_OLA_PROGRAM_CACHE)))

_CACHE_TOKENS = iter(range(1, 1 << 62))


def backend_cache_token(backend) -> int:
    """Monotonic per-instance cache key. `id(backend)` is unsafe here: an
    ad-hoc backend (tests, ConvTDFBackend.separate) can be GC'd and a NEW
    instance with different weights allocated at the recycled address would
    silently hit the old instance's compiled program."""
    tok = backend.__dict__.get("_cache_token")
    if tok is None:
        tok = next(_CACHE_TOKENS)
        backend.__dict__["_cache_token"] = tok
    return tok


# track-length padding bucket for the whole-track OLA program: bounds the
# number of distinct compiled lengths. 15 s halves the padding waste of the
# original 30 s bucket (a 60 s track computed 90 s of windows = +50% device
# time) at twice the worst-case compile count.
PAD_BUCKET_S = 15.0

# beyond this track length, buckets widen to device_pipeline.
# long_bucket_seconds (default 60 s): XLA's static shapes make distinct
# compiled lengths the scarce resource for production song lengths — 15 s
# granularity over 1-6 min would mean 19 OLA/bundle program families, each
# a cold compile (and, over the axon relay, an ~80 s persistent-cache load;
# docs/profile_neural_r4.json). 60 s buckets cut that to 5 and let ONE
# `audio-cut warmup` length cover a whole song-length band. The padding
# waste is bounded by <long_bucket of extra windows (≤+30% device compute at
# 185 s -> 240 s) — at 200x+ realtime that costs milliseconds of latency,
# while an uncovered bucket costs a cold compile measured in minutes.
LONG_TRACK_S = 75.0


def padded_track_len(n: int, sr: int, align: int = 1) -> int:
    """Single source of truth for the bucket-padded whole-track length.

    Every whole-track device program — the engine OLA, the fused
    separation+detection program, and the sp/batch mesh paths — must agree
    on this value bit-for-bit, or their outputs diverge (different OLA
    plans). 15 s buckets up to LONG_TRACK_S, then long_bucket_seconds
    buckets, then align-rounding for the backend's window schedule.
    """
    bucket = int(round(PAD_BUCKET_S * sr))
    padded = max(bucket, ((n + bucket - 1) // bucket) * bucket)
    if padded > int(round(LONG_TRACK_S * sr)):
        long_bucket = int(round(
            float(get_config("device_pipeline.long_bucket_seconds", 60.0)) * sr))
        if long_bucket > 0:
            padded = ((n + long_bucket - 1) // long_bucket) * long_bucket
    if align > 1:
        padded = ((padded + align - 1) // align) * align
    return padded


@dataclass(frozen=True)
class ChunkPlan:
    """One window of the schedule. Parity: gpu_pipeline.py ChunkPlan :54."""

    index: int
    start: int            # window start sample (includes left halo)
    end: int              # window end sample (includes right halo)
    effective_start: int  # samples owned by this chunk after halo trim
    effective_end: int


def quantize_upload(padded: np.ndarray):
    """(raw, scale) for the int16 host->device upload.

    Quantizes at the signal's ACTUAL peak (guarded against near-silence) so
    the ~90 dB quantization SNR holds for quiet tracks too — normalizing only
    when peak > 1 left a -40 dBFS input with ~50 dB SNR (ADVICE r2).
    """
    peak = max(float(np.abs(padded).max()), 1e-4)
    raw = np.round(padded * (32767.0 / peak)).astype(np.int16)
    return raw, np.float32(peak / 32767.0)


def ola_plan(
    padded_len: int,
    sr: int,
    chunk_s: float,
    overlap_s: float,
    halo_s: float,
    align: int,
):
    """Shared whole-track OLA plan: (plans, window, weights, inv_wsum).

    ``weights`` is the per-window [n, window] cross-fade/halo mask and
    ``inv_wsum`` the [padded_len] normalization curve. Single source of truth
    for the device-OLA program, the fused single program, and the sp-sharded
    serving path — they must agree bit-for-bit.
    """
    plans, window = chunk_schedule(padded_len, sr, chunk_s, overlap_s, halo_s, align)
    halo = int(round(halo_s * sr))
    ramp = max(1, int(round((overlap_s - 2 * halo_s) * sr)))
    weights = np.ones((len(plans), window), dtype=np.float32)
    for k, p in enumerate(plans):
        w = weights[k]
        w[:ramp] = np.linspace(0.0, 1.0, ramp, endpoint=False) + 1e-6
        w[-ramp:] = np.linspace(1.0, 0.0, ramp, endpoint=False) + 1e-6
        # halo samples contribute nothing (recomputed by the neighbour);
        # halo == 0 means the backend wants pure cross-fade (w[-0:] would
        # wrongly zero the WHOLE window — guard it)
        if halo > 0:
            if p.start > 0:
                w[:halo] = 0.0
            if p.start + window < padded_len:
                w[-halo:] = 0.0
    wsum = np.full(padded_len, 1e-9, dtype=np.float32)
    for k, p in enumerate(plans):
        wsum[p.start:p.start + window] += weights[k]
    # coverage invariant: every sample must receive weight from some window
    # (track edges only see a ramp tail ~1e-6 — still far above the 1e-9
    # floor). A violation means overlap < 2*halo: silent zeros in the output.
    if float(wsum.min()) < 1e-7:
        raise ValueError(
            f"OLA plan leaves uncovered samples (min weight {wsum.min():.2e}); "
            f"geometry overlap={overlap_s}s halo={halo_s}s window={window}"
        )
    inv_wsum = (1.0 / wsum).astype(np.float32)
    return plans, window, weights, inv_wsum


def chunk_schedule(
    total_samples: int,
    sr: int,
    chunk_s: float = 10.0,
    overlap_s: float = 2.5,
    halo_s: float = 0.5,
    align: int = 4096,
) -> Tuple[List[ChunkPlan], int]:
    """Fixed-length window schedule. Returns (plans, window_len).

    Window length, overlap AND every chunk start are multiples of `align`
    (which itself is a multiple of every backend STFT hop). This keeps the
    STFT frame phase identical between a chunk and the full track, so the
    chunk-vs-full equivalence gate holds to float precision — the reference
    had the same constraint (backends.py:268-281 pads to align_hop=4096).
    Every window has the SAME length; the final window is right-aligned to
    the align-padded track end so one compiled program serves all chunks.
    """
    window = int(round(chunk_s * sr))
    window = ((window + align - 1) // align) * align
    overlap = max(align, (int(round(overlap_s * sr)) // align) * align)
    halo = int(round(halo_s * sr))
    stride = max(window - overlap, align)
    total_padded = ((total_samples + align - 1) // align) * align

    if total_samples <= window:
        return [ChunkPlan(0, 0, window, 0, total_samples)], window

    plans: List[ChunkPlan] = []
    start = 0
    idx = 0
    prev_eff_end = 0
    while True:
        last = start + window >= total_padded
        if last:
            start = total_padded - window  # aligned: both are align multiples
        end = min(start + window, total_samples)
        eff_start = prev_eff_end
        eff_end = total_samples if last else min(end - halo, total_samples)
        plans.append(ChunkPlan(idx, start, end, eff_start, eff_end))
        prev_eff_end = eff_end
        if last:
            break
        start += stride
        idx += 1
    return plans, window


class SeparationResult:
    """Parity: reference enhanced_vocal_separator.py:45-58.

    TPU addition: host stem copies are LAZY. The stems live in HBM
    (`vocal_device` / `instrumental_device`); `.vocal_track` /
    `.instrumental_track` download on first access and cache. Over the
    tunnel a full-track download costs more than the whole device compute,
    and the default detection path runs entirely from device-resident
    envelopes — consumers that never touch the host stems never pay.
    """

    def __init__(
        self,
        vocal_track: Optional[np.ndarray],
        instrumental_track: Optional[np.ndarray],
        backend_used: str,
        separation_confidence: Optional[float],
        feature_cache: Optional[Any] = None,
        vad_segments: Optional[List[Tuple[float, float]]] = None,
        device_meta: Optional[Dict[str, Any]] = None,
    ) -> None:
        self._vocal_host = vocal_track
        self._inst_host = instrumental_track
        self.backend_used = backend_used
        self._confidence = separation_confidence
        self._mix_energy: Optional[float] = None
        self.feature_cache = feature_cache
        self.vad_segments = vad_segments
        self.device_meta = device_meta or {}
        self.vocal_device: Optional[Any] = None
        self.instrumental_device: Optional[Any] = None
        self.mix_device: Optional[Any] = None

    @property
    def separation_confidence(self) -> float:
        """Lazy when the stems stayed on device: the detection bundle
        usually refreshes this from its own fused scalar; reading it before
        that costs one device scalar reduction, not a stem download."""
        if self._confidence is None:
            if self._mix_energy is not None and self._vocal_host is not None:
                # host stem already materialized: no tunnel round-trip
                e_voc = float(np.mean(np.square(self._vocal_host, dtype=np.float64)))
            elif self.vocal_device is not None and self._mix_energy is not None:
                import jax.numpy as jnp

                e_voc = float(jnp.mean(jnp.square(self.vocal_device)))
            else:
                self._confidence = 0.0
                return self._confidence
            ratio = e_voc / (self._mix_energy + 1e-12)
            self._confidence = float(np.clip(1.0 - abs(ratio - 0.35) / 0.65, 0.1, 0.99))
        return self._confidence

    @separation_confidence.setter
    def separation_confidence(self, value: Optional[float]) -> None:
        self._confidence = value

    @property
    def vocal_track(self) -> Optional[np.ndarray]:
        if self._vocal_host is None and self.vocal_device is not None:
            self._vocal_host = np.asarray(self.vocal_device)
        return self._vocal_host

    @vocal_track.setter
    def vocal_track(self, value: Optional[np.ndarray]) -> None:
        self._vocal_host = value

    @property
    def instrumental_track(self) -> Optional[np.ndarray]:
        if self._inst_host is None and self.instrumental_device is not None:
            self._inst_host = np.asarray(self.instrumental_device)
        return self._inst_host

    @instrumental_track.setter
    def instrumental_track(self, value: Optional[np.ndarray]) -> None:
        self._inst_host = value

    @property
    def has_vocal(self) -> bool:
        """True when a vocal stem exists (host or device) WITHOUT downloading."""
        return self._vocal_host is not None or self.vocal_device is not None

    def complement_instrumental(self, mix: np.ndarray) -> Optional[np.ndarray]:
        """Materialize the instrumental as ``mix - vocal`` ON THE HOST.

        Every backend window forward returns complementary stems
        (inst = window - vocal: models/convtdf.py:291, models/waveunet.py:210,
        onnx_backend.py:180, backends.py spectral run()), and the OLA weights
        are a partition of unity, so the device instrumental equals
        (reconstructed mix - vocal) up to float association. Computing it from
        the ORIGINAL host mix instead of downloading it skips the second
        full-track transfer (over the tunnel the download costs more than the
        whole separation compute) and is strictly higher fidelity: the device
        stem subtracts the int16-quantized upload mix (~-90 dB), the host
        complement subtracts the exact one. No-op when a host instrumental
        already exists (CPU/chunked fallback paths)."""
        if self._inst_host is None:
            v = self.vocal_track  # may download the vocal (one transfer)
            if v is not None:
                n = v.shape[-1]
                self._inst_host = (
                    np.asarray(mix[..., :n], dtype=np.float32) - v
                )
        return self._inst_host


class SeparationEngine:
    """Orchestrates backend windows over the chunk schedule."""

    def __init__(self, sample_rate: int, backend: Optional[Any] = None) -> None:
        self.sample_rate = int(sample_rate)
        self.enable_fallback = bool(get_config("enhanced_separation.enable_fallback", True))
        self._cfg_geometry = (
            float(get_config("device_pipeline.chunk_seconds", 10.0)),
            float(get_config("device_pipeline.overlap_seconds", 2.5)),
            float(get_config("device_pipeline.halo_seconds", 0.5)),
            int(get_config("device_pipeline.align_hop", 4096)),
        )
        self.chunk_s, self.overlap_s, self.halo_s, self.align = self._cfg_geometry
        if backend is not None and not isinstance(backend, str):
            # a pre-built backend instance (e.g. a backend's own whole-track
            # separate() reusing the engine OLA machinery)
            self._backend = backend
            self._backend_name = getattr(backend, "name", type(backend).__name__)
        else:
            self._backend = None
            self._backend_name = backend or str(
                get_config("enhanced_separation.backend", "spectral")
            )
        self._geometry_from: Optional[Any] = None

    def _fallback_chain(self) -> List[str]:
        """Backends to try after the current one fails. Reference semantics:
        MDX23 -> Demucs -> CPU (backends.py:90,409, _resolve_fallback_backend)
        maps here to primary -> enhanced_separation.fallback_backend ->
        spectral (the always-available model-free tier)."""
        fb = str(get_config("enhanced_separation.fallback_backend", "spectral"))
        out: List[str] = []
        for name in (fb, "spectral"):
            if name and name != self._backend_name and name not in out:
                out.append(name)
        return out

    @property
    def backend(self):
        if self._backend is None:
            from audio_cut_tpu.separation.backends import make_backend

            try:
                self._backend = make_backend(self._backend_name, self.sample_rate)
            except Exception as exc:
                if not self.enable_fallback or self._backend_name == "spectral":
                    raise
                for name in self._fallback_chain():
                    logger.warning(
                        "backend %r failed to load (%s); falling back to %r",
                        self._backend_name, exc, name,
                    )
                    try:
                        self._backend = make_backend(name, self.sample_rate)
                        self._backend_name = name
                        break
                    except Exception as exc2:
                        exc = exc2
                else:
                    raise
        return self._backend

    def _ensure_geometry(self) -> None:
        """Adopt the backend's native chunk geometry when it declares one.

        Neural mask nets have a fixed model window ((dim_t-1)*hop samples);
        scheduling engine windows AT that size turns the whole-track OLA into
        one batched model forward with only edge-overlap waste (~6%), instead
        of re-tiling generic 10 s windows into model tiles (~2.4x waste).
        The spectral backend keeps the config-driven 10/2.5/0.5 s schedule.
        """
        bk = self.backend  # may itself fall back to spectral
        if self._geometry_from is bk:
            return
        geom_fn = getattr(bk, "engine_geometry", None)
        if geom_fn is not None:
            g = geom_fn()
            self.chunk_s = float(g["chunk_s"])
            self.overlap_s = float(g["overlap_s"])
            self.halo_s = float(g["halo_s"])
            self.align = int(g["align"])
        else:
            # backend switched at runtime (e.g. neural -> spectral fallback):
            # restore the config-driven schedule
            self.chunk_s, self.overlap_s, self.halo_s, self.align = self._cfg_geometry
        self._geometry_from = bk

    # -- full-track path (small tracks / equivalence reference) -----------

    def separate_full(self, audio: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        return self.backend.separate(np.asarray(audio, dtype=np.float32))

    # -- chunked path ------------------------------------------------------

    def separate_chunked(self, audio: np.ndarray) -> Tuple[np.ndarray, np.ndarray, Dict[str, Any]]:
        import jax.numpy as jnp

        self._ensure_geometry()
        audio = np.asarray(audio, dtype=np.float32)
        n = audio.shape[-1]
        plans, window = chunk_schedule(
            n, self.sample_rate, self.chunk_s, self.overlap_s, self.halo_s, self.align
        )
        halo = int(round(self.halo_s * self.sample_rate))

        vocal = np.zeros(n, dtype=np.float64)
        inst = np.zeros(n, dtype=np.float64)
        weight = np.zeros(n, dtype=np.float64)

        # cross-fade ramp across the overlap-beyond-halo region
        ramp_len = max(1, int(round((self.overlap_s - 2 * self.halo_s) * self.sample_rate)))
        base_w = np.ones(window, dtype=np.float64)
        base_w[:ramp_len] = np.linspace(0.0, 1.0, ramp_len, endpoint=False) + 1e-6
        base_w[-ramp_len:] = np.linspace(1.0, 0.0, ramp_len, endpoint=False) + 1e-6

        t0 = time.time()
        pending = []  # (plan, device vocal, device inst) — drain with 1 in flight
        padded = audio if n >= window else np.pad(audio, (0, window - n))
        platform = "unknown"

        for plan in plans:
            seg = padded[plan.start:plan.start + window]
            if seg.shape[-1] < window:
                seg = np.pad(seg, (0, window - seg.shape[-1]))
            v_dev, i_dev = self.backend.separate_window(jnp.asarray(seg))
            if plan.index == 0:
                platform = _platform_of(v_dev)
            pending.append((plan, v_dev, i_dev))
            if len(pending) > 1:
                self._accumulate(pending.pop(0), window, n, base_w, halo, vocal, inst, weight)
        while pending:
            self._accumulate(pending.pop(0), window, n, base_w, halo, vocal, inst, weight)

        w = np.maximum(weight, 1e-9)
        # total_ms is fenced by construction: _accumulate downloads every
        # window result, so the clock includes all device compute. Per-window
        # compute timing is deliberately NOT reported — an unfenced clock
        # around async dispatch measures enqueue only.
        meta = {
            "gpu_pipeline_backend": self._backend_name,
            "gpu_pipeline_chunks": len(plans),
            "gpu_pipeline_window_samples": window,
            "gpu_pipeline_total_ms": round((time.time() - t0) * 1000.0, 3),
            "gpu_pipeline_device": platform,
        }
        return (vocal / w).astype(np.float32), (inst / w).astype(np.float32), meta

    @staticmethod
    def _accumulate(item, window, n, base_w, halo, vocal, inst, weight):
        plan, v_dev, i_dev = item
        v = np.asarray(v_dev, dtype=np.float64)
        i = np.asarray(i_dev, dtype=np.float64)
        w = base_w.copy()
        # halo samples contribute nothing (recomputed by neighbours);
        # halo == 0: pure cross-fade, and w[-0:] would zero the whole window
        if halo > 0:
            if plan.start > 0:
                w[:halo] = 0.0
            if plan.end < n:
                w[-halo:] = 0.0
        lo, hi = plan.start, min(plan.start + window, n)
        span = hi - lo
        vocal[lo:hi] += v[:span] * w[:span]
        inst[lo:hi] += i[:span] * w[:span]
        weight[lo:hi] += w[:span]

    # -- pipelined piece path (upload overlaps compute) ---------------------

    def _piece_layout(self, padded_len: int):
        """Host-side layout for the pipelined upload path (cached).

        The monolithic OLA program serialises the whole int16 upload before
        any compute starts; over the tunnel that upload costs as much as the
        entire model forward (~145 ms vs ~148 ms for 60 s, measured r3). This
        splits the schedule into PIECES of `device_pipeline.piece_windows`
        consecutive windows; each piece is its own upload + forward dispatch,
        so the transfer engine streams piece k+1 while the MXU computes piece
        k (the role CUDA pinned-buffer prefetch played in the reference,
        gpu_pipeline.py:378-421). A combine program then assembles the OLA
        exactly as the monolithic graph would.

        Returns None when pipelining is off / not applicable.
        """
        import jax

        if not bool(get_config("device_pipeline.pipelined_upload", True)):
            return None
        if not hasattr(self.backend, "separate_windows_fn"):
            return None
        self._ensure_geometry()
        per = max(1, int(get_config("device_pipeline.piece_windows", 2)))
        max_pieces = max(2, int(get_config("device_pipeline.max_pieces", 8)))
        key = ("piece_layout", self._backend_name, backend_cache_token(self.backend), self.sample_rate,
               padded_len, self.chunk_s, self.overlap_s, self.halo_s, self.align, per,
               max_pieces)
        hit, val = _ola_cache_get(key)
        if hit:
            return val
        plans, window, weights, inv_wsum = ola_plan(
            padded_len, self.sample_rate, self.chunk_s, self.overlap_s, self.halo_s, self.align
        )
        if len(plans) <= 2:
            _ola_cache_put(key, None)
            return None
        # each piece is a dispatch + its own transfer: cap the piece count so
        # backends with small native windows don't shatter the schedule into
        # dozens of tiny uploads whose per-dispatch latency eats the overlap
        per = max(per, -(-len(plans) // max_pieces))
        starts = [p.start for p in plans]
        groups = [starts[k:k + per] for k in range(0, len(starts), per)]
        spans = [(g[0], g[-1] + window) for g in groups]
        span_len = max(e - s for s, e in spans)
        kmax = max(len(g) for g in groups)
        wts_dev, offs_dev = [], []
        base = 0
        for gi, g in enumerate(groups):
            wt = np.zeros((kmax, window), np.float32)
            of = np.zeros((kmax,), np.int32)
            for j, s in enumerate(g):
                wt[j] = weights[base + j]
                of[j] = s - spans[gi][0]
            base += len(g)
            wts_dev.append(jax.device_put(wt))
            offs_dev.append(jax.device_put(of))
        layout = {
            "per": per,
            "window": window,
            "n_chunks": len(plans),
            "groups": groups,
            "spans": spans,
            "span_len": span_len,
            "kmax": kmax,
            "wts_dev": wts_dev,
            "offs_dev": offs_dev,
            "inv_wsum": inv_wsum,
            "padded_len": padded_len,
        }
        _ola_cache_put(key, layout)
        return layout

    def _piece_forward_fn(self, layout):
        """ONE jitted program serving every piece: dequantize the piece span,
        slice its windows at traced offsets, batched backend forward, apply
        the piece's OLA weight rows."""
        import jax
        import jax.numpy as jnp

        key = ("piece_fwd", self._backend_name, backend_cache_token(self.backend),
               layout["window"], layout["kmax"], layout["span_len"])
        hit, val = _ola_cache_get(key)
        if hit:
            return val
        backend = self.backend
        window = layout["window"]
        kmax = layout["kmax"]

        def piece(raw_piece, scale, wts, offs):
            x = raw_piece.astype(jnp.float32) * scale
            wins = jnp.stack([
                jax.lax.dynamic_slice_in_dim(x, offs[j], window) for j in range(kmax)
            ])
            v, i = backend.separate_windows_fn(wins)
            return v * wts, i * wts

        fn = jax.jit(piece)
        _ola_cache_put(key, fn)
        return fn

    def _combine_graph(self, layout):
        """Traceable combine: weighted piece windows -> normalized stems, and
        the dequantized mix reassembled from the piece uploads (bit-identical
        to the monolithic program's mix). Composed with the detection bundle
        by the fused path."""
        import jax
        import jax.numpy as jnp

        groups = layout["groups"]
        spans = layout["spans"]
        window = layout["window"]
        padded_len = layout["padded_len"]
        inv_wsum = layout["inv_wsum"]

        def combine(vs, iss, raws, scale):
            vocal = jnp.zeros(padded_len, jnp.float32)
            inst = jnp.zeros(padded_len, jnp.float32)
            for gi, g in enumerate(groups):
                for j, s in enumerate(g):
                    vocal = jax.lax.dynamic_update_slice_in_dim(
                        vocal, jax.lax.dynamic_slice_in_dim(vocal, s, window) + vs[gi][j],
                        s, axis=0)
                    inst = jax.lax.dynamic_update_slice_in_dim(
                        inst, jax.lax.dynamic_slice_in_dim(inst, s, window) + iss[gi][j],
                        s, axis=0)
            norm = jnp.asarray(inv_wsum)
            mix = jnp.zeros(padded_len, jnp.float32)
            for gi, (s, _e) in enumerate(spans):
                owned_end = spans[gi + 1][0] if gi + 1 < len(spans) else padded_len
                owned = (owned_end - s)
                piece_f32 = raws[gi][:owned].astype(jnp.float32) * scale
                mix = jax.lax.dynamic_update_slice_in_dim(mix, piece_f32, s, axis=0)
            return vocal * norm, inst * norm, mix

        return combine

    def _dispatch_pieces(self, raw: np.ndarray, scale, layout):
        """Upload + forward every piece with async dispatch: the host loop
        returns futures; transfer of piece k+1 overlaps compute of piece k."""
        import jax.numpy as jnp

        piece_fn = self._piece_forward_fn(layout)
        span_len = layout["span_len"]
        vs, iss, raw_devs = [], [], []
        for gi, (s, e) in enumerate(layout["spans"]):
            rp = raw[s:e]
            if e - s < span_len:
                rp = np.pad(rp, (0, span_len - (e - s)))
            d = jnp.asarray(np.ascontiguousarray(rp))
            v, i = piece_fn(d, scale, layout["wts_dev"][gi], layout["offs_dev"][gi])
            vs.append(v)
            iss.append(i)
            raw_devs.append(d)
        return vs, iss, raw_devs

    def _piece_combine_fn(self, layout):
        import jax

        # MUST carry the full OLA geometry: the combine graph closes over
        # groups/spans/inv_wsum derived from it — a runtime geometry change
        # with a shape-only key silently reused a stale combine (measured
        # 0.62 L_inf corruption; review r3)
        key = ("piece_combine", self._backend_name, backend_cache_token(self.backend),
               layout["padded_len"], layout["window"], layout["per"],
               self.chunk_s, self.overlap_s, self.halo_s, self.align)
        hit, val = _ola_cache_get(key)
        if hit:
            return val
        fn = jax.jit(self._combine_graph(layout))
        _ola_cache_put(key, fn)
        return fn

    # -- on-device OLA path (single upload, single download) ----------------

    def _ola_graph(self, padded_len: int):
        """Traceable whole-track separation GRAPH (not jitted): used both by
        the standalone OLA program below and — composed with the detection
        bundle — by the fully-fused single-program path."""
        import jax
        import jax.numpy as jnp

        self._ensure_geometry()
        plans, window, weights, inv_wsum = ola_plan(
            padded_len, self.sample_rate, self.chunk_s, self.overlap_s, self.halo_s, self.align
        )
        starts = [p.start for p in plans]
        n = len(plans)

        backend = self.backend

        def run(audio_raw: "jnp.ndarray", scale: "jnp.ndarray"):
            # int16 uploads halve the dominant host->device transfer; the
            # dequantize (x * scale) fuses into the first window slice
            audio_padded = audio_raw.astype(jnp.float32) * scale
            windows = jnp.stack([
                jax.lax.dynamic_slice_in_dim(audio_padded, s, window) for s in starts
            ])
            v, i = backend.separate_windows_fn(windows)
            wv = v * jnp.asarray(weights)
            wi = i * jnp.asarray(weights)
            vocal = jnp.zeros(padded_len, jnp.float32)
            inst = jnp.zeros(padded_len, jnp.float32)
            for k, s in enumerate(starts):
                vocal = jax.lax.dynamic_update_slice_in_dim(
                    vocal, jax.lax.dynamic_slice_in_dim(vocal, s, window) + wv[k], s, axis=0)
                inst = jax.lax.dynamic_update_slice_in_dim(
                    inst, jax.lax.dynamic_slice_in_dim(inst, s, window) + wi[k], s, axis=0)
            norm = jnp.asarray(inv_wsum)
            # the dequantized f32 mix stays in HBM for the detection bundle
            return vocal * norm, inst * norm, audio_padded

        return run, n

    def _device_ola_fn(self, padded_len: int):
        """Build (and cache) the jitted whole-track separation program.

        One device program: slice static windows -> batched backend ->
        weighted halo-trimmed OLA, all in HBM. Replaces the per-chunk host
        loop (and its 2 transfers per chunk) with 1 upload + 2 downloads.
        """
        import jax

        self._ensure_geometry()
        # module-level cache: compiled programs must outlive the engine
        # instance (the API builds a fresh splitter/engine per call)
        key = (self._backend_name, backend_cache_token(self.backend), self.sample_rate, padded_len,
               self.chunk_s, self.overlap_s, self.halo_s, self.align)
        hit, val = _ola_cache_get(key)
        if hit:
            return val

        run, n = self._ola_graph(padded_len)
        fn = jax.jit(run)
        _ola_cache_put(key, (fn, n))
        return fn, n

    def separate_on_device(self, audio: np.ndarray):
        """Returns (vocal_dev, inst_dev, mix_dev, meta); stems are DEVICE
        arrays of len(audio), mix_dev is the bucket-padded upload handle."""
        import jax.numpy as jnp

        audio = np.asarray(audio, dtype=np.float32)
        n = audio.shape[-1]
        self._ensure_geometry()
        padded_len = padded_track_len(n, self.sample_rate, self.align)

        import jax

        t0 = time.time()
        padded = np.pad(audio, (0, padded_len - n)) if padded_len != n else audio
        if bool(get_config("device_pipeline.upload_int16", True)):
            # -90 dB quantization vs half the upload bytes over the tunnel;
            # splice reconstruction is untouched (host slicing of the input)
            raw, scale = quantize_upload(padded)
        else:
            raw = padded
            scale = np.float32(1.0)
        layout = self._piece_layout(padded_len)
        if layout is not None:
            vs, iss, raw_devs = self._dispatch_pieces(raw, scale, layout)
            vocal, inst, mix_dev = self._piece_combine_fn(layout)(vs, iss, raw_devs, scale)
            n_chunks = layout["n_chunks"]
            mode = f"device_ola_pipelined_p{len(layout['spans'])}"
        else:
            fn, n_chunks = self._device_ola_fn(padded_len)
            vocal, inst, mix_dev = fn(jnp.asarray(raw), scale)
            mode = "device_ola"
        # fence before timing: async dispatch returns immediately, so an
        # unfenced clock measures host enqueue, not device compute (the
        # reference fenced with torch.cuda.synchronize, backends.py:183-214).
        # Fencing here also surfaces runtime failures inside the engine's
        # fallback chain instead of leaking them into downstream consumers.
        jax.block_until_ready((vocal, inst))
        meta = {
            "gpu_pipeline_backend": self._backend_name,
            "gpu_pipeline_chunks": n_chunks,
            "gpu_pipeline_window_samples": padded_len,
            "gpu_pipeline_compute_ms": round((time.time() - t0) * 1000.0, 3),
            "gpu_pipeline_total_ms": round((time.time() - t0) * 1000.0, 3),
            "gpu_pipeline_device": _platform_of(vocal),
            "gpu_pipeline_mode": mode,
        }
        return vocal[:n], inst[:n], mix_dev, meta

    # -- public API (parity: separate_for_detection) -----------------------

    def _separate_once(self, audio: np.ndarray, need_instrumental: bool = True):
        if hasattr(self.backend, "separate_windows_fn"):
            import jax.numpy as jnp

            vocal_dev, inst_dev, mix_dev, meta = self.separate_on_device(audio)
            if need_instrumental:
                # both stems will be exported — download them now as ONE
                # stacked transfer: the tunnel charges a fixed round-trip per
                # download, so 2 separate pulls cost an extra ~35 ms
                both = np.asarray(jnp.stack([vocal_dev, inst_dev]))
                vocal, inst = both[0], both[1]
            else:
                # no host copy at all: detection runs from device-resident
                # envelopes; SeparationResult downloads lazily if a consumer
                # (vocal export, ASR copy, fallback kernels) ever needs the
                # waveform. A full-track pull over the tunnel costs more than
                # the entire separation compute.
                vocal = None
                inst = None
        else:
            vocal, inst, meta = self.separate_chunked(audio)
            vocal_dev = inst_dev = mix_dev = None
        return vocal, inst, vocal_dev, inst_dev, mix_dev, meta

    def separate_for_detection(
        self, audio: np.ndarray, need_instrumental: bool = True
    ) -> SeparationResult:
        audio = np.asarray(audio, dtype=np.float32)
        try:
            vocal, inst, vocal_dev, inst_dev, mix_dev, meta = self._separate_once(
                audio, need_instrumental
            )
        except Exception as exc:
            if not self.enable_fallback:
                raise
            if self._backend_name != "spectral":
                # runtime failure of the primary backend: advance down the
                # fallback chain (reference MDX23 -> Demucs -> CPU semantics,
                # enhanced_vocal_separator.py:177-188); the chain always ends
                # at the model-free spectral tier, so this recursion is finite
                nxt = self._fallback_chain()[0]
                logger.error(
                    "backend %r failed at runtime (%s); retrying with %r",
                    self._backend_name, exc, nxt,
                )
                self._backend = None
                self._backend_name = nxt
                return self.separate_for_detection(audio, need_instrumental)
            # the spectral backend itself failed — a device-runtime error
            # (e.g. wedged tunnel mid-transfer) gets one backoff retry and a
            # CPU re-run before we give up (reference ORT session-rebuild
            # chain, backends.py:234-244, 366-371)
            from audio_cut_tpu.utils.resilience import (
                is_device_runtime_error,
                run_with_device_fallback,
            )

            if not is_device_runtime_error(exc):
                logger.error("separation failed (%s)", exc)
                return SeparationResult(None, None, backend_used="none", separation_confidence=0.0)
            try:
                vocal, inst, vocal_dev, inst_dev, mix_dev, meta = run_with_device_fallback(
                    lambda: self._separate_once(audio, need_instrumental), label="separation"
                )
            except Exception as exc2:
                logger.error("separation failed after retries (%s)", exc2)
                return SeparationResult(None, None, backend_used="none", separation_confidence=0.0)

        if vocal is not None:
            confidence = _estimate_confidence(audio, vocal)
        else:
            # host stem not materialized: defer — the detection bundle
            # refreshes confidence from its own fused scalar, and a direct
            # read falls back to one device scalar reduction
            confidence = None
        result = SeparationResult(
            vocal_track=vocal,
            instrumental_track=inst,
            backend_used=self._backend_name,
            separation_confidence=confidence,
            device_meta=meta,
        )
        if confidence is None:
            result._mix_energy = float(np.mean(np.square(audio)))
        result.vocal_device = vocal_dev  # device handles for downstream fusion
        result.instrumental_device = inst_dev
        result.mix_device = mix_dev
        return result


def _platform_of(arr) -> str:
    """Platform the array actually lives on (CPU fallback must not claim tpu)."""
    try:
        return next(iter(arr.devices())).platform
    except Exception:
        return "unknown"


def _estimate_confidence(mix: np.ndarray, vocal: np.ndarray) -> float:
    """Energy-partition heuristic (parity: enhanced_vocal_separator.py:490)."""
    e_mix = float(np.mean(np.square(mix))) + 1e-12
    e_voc = float(np.mean(np.square(vocal)))
    ratio = e_voc / e_mix
    # confident when the vocal estimate is a meaningful, sub-unity share
    return float(np.clip(1.0 - abs(ratio - 0.35) / 0.65, 0.1, 0.99))


