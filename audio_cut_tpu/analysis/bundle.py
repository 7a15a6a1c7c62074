"""DetectionBundle: every envelope the pipeline needs, in ONE device program.

The v2.2_mdd pipeline consumes half a dozen framewise envelopes (feature grid,
10 ms valley RMS, guard/refine dB grids, classification activity). Computing
them as separate jitted calls costs a host<->device round trip each — over the
TPU tunnel that dominated the warm path. This module fuses them into a single
program over the (mix, vocal) pair already resident in HBM from the on-device
separation OLA, and performs ONE bundled device_get.

dB grids are decimated by `DB_STRIDE` samples (0.7 ms at 44.1 kHz); all
consumers (quiet guards, precise cut points, local valley refine) operate on
>=5 ms windows, so the decimation is lossless for them.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audio_cut_tpu.analysis.features import TrackFeatures, DEFAULT_HOP_S, _compute_features
from audio_cut_tpu.ops import beats as B
from audio_cut_tpu.ops.frames import frame_rms

DB_STRIDE = 32


def _rms_db_grid(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Decimated centered RMS-dB grid (stride DB_STRIDE)."""
    sums_grid, counts = _binned_window_sums(jnp.square(x), window)
    rms = jnp.sqrt(jnp.maximum(sums_grid, 0.0) / counts + 1e-24)
    return 20.0 * jnp.log10(rms + 1e-12)


def _binned_window_sums(sq: jnp.ndarray, window: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Windowed sums over DB_STRIDE bins via lax.reduce_window.

    reduce_window lowers to the TPU's native sliding reduction — measured 5x
    faster than the gather formulation this replaced, with no prefix-sum
    cancellation (each output is a direct sum of its wb bins).
    """
    t = sq.shape[-1]
    nb = -(-t // DB_STRIDE)
    pad = nb * DB_STRIDE - t
    bins = jnp.pad(sq, (0, pad)).reshape(nb, DB_STRIDE).sum(-1)
    cnt = jnp.pad(jnp.ones((t,), jnp.float32), (0, pad)).reshape(nb, DB_STRIDE).sum(-1)
    wb = max(1, int(round(window / DB_STRIDE)))
    half = wb // 2
    sums = jax.lax.reduce_window(bins, 0.0, jax.lax.add, (wb,), (1,), [(half, wb - half - 1)])
    counts = jax.lax.reduce_window(cnt, 0.0, jax.lax.add, (wb,), (1,), [(half, wb - half - 1)])
    return sums, jnp.maximum(counts, 1.0)


@functools.partial(
    jax.jit,
    static_argnames=("sr", "feat_hop", "fine_hop", "fine_frame", "guard_win",
                     "refine_win", "act_hop", "act_frame"),
)
def _bundle_fn(
    mix: jnp.ndarray,
    vocal: jnp.ndarray,
    sr: int,
    feat_hop: int,
    fine_hop: int,
    fine_frame: int,
    guard_win: int,
    refine_win: int,
    act_hop: int,
    act_frame: int,
) -> Dict[str, jnp.ndarray]:
    out = dict(_compute_features(mix, feat_hop, sr / feat_hop))
    out["vocal_rms_grid"] = frame_rms(vocal, 2048, feat_hop)
    out["vocal_rms_fine"] = frame_rms(vocal, fine_frame, fine_hop)
    out["vocal_db_guard"] = _rms_db_grid(vocal, guard_win)
    out["mix_db_guard"] = _rms_db_grid(mix, guard_win)
    out["mix_db_refine"] = _rms_db_grid(mix, refine_win)
    out["vocal_db_fine"] = _rms_db_grid(vocal, fine_frame)
    out["act_rms"] = frame_rms(vocal, act_frame, act_hop)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("sr", "feat_hop", "fine_hop", "fine_frame", "guard_win",
                     "refine_win", "act_hop", "act_frame"),
)
def _bundle_flat_fn(
    mix: jnp.ndarray,
    vocal: jnp.ndarray,
    sr: int,
    feat_hop: int,
    fine_hop: int,
    fine_frame: int,
    guard_win: int,
    refine_win: int,
    act_hop: int,
    act_frame: int,
) -> jnp.ndarray:
    out = _bundle_fn(mix, vocal, sr, feat_hop, fine_hop, fine_frame,
                     guard_win, refine_win, act_hop, act_frame)
    return jnp.concatenate([
        jnp.ravel(out[k]).astype(jnp.float32) for k in sorted(out)
    ])


@dataclass
class DetectionBundle:
    sr: int
    features: TrackFeatures
    vocal_rms_grid: np.ndarray     # feature-grid RMS of the vocal stem
    vocal_rms_fine: np.ndarray     # 10 ms valley-scan envelope
    fine_fps: float
    vocal_db_guard: np.ndarray     # decimated dB grids (stride DB_STRIDE)
    mix_db_guard: np.ndarray
    mix_db_refine: np.ndarray
    vocal_db_fine: np.ndarray
    db_stride: int
    act_rms: np.ndarray            # 20 ms-hop vocal RMS for classification
    act_fps: float


def build_detection_bundle(
    mix_dev: jnp.ndarray,
    vocal_dev: jnp.ndarray,
    sr: int,
    n_true: int,
    *,
    guard_win_ms: float = 80.0,
    refine_win_ms: float = 5.0,
) -> DetectionBundle:
    """mix/vocal may be bucket-padded device arrays; n_true trims outputs."""
    feat_hop = max(1, int(round(DEFAULT_HOP_S * sr)))
    fine_hop = max(1, int(round(0.01 * sr)))
    fine_frame = max(fine_hop, int(round(0.025 * sr)))
    guard_win = max(1, int(round(guard_win_ms / 1000.0 * sr)))
    refine_win = max(1, int(round(refine_win_ms / 1000.0 * sr)))
    act_hop = max(1, int(0.02 * sr))
    act_frame = max(act_hop * 2, int(0.05 * sr))

    args = (mix_dev, vocal_dev, sr, feat_hop, fine_hop, fine_frame,
            guard_win, refine_win, act_hop, act_frame)
    # ONE flat transfer: the tunnel costs ~35 ms of latency PER array, so a
    # 15-array device_get spent ~0.5 s in round-trips (measured); shipping a
    # single concatenated vector is one round-trip for the same bytes
    shapes = jax.eval_shape(_bundle_fn, *args)
    keys = sorted(shapes)
    flat_host = np.asarray(_bundle_flat_fn(*args))
    host: Dict[str, np.ndarray] = {}
    off = 0
    for k in keys:
        size = int(np.prod(shapes[k].shape)) if shapes[k].shape else 1
        v = flat_host[off:off + size]
        host[k] = v.reshape(shapes[k].shape) if shapes[k].shape else v[0]
        off += size

    duration_s = n_true / float(sr)
    n_feat = n_true // feat_hop + 1
    fps = sr / float(feat_hop)
    tempo = B.TempoResult(
        bpm=host["bpm"], period_frames=host["period_frames"],
        phase_frames=host["phase_frames"], strength=host["tempo_strength"],
    )
    features = TrackFeatures(
        sr=sr,
        hop_s=DEFAULT_HOP_S,
        duration_s=duration_s,
        rms=host["rms"][:n_feat],
        flatness=host["flatness"][:n_feat],
        onset=host["onset"][:n_feat],
        mdd=host["mdd"][:n_feat],
        bpm=float(host["bpm"]),
        tempo_strength=float(host["tempo_strength"]),
        beat_times=B.beat_times_from_tempo(tempo, fps=fps, duration_s=duration_s),
    )
    n_fine = n_true // fine_hop + 1
    n_db = -(-n_true // DB_STRIDE)
    n_act = n_true // act_hop + 1
    return DetectionBundle(
        sr=sr,
        features=features,
        vocal_rms_grid=host["vocal_rms_grid"][:n_feat],
        vocal_rms_fine=host["vocal_rms_fine"][:n_fine],
        fine_fps=sr / float(fine_hop),
        vocal_db_guard=host["vocal_db_guard"][:n_db],
        mix_db_guard=host["mix_db_guard"][:n_db],
        mix_db_refine=host["mix_db_refine"][:n_db],
        vocal_db_fine=host["vocal_db_fine"][:n_db],
        db_stride=DB_STRIDE,
        act_rms=host["act_rms"][:n_act],
        act_fps=sr / float(act_hop),
    )
