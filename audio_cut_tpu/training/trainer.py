"""Training loop for the ConvTDF separator (mask regression).

The reference ships no training code (inference-only over downloaded ONNX
weights). A standalone framework must be able to (re)train its separation
model, so this provides the full sharded train step: complex-mask L1 on the
cropped spectrogram + waveform L1 after iSTFT, AdamW, and dp/sp/tp sharding
over a jax.sharding.Mesh (see parallel/mesh.py for the axis design).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio_cut_tpu.models.convtdf import ConvTDFSeparator, apply_complex_mask
from audio_cut_tpu.parallel.mesh import batch_sharding, param_shardings, replicated


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 3e-4
    weight_decay: float = 1e-4
    spec_loss_weight: float = 1.0
    wave_loss_weight: float = 1.0
    # extra penalty on predicted vocal energy where the TARGET vocal is
    # silent: pause cleanliness of the stem is what drives cut precision
    # downstream (quiet guard + valley snap read the vocal dB grid inside
    # pauses; OOD pause_resid_db in scripts/eval_models_diverse.py)
    pause_loss_weight: float = 0.5
    pause_silence_thresh: float = 1e-3  # target frame RMS below ~-60 dBFS
    clip_norm: float = 1.0


def pause_suppression_rms(pred_wave, tgt_wave, cfg: TrainConfig):
    """RMS of the predicted vocal restricted to ~23 ms frames where the
    TARGET vocal is silent (see TrainConfig.pause_loss_weight). Shared by the
    spectral (ConvTDF) and waveform (WaveUNet) trainers."""
    frame = 1024  # ~23 ms at 44.1 kHz
    length = pred_wave.shape[-1]
    nf = length // frame
    tr = tgt_wave[..., : nf * frame].reshape(*tgt_wave.shape[:-1], nf, frame)
    pr = pred_wave[..., : nf * frame].reshape(*pred_wave.shape[:-1], nf, frame)
    tgt_rms = jnp.sqrt(jnp.mean(tr * tr, axis=-1) + 1e-12)
    silent = (tgt_rms < cfg.pause_silence_thresh).astype(pred_wave.dtype)
    pause_ms = jnp.sum(silent[..., None] * pr * pr) / (jnp.sum(silent) * frame + 1.0)
    return jnp.sqrt(pause_ms + 1e-12)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay),
    )


def make_loss_fn(sep: ConvTDFSeparator, cfg: TrainConfig, mesh: Optional[Mesh] = None):
    def loss_fn(params: Any, mix: jnp.ndarray, vocal_target: jnp.ndarray) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        spec_mix, ri_mix = sep.analyze(mix)
        if mesh is not None:
            # sequence parallelism: frames across sp, channels/freq across tp
            ri_mix = jax.lax.with_sharding_constraint(
                ri_mix, NamedSharding(mesh, P("dp", "sp", None, None))
            )
        mask = sep.spec_forward(params, ri_mix)
        pred_spec = apply_complex_mask(spec_mix[..., :sep.dim_f], mask)

        spec_tgt, _ = sep.analyze(vocal_target)
        tgt_crop = spec_tgt[..., :sep.dim_f]
        spec_l1 = jnp.mean(jnp.abs(pred_spec.real - tgt_crop.real)) + jnp.mean(
            jnp.abs(pred_spec.imag - tgt_crop.imag)
        )

        length = mix.shape[-1]
        pred_wave = sep.synthesize(spec_mix, mask, length)
        tgt_wave = vocal_target[..., :length]
        wave_l1 = jnp.mean(jnp.abs(pred_wave - tgt_wave))

        pause_rms = pause_suppression_rms(pred_wave, tgt_wave, cfg)

        loss = (
            cfg.spec_loss_weight * spec_l1
            + cfg.wave_loss_weight * wave_l1
            + cfg.pause_loss_weight * pause_rms
        )
        return loss, {
            "loss": loss, "spec_l1": spec_l1, "wave_l1": wave_l1,
            "pause_rms": pause_rms,
        }

    return loss_fn


def make_train_step(
    sep: ConvTDFSeparator,
    cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
):
    """Returns train_step(params, opt_state, mix, vocal) -> (params, opt_state, metrics).

    With a mesh, the returned step is jitted with dp/sp input shardings and
    tp param shardings; XLA inserts the psum/reduce-scatter collectives.
    """
    loss_fn = make_loss_fn(sep, cfg, mesh)

    def step(params, opt_state, mix, vocal):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, mix, vocal)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(step)

    data_sh = batch_sharding(mesh, shard_time=True)
    return jax.jit(
        step,
        in_shardings=(None, None, data_sh, data_sh),
        out_shardings=(None, None, replicated(mesh)),
    )


class Trainer:
    """Imperative shell around the pure train step."""

    def __init__(
        self,
        sep: ConvTDFSeparator,
        cfg: Optional[TrainConfig] = None,
        mesh: Optional[Mesh] = None,
        rng: Optional[jax.Array] = None,
    ) -> None:
        self.sep = sep
        self.cfg = cfg or TrainConfig()
        self.mesh = mesh
        self.optimizer = make_optimizer(self.cfg)
        self.params = sep.init_params(rng if rng is not None else jax.random.PRNGKey(0))
        if mesh is not None:
            self.params = jax.device_put(self.params, param_shardings(mesh, self.params))
        self.opt_state = self.optimizer.init(self.params)
        self._step = make_train_step(sep, self.cfg, self.optimizer, mesh)
        self.step_count = 0

    def train_step(self, mix, vocal) -> Dict[str, float]:
        self.params, self.opt_state, metrics = self._step(self.params, self.opt_state, mix, vocal)
        self.step_count += 1
        return {k: float(v) for k, v in metrics.items()}

    def save_checkpoint(self, path: str) -> None:
        if str(path).endswith(".msgpack"):
            # single-file flax serialization: portable, git-committable
            from flax import serialization

            params = jax.device_get(self.params)
            with open(path, "wb") as f:
                f.write(serialization.to_bytes(params))
            return
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, self.params, force=True)
        ckptr.wait_until_finished()  # StandardCheckpointer saves asynchronously
