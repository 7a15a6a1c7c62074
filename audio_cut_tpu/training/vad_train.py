"""ConvVAD training: supervised per-frame speech classification.

The reference consumed pretrained Silero weights; a standalone framework must
be able to produce its own VAD. This trains ConvVADNet with BCE on per-frame
labels, with a synthetic-data generator (voiced harmonics vs noise/music
beds) good enough to bootstrap a usable gate; swap in labelled real data via
the same (audio [B,T], labels [B,T//FRAME]) batch contract.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audio_cut_tpu.models.vad import FRAME, VAD_SR, ConvVADNet


@dataclasses.dataclass
class VadTrainConfig:
    learning_rate: float = 1e-3
    batch_size: int = 16
    clip_s: float = 2.0


def _voice_burst(rng: np.random.Generator, tt: np.ndarray) -> np.ndarray:
    """Sung/spoken 'voice': vibrato f0, rolled-off harmonics, syllabic AM."""
    f0 = rng.uniform(90, 380) * (
        1 + 0.025 * np.sin(2 * np.pi * rng.uniform(4.5, 7.0) * tt + rng.uniform(0, 6.28))
    )
    x = np.zeros(tt.size)
    for h in range(1, 7):
        x += np.sin(2 * np.pi * h * np.cumsum(f0) / VAD_SR + rng.uniform(0, 6.28)) / (h ** 1.2)
    # syllabic amplitude modulation (3-6 Hz) — the strongest voice cue
    am = 0.35 + 0.65 * np.clip(np.sin(2 * np.pi * rng.uniform(2.5, 6.0) * tt
                                      + rng.uniform(0, 6.28)), 0.0, None)
    fade = np.minimum(1.0, np.minimum(np.arange(tt.size), tt.size - np.arange(tt.size))
                      / (0.02 * VAD_SR))
    return x * am * fade


def _music_bed(rng: np.random.Generator, tt: np.ndarray) -> np.ndarray:
    """Non-voice bed that can be LOUD: noise, static chords, percussion.

    Loud beds are the whole point — a pure energy gate calls them speech;
    the conv net must learn the vibrato/AM/harmonic-rolloff voice signature
    instead of amplitude.
    """
    bed = np.zeros(tt.size)
    kind = rng.random()
    if kind < 0.3:  # broadband noise
        bed += rng.standard_normal(tt.size) * rng.uniform(0.01, 0.25)
    elif kind < 0.65:  # static chord stack (no vibrato, no syllabic AM)
        root = rng.uniform(55, 440)
        for ratio in (1.0, 1.5, 2.0, 2.5):
            bed += rng.uniform(0.05, 0.3) * np.sin(2 * np.pi * root * ratio * tt
                                                   + rng.uniform(0, 6.28))
    else:  # percussion: exponential-decay clicks on a beat grid
        period = rng.uniform(0.25, 0.6)
        for beat in np.arange(0.0, tt[-1], period):
            i = int(beat * VAD_SR)
            env = np.exp(-np.arange(min(1500, tt.size - i)) / rng.uniform(100, 400))
            bed[i:i + env.size] += rng.uniform(0.2, 0.6) * env * rng.standard_normal(env.size)
    return bed


def synth_batch(rng: np.random.Generator, cfg: VadTrainConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Synthetic (audio, frame_labels): harmonic 'voice' bursts over beds."""
    t_samples = int(cfg.clip_s * VAD_SR)
    n_frames = t_samples // FRAME
    audio = np.zeros((cfg.batch_size, t_samples), np.float32)
    labels = np.zeros((cfg.batch_size, n_frames), np.float32)
    tt = np.arange(t_samples) / VAD_SR
    for b in range(cfg.batch_size):
        audio[b] += _music_bed(rng, tt).astype(np.float32)
        # voice bursts: f0 with vibrato + harmonics + amplitude modulation;
        # ~25% of clips are music-only (hard negatives for an energy gate)
        n_bursts = rng.integers(0, 4)
        for _ in range(n_bursts):
            start = rng.uniform(0, cfg.clip_s - 0.3)
            durr = rng.uniform(0.2, min(1.2, cfg.clip_s - start))
            seg = (tt >= start) & (tt < start + durr)
            gain = rng.uniform(0.15, 0.5)
            audio[b, seg] += (gain * _voice_burst(rng, tt[seg])).astype(np.float32)
            fa, fb = int(start * VAD_SR // FRAME), int((start + durr) * VAD_SR // FRAME)
            labels[b, fa:min(fb, n_frames)] = 1.0
        peak = np.abs(audio[b]).max()
        if peak > 1.0:
            audio[b] /= peak
    return audio, labels


def rich_vad_batch(
    rng: np.random.Generator,
    cfg: VadTrainConfig,
    bleed: Tuple[float, float] = (0.05, 0.45),
) -> Tuple[np.ndarray, np.ndarray]:
    """(audio, frame_labels) from the SEPARATION training families, with the
    net input simulating a SEPARATED vocal stem.

    Production feeds the VAD the separator's output, not a clean stem
    (VERDICT r3 #6): real stems carry instrumental bleed, noise, and decay
    tails. Simulated here as clean vocal + alpha*instrumental + hiss, with
    labels from the CLEAN vocal's activity — so the net learns to call
    bleed 'not voice' at every bleed level it will meet in production.
    """
    from audio_cut_tpu.io.audio import resample_poly
    from audio_cut_tpu.training.eval_data import vocal_activity_frames
    from audio_cut_tpu.training.rich_data import (
        synth_pair_arrangement,
        synth_pair_rich,
    )
    from audio_cut_tpu.training.sep_data import SR as SEP_SR
    from audio_cut_tpu.training.sep_data import synth_pair

    n44 = int(cfg.clip_s * SEP_SR)
    # same clip length as synth_batch so mixed batches share ONE compiled
    # train-step shape (labels cover the first n_frames*FRAME samples)
    t16 = int(cfg.clip_s * VAD_SR)
    n_frames = t16 // FRAME
    audio = np.zeros((cfg.batch_size, t16), np.float32)
    labels = np.zeros((cfg.batch_size, n_frames), np.float32)
    for b in range(cfg.batch_size):
        u = rng.random()
        if u < 0.3:
            pair_fn = synth_pair
        elif u < 0.55:
            pair_fn = synth_pair_arrangement
        else:
            pair_fn = synth_pair_rich
        mix, vocal = pair_fn(rng, n44)
        inst = mix - vocal

        def _to16(x):
            y = resample_poly(x.astype(np.float32), SEP_SR, VAD_SR)
            if y.size < t16:
                y = np.pad(y, (0, t16 - y.size))
            return y[:t16]

        v16, i16 = _to16(vocal), _to16(inst)
        stem = v16 + rng.uniform(*bleed) * i16
        if rng.random() < 0.3:
            stem = stem + rng.standard_normal(t16).astype(np.float32) * rng.uniform(0.002, 0.01)
        peak = float(np.abs(stem).max())
        if peak > 1.0:
            stem = stem / peak
        audio[b] = stem
        labels[b] = vocal_activity_frames(v16, FRAME, FRAME)[:n_frames]
    return audio, labels


def mixed_vad_batch(rng: np.random.Generator, cfg: VadTrainConfig,
                    rich_frac: float = 0.6) -> Tuple[np.ndarray, np.ndarray]:
    """Blend of the classic loud-bed generator (energy-gate hard negatives)
    and the separated-stem rich generator, per batch."""
    if rng.random() < rich_frac:
        return rich_vad_batch(rng, cfg)
    return synth_batch(rng, cfg)


class VadTrainer:
    def __init__(self, cfg: Optional[VadTrainConfig] = None, seed: int = 0,
                 channels: int = 32, depth: int = 4, context: int = 0):
        self.cfg = cfg or VadTrainConfig()
        self.net = ConvVADNet(channels=channels, depth=depth, context=context)
        t = int(self.cfg.clip_s * VAD_SR)
        self.params = self.net.init(jax.random.PRNGKey(seed), jnp.zeros((1, t)))["params"]
        self.opt = optax.adamw(self.cfg.learning_rate)
        self.opt_state = self.opt.init(self.params)
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        net, opt = self.net, self.opt

        def loss_fn(params, audio, labels):
            logits = net.apply({"params": params}, audio)
            loss = optax.sigmoid_binary_cross_entropy(logits, labels).mean()
            acc = jnp.mean((logits > 0) == (labels > 0.5))
            return loss, acc

        def step(params, opt_state, audio, labels):
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, audio, labels)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, acc

        return step

    def train(self, steps: int, rng: Optional[np.random.Generator] = None,
              batch_fn=None) -> Dict[str, float]:
        rng = rng or np.random.default_rng(0)
        batch_fn = batch_fn or synth_batch
        loss = acc = 0.0
        for _ in range(steps):
            audio, labels = batch_fn(rng, self.cfg)
            self.params, self.opt_state, loss, acc = self._step(
                self.params, self.opt_state, jnp.asarray(audio), jnp.asarray(labels)
            )
        return {"loss": float(loss), "accuracy": float(acc)}

    def save(self, path: str) -> None:
        if str(path).endswith(".msgpack"):
            # single-file flax serialization: portable, git-committable
            from flax import serialization

            with open(path, "wb") as f:
                f.write(serialization.to_bytes(self.params))
            return
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, self.params, force=True)
        ckptr.wait_until_finished()  # StandardCheckpointer saves asynchronously
