#!/usr/bin/env python3
"""Train the ConvTDF separator on (mix, vocal) pairs.

The reference downloaded pretrained MDX23 ONNX weights (download_mdx23.py);
this framework trains its own mask net instead. Data: a directory of paired
WAVs `<name>_mix.wav` / `<name>_vocal.wav` (equal length, 44.1 kHz mono), or
--synthetic for a smoke run without data.

Usage:
    python scripts/train_separator.py --data-dir pairs/ --steps 1000 \
        --checkpoint ~/ckpts/convtdf
    python scripts/train_separator.py --synthetic --steps 20   # smoke test
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# the axon TPU plugin ignores the JAX_PLATFORMS env var (it self-registers at
# import); honor the operator's choice through the config API
import os  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    import jax  # noqa: E402

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass


def iter_batches(data_dir, window, batch, rng):
    from audio_cut_tpu.io.audio import load_audio

    pairs = sorted(Path(data_dir).glob("*_mix.wav"))
    if not pairs:
        raise SystemExit(f"no *_mix.wav files under {data_dir}")
    loaded = []
    for mix_path in pairs:
        vocal_path = mix_path.with_name(mix_path.name.replace("_mix.wav", "_vocal.wav"))
        if not vocal_path.exists():
            continue
        mix, sr = load_audio(mix_path, target_sr=44100)
        vocal, _ = load_audio(vocal_path, target_sr=44100)
        n = min(mix.size, vocal.size)
        if n >= window:
            loaded.append((mix[:n], vocal[:n]))
    if not loaded:
        raise SystemExit("no usable pairs (need *_mix.wav + *_vocal.wav of >= window length)")
    while True:
        mixes, vocals = [], []
        for _ in range(batch):
            mix, vocal = loaded[rng.integers(len(loaded))]
            start = rng.integers(0, mix.size - window + 1)
            mixes.append(mix[start:start + window])
            vocals.append(vocal[start:start + window])
        yield np.stack(mixes), np.stack(vocals)


def synthetic_batches(window, batch, rng):
    t = np.arange(window) / 44100.0
    while True:
        vocals = np.zeros((batch, window), np.float32)
        beds = np.zeros((batch, window), np.float32)
        for b in range(batch):
            f0 = rng.uniform(120, 350)
            x = np.zeros(window)
            for h in range(1, 5):
                x += np.sin(2 * np.pi * h * f0 * t) / h
            vocals[b] = (rng.uniform(0.1, 0.4) * x).astype(np.float32)
            beds[b] = (rng.standard_normal(window) * rng.uniform(0.02, 0.1)).astype(np.float32)
        yield vocals + beds, vocals


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--small", action="store_true", help="small geometry for smoke tests")
    ap.add_argument("--lr", type=float, default=3e-4)
    args = ap.parse_args()

    from audio_cut_tpu.models.convtdf import ConvTDFSeparator
    from audio_cut_tpu.training.trainer import TrainConfig, Trainer
    from audio_cut_tpu.utils.device import configure_jax

    configure_jax()
    if args.small:
        sep = ConvTDFSeparator(44100, n_fft=512, hop=128, dim_f=128, dim_t=32,
                               channels=8, depth=2, tdf_bottleneck=16)
    else:
        sep = ConvTDFSeparator(44100)
    trainer = Trainer(sep, TrainConfig(learning_rate=args.lr))

    rng = np.random.default_rng(0)
    if args.synthetic or not args.data_dir:
        batches = synthetic_batches(sep.window_samples, args.batch, rng)
    else:
        batches = iter_batches(args.data_dir, sep.window_samples, args.batch, rng)

    for step in range(1, args.steps + 1):
        mix, vocal = next(batches)
        metrics = trainer.train_step(mix, vocal)
        if step % max(1, args.steps // 20) == 0 or step == 1:
            print(f"step {step:6d}  loss {metrics['loss']:.4f}  "
                  f"spec {metrics['spec_l1']:.4f}  wave {metrics['wave_l1']:.4f}", flush=True)

    if args.checkpoint:
        trainer.save_checkpoint(str(Path(args.checkpoint).expanduser().resolve()))
        print(f"checkpoint saved: {args.checkpoint}")
        print("activate with runtime override: "
              f"enhanced_separation.backend=convtdf, enhanced_separation.convtdf.checkpoint={args.checkpoint}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
