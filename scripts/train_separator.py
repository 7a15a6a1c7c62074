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


# geometry of the packaged bootstrap checkpoint: the production spectral
# frame (n_fft 6144 / hop 1024 / dim_f 2048 — what the OLA engine feeds) with
# a compact net so the committed msgpack stays small (~2.5 MB); dim_t is a
# TRAINING window length only — the net is fully convolutional over T, so
# serving uses the config dim_t (default 256)
BOOTSTRAP_GEOMETRY = dict(
    n_fft=6144, hop=1024, dim_f=2048, dim_t=64,
    channels=16, depth=2, tdf_bottleneck=32,
)

# waveunet bootstrap: training window is SHORTER than the serving window
# (fully convolutional over T — serving uses config window_samples 262144);
# channels/depth are the packaged contract recorded in the sidecar
WAVEUNET_GEOMETRY = dict(window_samples=65536, channels=24, depth=4)

# large-geometry checkpoint (round-5 capacity push, VERDICT r4 task #1):
# same production spectral frame as the bootstrap, but at reference-class
# capacity — the MDX23 Conv-TDF the reference serves is ~7.4 M params
# (reference src/audio_cut/separation/backends.py:90); channels 32 / depth 3
# / bottleneck 64 lands ~5 M params (~7x the bootstrap's 0.7 M), spending the
# measured 99% idle MFU headroom (docs/profile_neural_r4.json) on quality.
# dim_t 128 doubles the training window vs the bootstrap so GroupNorm's
# (T,F)-statistics at train time sit closer to the dim_t-256 serving window.
LARGE_GEOMETRY = dict(
    n_fft=6144, hop=1024, dim_f=2048, dim_t=128,
    channels=32, depth=3, tdf_bottleneck=64,
)

# tiny-geometry checkpoint for the ALWAYS-RUN CPU test tier: small enough
# that the vpbd_asr PRD precision gate exercises the NEURAL path inside the
# 5-minute loop (VERDICT r3 task #4). dim_t here is the training window; the
# sidecar records TINY_SERVING_DIM_T so serving uses a longer window.
TINY_GEOMETRY = dict(
    n_fft=1024, hop=256, dim_f=384, dim_t=64,
    channels=12, depth=2, tdf_bottleneck=24,
)
TINY_SERVING_DIM_T = 256


def evaluate_si_snr(sep, params, n_pairs: int = 6, seed: int = 1234):
    """Held-out synthetic eval: SI-SNR (dB) of the ConvTDF vocal estimate vs
    the model-free spectral-mask backend on the same mixtures."""
    import jax

    from audio_cut_tpu.separation.backends import SpectralMaskBackend
    from audio_cut_tpu.training.sep_data import si_snr, synth_pair

    rng = np.random.default_rng(seed)
    spectral = SpectralMaskBackend(44100)
    fwd = jax.jit(lambda p, x: sep.separate_fn(p, x, sep.window_samples))
    conv_scores, spec_scores = [], []
    for _ in range(n_pairs):
        mix, vocal = synth_pair(rng, sep.window_samples)
        v_conv, _ = fwd(params, mix[None])
        v_spec, _ = spectral.separate_window(np.asarray(mix))
        conv_scores.append(si_snr(np.asarray(v_conv[0]), vocal))
        spec_scores.append(si_snr(np.asarray(v_spec)[: vocal.size], vocal))
    return float(np.mean(conv_scores)), float(np.mean(spec_scores))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--bootstrap", action="store_true",
                    help="train the packaged bootstrap checkpoint on rich "
                         "synthetic stems (training/sep_data.py) and save "
                         "msgpack + geometry sidecar")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--small", action="store_true", help="small geometry for smoke tests")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny CPU-tier geometry (TINY_GEOMETRY): trains the "
                         "packaged_tiny checkpoint that lets the always-run "
                         "CPU suite exercise the neural precision gate")
    ap.add_argument("--large", action="store_true",
                    help="reference-class capacity (LARGE_GEOMETRY, ~5 M "
                         "params): the round-5 quality push; combine with "
                         "--bootstrap-style rich families via --rich")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--pause-weight", type=float, default=None,
                    help="override TrainConfig.pause_loss_weight (pause-"
                         "suppression RMS penalty; drives the OOD "
                         "pause_resid_db metric that gates cut precision)")
    ap.add_argument("--eval-pairs", type=int, default=6)
    ap.add_argument("--max-minutes", type=float, default=0.0,
                    help="wall-clock budget; exits cleanly (saving the "
                         "checkpoint) when exceeded. NEVER kill a TPU-attached "
                         "process externally — it wedges the tunnel.")
    ap.add_argument("--probe-threshold-s", type=float, default=0.0,
                    help="if >0: exit rc=3 when a warm dispatched matmul is "
                         "slower than this BEFORE paying the train-step "
                         "compile (degraded tunnel attach); rerun in a fresh "
                         "process to draw a new attach")
    ap.add_argument("--augment", action="store_true",
                    help="channel-effect augmentation (reverb/saturation/"
                         "noise) on the bootstrap generator's pairs")
    ap.add_argument("--rich", action="store_true",
                    help="widened timbre families (training/rich_data.py) "
                         "mixed with the classic generator, augmentation on "
                         "— the OOD-generalization training leg")
    ap.add_argument("--classic-frac", type=float, default=0.3,
                    help="--rich family mix: fraction of classic-generator "
                         "pairs (recovers in-distribution quality)")
    ap.add_argument("--arrangement-frac", type=float, default=0.25,
                    help="--rich family mix: fraction of full-arrangement "
                         "pairs (correlated bar-grid onsets)")
    ap.add_argument("--hard-frac", type=float, default=0.4,
                    help="--rich family mix: fraction drawing crowd-bed / "
                         "shared-room-IR hard augmentation")
    ap.add_argument("--family", choices=("convtdf", "waveunet"), default="convtdf",
                    help="separator family: spectrogram mask net (default) "
                         "or the Demucs-role waveform U-Net second tier")
    ap.add_argument("--datagen-threads", type=int, default=2,
                    help="producer threads for the synthetic generators "
                         "(training/prefetch.py); at the large geometry host "
                         "datagen (~500 ms) otherwise serializes with the "
                         "~350 ms TPU step. 0 disables prefetch.")
    ap.add_argument("--resume", default=None,
                    help="initialise params from an existing checkpoint "
                         "('packaged' or a path) for a fine-tuning leg; the "
                         "optimizer state restarts fresh")
    ap.add_argument("--warm-step-threshold-s", type=float, default=0.0,
                    help="if >0: exit rc=3 when the first warm train step is "
                         "slower than this (same rationale, different scale "
                         "than the matmul probe)")
    args = ap.parse_args()

    from audio_cut_tpu.models.convtdf import ConvTDFSeparator
    from audio_cut_tpu.training.trainer import TrainConfig, Trainer
    from audio_cut_tpu.utils.device import configure_jax

    configure_jax()

    if args.probe_threshold_s > 0:
        # tunnel attach quality is bimodal PER PROCESS (fast vs ~80x
        # degraded, stable for the process lifetime — see bench.py); probe a
        # warm dispatched matmul BEFORE paying for the train-step compile,
        # and let an outer loop retry in a fresh process on a bad draw
        import time as _time

        import jax
        import jax.numpy as jnp

        x = jnp.ones((512, 512))
        (x @ x).block_until_ready()           # compile + settle
        t0 = _time.time()
        for _ in range(3):
            x = (x @ x) / 512.0
        x.block_until_ready()
        probe_s = (_time.time() - t0) / 3.0
        print(f"attach probe: {probe_s * 1000:.0f} ms/warm-matmul "
              f"on {jax.devices()[0].platform}", flush=True)
        if probe_s > args.probe_threshold_s:
            print("degraded attach — exiting rc=3; rerun in a fresh process", flush=True)
            return 3
    cfg_kwargs = dict(learning_rate=args.lr)
    if args.pause_weight is not None:
        cfg_kwargs["pause_loss_weight"] = args.pause_weight
    train_cfg = TrainConfig(**cfg_kwargs)
    if args.family == "waveunet":
        from audio_cut_tpu.models.waveunet import WaveUNetSeparator
        from audio_cut_tpu.training.wave_trainer import WaveTrainer

        if args.small:
            sep = WaveUNetSeparator(44100, window_samples=16384, channels=8, depth=3)
        else:
            sep = WaveUNetSeparator(44100, **WAVEUNET_GEOMETRY)
        trainer = WaveTrainer(sep, train_cfg)
    elif args.small:
        sep = ConvTDFSeparator(44100, n_fft=512, hop=128, dim_f=128, dim_t=32,
                               channels=8, depth=2, tdf_bottleneck=16)
        trainer = Trainer(sep, train_cfg)
    elif args.tiny:
        sep = ConvTDFSeparator(44100, **TINY_GEOMETRY)
        trainer = Trainer(sep, train_cfg)
    elif args.large:
        sep = ConvTDFSeparator(44100, **LARGE_GEOMETRY)
        trainer = Trainer(sep, train_cfg)
    elif args.bootstrap:
        sep = ConvTDFSeparator(44100, **BOOTSTRAP_GEOMETRY)
        trainer = Trainer(sep, train_cfg)
    else:
        sep = ConvTDFSeparator(44100)
        trainer = Trainer(sep, train_cfg)
    if args.resume:
        import jax

        from audio_cut_tpu.models.convtdf import load_checkpoint

        if args.family == "waveunet":
            from audio_cut_tpu.models.waveunet import packaged_checkpoint_path
        else:
            from audio_cut_tpu.models.convtdf import packaged_checkpoint_path

        src = packaged_checkpoint_path() if args.resume == "packaged" else args.resume
        if not src:
            raise SystemExit("--resume packaged: no packaged checkpoint found")
        trainer.params = load_checkpoint(
            str(src), template=lambda: sep.init_params(jax.random.PRNGKey(0))
        )
        trainer.opt_state = trainer.optimizer.init(trainer.params)
        print(f"resumed params from {src}", flush=True)

    rng = np.random.default_rng(0)
    make_iter = None
    if (args.bootstrap or args.tiny or args.large) and args.rich:
        from audio_cut_tpu.training.rich_data import rich_batches

        def make_iter(seed):
            return rich_batches(sep.window_samples, args.batch,
                                np.random.default_rng(seed),
                                classic_frac=args.classic_frac,
                                arrangement_frac=args.arrangement_frac,
                                hard_frac=args.hard_frac)
    elif args.bootstrap or args.tiny or args.large:
        from audio_cut_tpu.training.sep_data import synth_batches

        def make_iter(seed):
            return synth_batches(sep.window_samples, args.batch,
                                 np.random.default_rng(seed),
                                 augment=args.augment)
    elif args.synthetic or not args.data_dir:
        batches = synthetic_batches(sep.window_samples, args.batch, rng)
    else:
        batches = iter_batches(args.data_dir, sep.window_samples, args.batch, rng)
    if make_iter is not None:
        if args.datagen_threads > 0:
            from audio_cut_tpu.training.prefetch import PrefetchBatches

            batches = PrefetchBatches(make_iter, threads=args.datagen_threads)
        else:
            batches = make_iter(0)

    import time

    t_start = time.time()
    budget_s = args.max_minutes * 60.0 if args.max_minutes > 0 else float("inf")
    completed = 0
    for step in range(1, args.steps + 1):
        mix, vocal = next(batches)
        t0 = time.time()
        metrics = trainer.train_step(mix, vocal)
        step_s = time.time() - t0
        if step == 1:
            print(f"step 1 (compile) {step_s:.1f}s  loss {metrics['loss']:.4f}", flush=True)
        elif step == 2 and args.warm_step_threshold_s > 0 and step_s > args.warm_step_threshold_s:
            print(f"degraded attach: warm step {step_s:.2f}s > "
                  f"{args.warm_step_threshold_s}s — rerun in a fresh process", flush=True)
            return 3
        elif step % max(1, args.steps // 20) == 0 or step == 2:
            print(f"step {step:6d}  loss {metrics['loss']:.4f}  "
                  f"spec {metrics['spec_l1']:.4f}  wave {metrics['wave_l1']:.4f}  "
                  + (f"pause {metrics['pause_rms']:.4f}  " if "pause_rms" in metrics else "")
                  + f"({step_s * 1000:.0f} ms/step)", flush=True)
        completed = step
        if time.time() - t_start > budget_s:
            print(f"wall-clock budget reached at step {step}; stopping cleanly", flush=True)
            break

    if args.checkpoint and completed < min(50, args.steps):
        # budget/attach trouble before any real training: writing a
        # near-random checkpoint would silently poison the packaged weights
        print(f"only {completed} steps completed — NOT saving {args.checkpoint}", flush=True)
        return 4

    if args.bootstrap or args.tiny or args.large:
        eval_sep = sep
        if args.tiny:
            # evaluate at the SERVING window: the tiny training window
            # (0.37 s) often contains no vocal at all, which turns SI-SNR
            # into a meaningless huge-negative number
            eval_sep = ConvTDFSeparator(
                44100, **{**TINY_GEOMETRY, "dim_t": TINY_SERVING_DIM_T})
        conv_db, spec_db = evaluate_si_snr(eval_sep, trainer.params, n_pairs=args.eval_pairs)
        print(f"held-out SI-SNR: convtdf {conv_db:.2f} dB vs spectral {spec_db:.2f} dB "
              f"({'BEATS' if conv_db > spec_db else 'BELOW'} the model-free baseline)",
              flush=True)

    if args.checkpoint:
        ckpt_path = Path(args.checkpoint).expanduser().resolve()
        trainer.save_checkpoint(str(ckpt_path))
        if (args.bootstrap or args.tiny or args.large) and str(ckpt_path).endswith(".msgpack"):
            import json

            if args.family == "waveunet":
                meta = {k: v for k, v in WAVEUNET_GEOMETRY.items()
                        if k != "window_samples"}
            elif args.tiny:
                # tiny sidecar PINS the serving window too: the CPU tier must
                # not inherit the production dim_t 256-at-hop-1024 default
                meta = {k: v for k, v in TINY_GEOMETRY.items() if k != "dim_t"}
                meta["dim_t"] = TINY_SERVING_DIM_T
            elif args.large:
                # fully convolutional over T: serving window stays the config
                # dim_t (256) — the sidecar pins only the net architecture
                meta = {k: v for k, v in LARGE_GEOMETRY.items() if k != "dim_t"}
            else:
                meta = {k: v for k, v in BOOTSTRAP_GEOMETRY.items() if k != "dim_t"}
            with open(str(ckpt_path) + ".json", "w") as f:
                json.dump(meta, f, indent=1)
            print(f"geometry sidecar saved: {ckpt_path}.json")
        print(f"checkpoint saved: {args.checkpoint}")
        print("activate with runtime override: "
              f"enhanced_separation.backend=convtdf, enhanced_separation.convtdf.checkpoint={args.checkpoint}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
