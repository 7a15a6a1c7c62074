#!/usr/bin/env python3
"""Evaluate a candidate separator checkpoint against the packaged one and
promote it only if it wins.

Both checkpoints are scored with the same held-out synthetic evals (fixed
seeds) on THREE families: the classic generator (training/sep_data.py), the
widened rich generator, and the full-arrangement generator (both in
training/rich_data.py). Promotion requires the
candidate's mean SI-SNR across the families to beat the packaged weights
WITHOUT regressing the classic family by more than --classic-slack dB — so a
rich-trained leg can't trade away the in-distribution quality the diff gates
were pinned on. The OOD eval family (training/eval_data.py) is never scored
here: it stays a pure held-out report (scripts/eval_models_diverse.py).

Usage:
  python scripts/eval_compare_separator.py CANDIDATE.msgpack [--pairs 8]
  python scripts/eval_compare_separator.py CAND.msgpack --family waveunet
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

WEIGHTS = REPO / "audio_cut_tpu" / "models" / "weights"
PACKAGED = {
    "convtdf": WEIGHTS / "convtdf_bootstrap_v1.msgpack",
    "waveunet": WEIGHTS / "waveunet_bootstrap_v1.msgpack",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("candidate")
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--family", choices=("convtdf", "waveunet"), default="convtdf")
    ap.add_argument("--classic-slack", type=float, default=0.7,
                    help="max allowed classic-family regression (dB)")
    args = ap.parse_args()

    from audio_cut_tpu.utils.device import configure_jax

    configure_jax()
    import jax
    import numpy as np

    from audio_cut_tpu.models.convtdf import load_checkpoint
    from audio_cut_tpu.training.rich_data import (
        synth_pair_arrangement,
        synth_pair_rich,
    )
    from audio_cut_tpu.training.sep_data import si_snr, synth_pair

    if args.family == "waveunet":
        from audio_cut_tpu.models.waveunet import WaveUNetSeparator
        from train_separator import WAVEUNET_GEOMETRY

        sep = WaveUNetSeparator(44100, **WAVEUNET_GEOMETRY)
    else:
        from audio_cut_tpu.models.convtdf import ConvTDFSeparator
        from train_separator import BOOTSTRAP_GEOMETRY

        sep = ConvTDFSeparator(44100, **BOOTSTRAP_GEOMETRY)

    fwd = jax.jit(lambda p, x: sep.separate_fn(p, x, sep.window_samples))

    def score(path: Path) -> dict:
        params = load_checkpoint(
            str(path), template=lambda: sep.init_params(jax.random.PRNGKey(0)))
        out = {}
        for fam, pair_fn, seed in (
            ("classic", synth_pair, args.seed),
            ("rich", synth_pair_rich, args.seed + 4242),
            ("arrangement", synth_pair_arrangement, args.seed + 777),
        ):
            rng = np.random.default_rng(seed)
            scores = []
            for _ in range(args.pairs):
                mix, vocal = pair_fn(rng, sep.window_samples)
                v, _ = fwd(params, mix[None])
                scores.append(si_snr(np.asarray(v[0]), vocal))
            out[fam] = float(np.mean(scores))
        out["mean"] = (out["classic"] + out["rich"] + out["arrangement"]) / 3.0
        return out

    packaged = PACKAGED[args.family]
    cand = Path(args.candidate)
    if not cand.exists():
        print(f"candidate {cand} missing"); return 2
    cand_s = score(cand)
    pack_s = score(packaged) if packaged.exists() else {
        "classic": float("-inf"), "rich": float("-inf"), "mean": float("-inf")}
    print(json.dumps({
        "candidate": {k: round(v, 2) for k, v in cand_s.items()},
        "packaged": {k: round(v, 2) for k, v in pack_s.items()},
    }))
    wins = (cand_s["mean"] > pack_s["mean"]
            and cand_s["classic"] > pack_s["classic"] - args.classic_slack)
    if wins:
        shutil.copyfile(cand, packaged)
        sidecar = cand.with_suffix(cand.suffix + ".json")
        if sidecar.exists():
            shutil.copyfile(sidecar, str(packaged) + ".json")
        print(f"PROMOTED: mean {cand_s['mean']:.2f} dB > {pack_s['mean']:.2f} dB "
              f"(classic {cand_s['classic']:.2f} vs {pack_s['classic']:.2f})")
        return 0
    print("kept packaged weights (candidate did not improve)")
    return 1


if __name__ == "__main__":
    sys.path.insert(0, str(REPO / "scripts"))
    raise SystemExit(main())
