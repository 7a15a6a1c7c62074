#!/usr/bin/env python3
"""Evaluate a candidate ConvTDF checkpoint against the packaged one and
promote it only if it wins.

Both checkpoints are scored with the same held-out synthetic eval
(scripts/train_separator.py evaluate_si_snr, fixed seed). The packaged
artifact is only overwritten on a strict SI-SNR improvement, so a bad
training draw (degraded attach, budget stop) can never regress the
shipped weights.

Usage: python scripts/eval_compare_separator.py CANDIDATE.msgpack [--pairs 8]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

PACKAGED = REPO / "audio_cut_tpu" / "models" / "weights" / "convtdf_bootstrap_v1.msgpack"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("candidate")
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args()

    from audio_cut_tpu.utils.device import configure_jax

    configure_jax()
    import jax

    from audio_cut_tpu.models.convtdf import ConvTDFSeparator, load_checkpoint
    from train_separator import BOOTSTRAP_GEOMETRY, evaluate_si_snr

    sep = ConvTDFSeparator(44100, **BOOTSTRAP_GEOMETRY)

    def score(path: Path) -> float:
        params = load_checkpoint(str(path), template=lambda: sep.init_params(jax.random.PRNGKey(0)))
        conv_db, _ = evaluate_si_snr(sep, params, n_pairs=args.pairs, seed=args.seed)
        return conv_db

    cand = Path(args.candidate)
    if not cand.exists():
        print(f"candidate {cand} missing"); return 2
    cand_db = score(cand)
    pack_db = score(PACKAGED) if PACKAGED.exists() else float("-inf")
    print(json.dumps({"candidate_si_snr_db": round(cand_db, 2),
                      "packaged_si_snr_db": round(pack_db, 2)}))
    if cand_db > pack_db:
        shutil.copyfile(cand, PACKAGED)
        sidecar = cand.with_suffix(cand.suffix + ".json")
        if sidecar.exists():
            shutil.copyfile(sidecar, str(PACKAGED) + ".json")
        print(f"PROMOTED: candidate ({cand_db:.2f} dB) > packaged ({pack_db:.2f} dB)")
        return 0
    print("kept packaged weights (candidate did not improve)")
    return 1


if __name__ == "__main__":
    sys.path.insert(0, str(REPO / "scripts"))
    raise SystemExit(main())
