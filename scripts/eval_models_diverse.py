#!/usr/bin/env python3
"""Out-of-distribution eval for the packaged models (VERDICT r2 task 6).

The packaged ConvTDF/ConvVAD checkpoints were trained on
training/sep_data.py's synthetic family; held-out draws from the SAME
generator overstate quality. This script measures them on the deliberately
different family in training/eval_data.py (stepped melodies, choir detune,
Karplus-Strong plucks, vibrato'd string pads, reverb/saturation/noise) and
reports:

* ConvTDF SI-SNR (dB) on OOD mixtures vs the spectral-mask baseline;
* ConvVAD frame F1 against ground-truth activity from the clean stem,
  measured on the SEPARATED vocal (the production input) and on the clean
  vocal (upper bound), vs the energy-gate baseline.

Usage: python scripts/eval_models_diverse.py [--tracks 10] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def f1(pred, true):
    import numpy as np

    pred = np.asarray(pred).astype(bool)
    true = np.asarray(true).astype(bool)
    tp = int(np.sum(pred & true))
    fp = int(np.sum(pred & ~true))
    fn = int(np.sum(~pred & true))
    p = tp / max(1, tp + fp)
    r = tp / max(1, tp + fn)
    return 2 * p * r / max(1e-9, p + r)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=10)
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--json", default=None)
    ap.add_argument("--tpu", action="store_true", help="run on the attached TPU")
    ap.add_argument("--convtdf-checkpoint", default=None,
                    help="evaluate a CANDIDATE ConvTDF checkpoint instead of "
                         "the packaged one (pre-promotion OOD scoring)")
    ap.add_argument("--vad-checkpoint", default=None,
                    help="evaluate a CANDIDATE ConvVAD checkpoint instead of "
                         "the packaged one")
    ap.add_argument("--waveunet-checkpoint", default=None,
                    help="evaluate a CANDIDATE WaveUNet checkpoint instead "
                         "of the packaged one")
    ap.add_argument("--shifts", type=int, default=1,
                    help="test-time shift averaging for the convtdf backend "
                         "(enhanced_separation.convtdf.shifts)")
    ap.add_argument("--vad-only", action="store_true",
                    help="VAD candidate scoring fast path: run only the "
                         "primary separator (for vad_f1_sep) + the VAD; "
                         "skip spectral/waveunet SI-SNR and pause metrics")
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from audio_cut_tpu.config import set_runtime_config
    from audio_cut_tpu.models.convtdf import packaged_checkpoint_path
    from audio_cut_tpu.models.vad import FRAME, VAD_SR, ConvVAD, build_vad
    from audio_cut_tpu.separation.backends import make_backend
    from audio_cut_tpu.training.eval_data import SR, eval_pair, vocal_activity_frames
    from audio_cut_tpu.training.sep_data import si_snr

    if packaged_checkpoint_path() is None and not args.convtdf_checkpoint:
        print("no packaged convtdf checkpoint in this build")
        return 1
    set_runtime_config({"enhanced_separation.convtdf.checkpoint":
                        args.convtdf_checkpoint or "packaged",
                        "enhanced_separation.convtdf.shifts": args.shifts})
    convtdf = make_backend("convtdf", SR)
    spectral = make_backend("spectral", SR) if not args.vad_only else None
    from audio_cut_tpu.models.waveunet import packaged_checkpoint_path as wu_ckpt

    waveunet = None
    if not args.vad_only and (wu_ckpt() is not None or args.waveunet_checkpoint):
        set_runtime_config({"enhanced_separation.waveunet.checkpoint":
                            args.waveunet_checkpoint or "packaged"})
        waveunet = make_backend("waveunet", SR)
    if args.vad_checkpoint:
        set_runtime_config({"vad.checkpoint": args.vad_checkpoint})
    vad = build_vad(SR)  # packaged production checkpoint (or candidate)
    assert isinstance(vad, ConvVAD) and vad.trained, "packaged ConvVAD required"

    n = int(args.seconds * SR)
    gt_hop = int(round(FRAME * SR / VAD_SR))  # VAD frame grid in native samples

    rows = []
    for k in range(args.tracks):
        rng = np.random.default_rng(31337 + 101 * k)
        mix, vocal = eval_pair(rng, n)

        v_tdf, _ = convtdf.separate(mix)
        row = {
            "si_snr_convtdf": round(si_snr(v_tdf, vocal), 2),
            "si_snr_mix": round(si_snr(mix, vocal), 2),  # do-nothing floor
        }
        if spectral is not None:
            v_spec, _ = spectral.separate(mix)
            row["si_snr_spectral"] = round(si_snr(v_spec, vocal), 2)
        if waveunet is not None:
            v_wu, _ = waveunet.separate(mix)
            row["si_snr_waveunet"] = round(si_snr(v_wu, vocal), 2)

        true = vocal_activity_frames(vocal, frame=gt_hop, hop=gt_hop)
        # pause residual: vocal-stem energy inside TRUE vocal pauses, dB
        # relative to the mix energy there (more negative = cleaner pauses).
        # This is the quantity that drives cut precision downstream: the
        # quiet guard and the valley snap both search the vocal stem's dB
        # grid inside pauses (pipeline/modes/pure_vocal.py).
        act = np.repeat(true.astype(bool), gt_hop)
        if act.size < mix.size:  # tail samples beyond the last frame: not a pause
            act = np.pad(act, (0, mix.size - act.size), constant_values=True)
        pause = ~act[: mix.size]
        if pause.any() and spectral is not None:
            e_mix = float(np.mean(mix[pause] ** 2)) + 1e-12
            def _resid_db(est):
                return round(10.0 * np.log10(float(np.mean(est[pause] ** 2)) / e_mix + 1e-9), 1)
            row["pause_resid_db_convtdf"] = _resid_db(v_tdf)
            row["pause_resid_db_spectral"] = _resid_db(v_spec)
            if waveunet is not None:
                row["pause_resid_db_waveunet"] = _resid_db(v_wu)
        for tag, wave in (("sep", v_tdf), ("clean", vocal)):
            probs, _fps = vad.speech_probs(wave)
            m = min(len(probs), len(true))
            # score at the checkpoint's calibrated operating threshold
            # (sidecar-driven; 0.5 for sidecar-less checkpoints)
            row[f"vad_f1_{tag}"] = round(f1(probs[:m] > vad.threshold, true[:m]), 3)
        # energy-gate baseline on the same separated vocal
        rms = np.sqrt(np.convolve(v_tdf ** 2, np.ones(gt_hop) / gt_hop, "same"))[::gt_hop]
        db = 20 * np.log10(rms + 1e-9)
        gate = db > (np.percentile(db, 10) + 20.0)
        m = min(len(gate), len(true))
        row["vad_f1_energy_gate"] = round(f1(gate[:m], true[:m]), 3)
        rows.append(row)
        print(f"track {k}: {row}")

    keys = sorted({key for r in rows for key in r})
    agg = {key: round(float(np.mean([r[key] for r in rows if key in r])), 3)
           for key in keys}
    print("\naggregate over", len(rows), "OOD tracks:", json.dumps(agg, indent=2))

    # fallback-tier ordering verdict (VERDICT r3 task #5): the Demucs-role
    # waveunet tier only earns its slot ahead of spectral if it wins
    # per-track — median advantage >= +2 dB AND no track where it loses by
    # >0.5 dB (docs/EVAL_PROTOCOL.md §3)
    ordering = None
    if waveunet is not None:
        deltas = [r["si_snr_waveunet"] - r["si_snr_spectral"]
                  for r in rows if "si_snr_waveunet" in r]
        ordering = {
            "waveunet_minus_spectral_median_db": round(float(np.median(deltas)), 2),
            "waveunet_worst_loss_db": round(float(min(deltas)), 2),
            "waveunet_earns_slot_above_spectral": bool(
                np.median(deltas) >= 2.0 and min(deltas) >= -0.5
            ),
        }
        print("fallback ordering:", json.dumps(ordering, indent=2))
    # promotion bar (VERDICT r4 task #1): the separator must IMPROVE every
    # OOD track over doing nothing (SI-SNR > mix per-track), and keep pauses
    # clean enough to drive the cut guards (mean pause residual <= -10 dB)
    margins = [r["si_snr_convtdf"] - r["si_snr_mix"] for r in rows]
    promotion = {
        "min_track_margin_over_mix_db": round(float(min(margins)), 2),
        "all_tracks_beat_mix": bool(min(margins) > 0),
        "mean_si_snr_db": agg["si_snr_convtdf"],
        "mean_pause_resid_db": agg.get("pause_resid_db_convtdf"),
        "pause_resid_bar_met": bool(
            agg.get("pause_resid_db_convtdf", 0.0) <= -10.0),
    }
    print("promotion bar:", json.dumps(promotion, indent=2))
    if args.json:
        Path(args.json).write_text(json.dumps(
            {"tracks": rows, "aggregate": agg, "ordering": ordering,
             "promotion": promotion}, indent=2))

    ok = (agg["si_snr_convtdf"] > agg.get("si_snr_spectral", agg["si_snr_mix"])
          and agg["vad_f1_sep"] > agg["vad_f1_energy_gate"])
    print("OOD eval:", "PASS (trained models beat baselines out of distribution)"
          if ok else "FAIL (trained models do NOT beat baselines OOD)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
