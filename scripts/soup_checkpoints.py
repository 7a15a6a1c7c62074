#!/usr/bin/env python
"""Weight-space interpolation ("model soup") of flax .msgpack checkpoints.

The round-5 promoted separator is an alpha-soup of two fine-tune legs
(docs/EVAL_PROTOCOL.md section 3: when one leg wins the margin gate and
another wins the pause floor, an interpolation often keeps both). This tool
makes that step reproducible instead of ad hoc:

    python scripts/soup_checkpoints.py \
        --out /tmp/soup_a40.msgpack \
        a.msgpack=0.6 b.msgpack=0.4          # weights renormalized to sum 1

Works on raw pytrees (flax msgpack_restore), so it needs no model template
and applies to any checkpoint family (ConvTDF / WaveUNet / ConvVAD). All
inputs must share an identical tree structure and leaf shapes. If the first
input has a geometry sidecar (<ckpt>.json), it is copied to <out>.json with
a provenance line appended (role of the reference's model-zoo provenance
metadata, /root/reference/download_mdx23.py sha256 record).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _parse_spec(spec: str):
    if "=" in spec:
        path, w = spec.rsplit("=", 1)
        return path, float(w)
    return spec, 1.0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("inputs", nargs="+", metavar="CKPT[=WEIGHT]",
                    help="msgpack checkpoints with optional mix weights")
    ap.add_argument("--out", required=True, help="output .msgpack path")
    args = ap.parse_args()

    from flax import serialization
    from jax import tree_util

    specs = [_parse_spec(s) for s in args.inputs]
    if len(specs) < 2:
        ap.error("need at least two checkpoints to soup")
    total = sum(w for _, w in specs)
    if total <= 0:
        ap.error("mix weights must sum to a positive value")
    specs = [(p, w / total) for p, w in specs]

    trees = []
    for path, _ in specs:
        with open(path, "rb") as f:
            trees.append(serialization.msgpack_restore(f.read()))

    ref_struct = tree_util.tree_structure(trees[0])
    for (path, _), tree in zip(specs[1:], trees[1:]):
        if tree_util.tree_structure(tree) != ref_struct:
            print(f"error: {path} tree structure differs from {specs[0][0]}",
                  file=sys.stderr)
            return 2

    leaves = [tree_util.tree_leaves(t) for t in trees]
    for (path, _), ls in zip(specs[1:], leaves[1:]):
        for a, b in zip(leaves[0], ls):
            if np.shape(a) != np.shape(b):
                print(f"error: leaf shape mismatch vs {path}: "
                      f"{np.shape(a)} != {np.shape(b)}", file=sys.stderr)
                return 2

    weights = [w for _, w in specs]
    souped = [
        sum(w * np.asarray(l, dtype=np.float64) for w, l in zip(weights, group))
        .astype(np.asarray(group[0]).dtype)
        for group in zip(*leaves)
    ]
    out_tree = tree_util.tree_unflatten(ref_struct, souped)

    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(out_tree))

    sidecar_src = specs[0][0] + ".json"
    if os.path.exists(sidecar_src):
        with open(sidecar_src) as f:
            meta = json.load(f)
        meta["provenance"] = (
            "weight-space soup of "
            + ", ".join(f"{os.path.basename(p)}*{w:.3f}" for p, w in specs)
            + (f"; base provenance: {meta['provenance']}"
               if meta.get("provenance") else "")
        )
        with open(args.out + ".json", "w") as f:
            json.dump(meta, f, indent=1)

    mix = "  ".join(f"{p} * {w:.3f}" for p, w in specs)
    print(f"soup written: {args.out}\n  = {mix}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
