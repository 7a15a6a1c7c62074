#!/usr/bin/env python3
"""Fetch MDX-class pretrained separation weights (reference parity:
/root/reference/download_mdx23.py:1-40, which pulls the MDX23 ONNX release).

Adds what the reference lacked: sha256 integrity (recorded to a sidecar on
first fetch, verified on re-runs or against --expect-sha256), a graceful
offline message with manual instructions, and post-download validation
through this framework's own ONNX loader (audio_cut_tpu.onnx) — op coverage,
input signature, and the serving geometry the backend will infer — so a
fetched file is proven loadable BEFORE a separation run.

Usage:
    python scripts/download_mdx23.py                      # default model
    python scripts/download_mdx23.py --model MDX23C.onnx
    python scripts/download_mdx23.py --expect-sha256 <hex>
    python scripts/download_mdx23.py --validate-only path/to/model.onnx
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import urllib.error
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# Public release mirrors. Kim_Vocal_1 is the reference's production default
# (reference src/audio_cut/config: enhanced_separation.mdx23 model discovery
# defaults to Kim_Vocal_1.onnx); MDX23C is what the reference's fetcher pulls.
MODELS = {
    "Kim_Vocal_1.onnx": [
        "https://github.com/TRvlvr/model_repo/releases/download/all_public_uvr_models/Kim_Vocal_1.onnx",
    ],
    "Kim_Vocal_2.onnx": [
        "https://github.com/TRvlvr/model_repo/releases/download/all_public_uvr_models/Kim_Vocal_2.onnx",
    ],
    "MDX23C.onnx": [
        "https://github.com/nomadkaraoke/python-audio-separator/releases/download/v0.0.1/MDX23C.onnx",
        "https://huggingface.co/MVSep/MDX23C/resolve/main/MDX23C.onnx",
    ],
}

DEFAULT_DIR = REPO / "models" / "MDX23"  # on the backend's discovery path


def sha256_of(path: Path, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        while True:
            block = fh.read(chunk)
            if not block:
                break
            h.update(block)
    return h.hexdigest()


def download(url: str, dest: Path, timeout: float = 60.0) -> None:
    tmp = dest.with_suffix(dest.suffix + ".part")
    req = urllib.request.Request(url, headers={"User-Agent": "audio-cut-tpu/1.0"})
    with urllib.request.urlopen(req, timeout=timeout) as resp, open(tmp, "wb") as out:
        total = int(resp.headers.get("Content-Length") or 0)
        done = 0
        while True:
            block = resp.read(1 << 20)
            if not block:
                break
            out.write(block)
            done += len(block)
            if total:
                pct = 100.0 * done / total
                print(f"\r  {done / 1e6:7.1f} / {total / 1e6:.1f} MB ({pct:4.1f}%)",
                      end="", flush=True)
    print()
    os.replace(tmp, dest)


def validate(path: Path) -> int:
    """Prove the file is servable by this framework's executor."""
    from collections import Counter

    from audio_cut_tpu.onnx import load_model, validate_graph

    try:
        graph = load_model(str(path))
    except Exception as exc:
        print(f"[FAIL] could not parse {path.name}: {exc}")
        return 2
    ops = Counter(n.op_type for n in graph.nodes)
    unsupported = validate_graph(graph)
    sig = {name: graph.input_shapes.get(name) for name in graph.inputs}
    print(f"  graph: {len(graph.nodes)} nodes, {len(graph.initializers)} initializers")
    print(f"  ops: {dict(sorted(ops.items()))}")
    print(f"  inputs: {sig}")
    for name in graph.inputs:
        shape = graph.input_shapes.get(name) or []
        if len(shape) == 4 and shape[1] == 4:
            print(f"  serving geometry the backend will infer: "
                  f"dim_f={shape[2]}, dim_t={shape[3]}")
    if unsupported:
        print(f"[FAIL] unsupported ops for the JAX executor: {unsupported}")
        return 3
    print("[OK] every op is executable by audio_cut_tpu.onnx (XLA path)")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="Kim_Vocal_1.onnx",
                    help=f"model filename; known: {sorted(MODELS)}")
    ap.add_argument("--url", default=None,
                    help="explicit URL (overrides the registry)")
    ap.add_argument("--dest-dir", default=str(DEFAULT_DIR))
    ap.add_argument("--expect-sha256", default=None,
                    help="fail unless the downloaded file hashes to this")
    ap.add_argument("--validate-only", default=None, metavar="PATH",
                    help="skip download; just validate an existing .onnx")
    ap.add_argument("--no-validate", action="store_true")
    args = ap.parse_args()

    if args.validate_only:
        return validate(Path(args.validate_only))

    urls = [args.url] if args.url else MODELS.get(args.model)
    if not urls:
        print(f"unknown model {args.model!r} and no --url given; known: {sorted(MODELS)}")
        return 2

    dest_dir = Path(args.dest_dir)
    dest_dir.mkdir(parents=True, exist_ok=True)
    dest = dest_dir / args.model
    sidecar = dest.with_suffix(dest.suffix + ".sha256")

    if not dest.exists():
        ok = False
        for url in urls:
            print(f"fetching {args.model} from {url}")
            try:
                download(url, dest)
                ok = True
                break
            except (urllib.error.URLError, OSError, TimeoutError) as exc:
                print(f"  [FAIL] {exc}")
        if not ok:
            print(
                "\nCould not download (offline environment or mirrors moved).\n"
                "Manual path:\n"
                f"  1. On a machine with network access, fetch {args.model}\n"
                f"     (mirrors: {', '.join(urls)})\n"
                f"  2. Copy it to {dest}\n"
                "  3. Re-run this script to verify + validate, or point the\n"
                "     backend at it directly:\n"
                "     enhanced_separation.onnx.model_path=<path>  (or\n"
                "     AUDIO_CUT_ONNX_MODEL=<path>)"
            )
            return 1
    else:
        print(f"[OK] {dest} already present")

    digest = sha256_of(dest)
    print(f"sha256: {digest}")
    if args.expect_sha256 and digest != args.expect_sha256.lower():
        print(f"[FAIL] sha256 mismatch (expected {args.expect_sha256})")
        return 4
    if sidecar.exists():
        recorded = sidecar.read_text().split()[0]
        if recorded != digest:
            print(f"[FAIL] sha256 differs from the recorded sidecar {sidecar} "
                  f"({recorded}) — file changed since first fetch")
            return 4
        print("[OK] matches recorded sidecar")
    else:
        sidecar.write_text(f"{digest}  {dest.name}\n")
        print(f"recorded {sidecar}")

    if args.no_validate:
        return 0
    rc = validate(dest)
    if rc == 0:
        print(f"\nactivate with: enhanced_separation.backend=onnx "
              f"(model auto-discovered at {dest})")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
