#!/usr/bin/env python3
"""Isolate where the device-OLA program's time goes beyond the model forward.

Times, warm best-of-3 on a 60 s song (convtdf packaged default):
  * upload-only: jnp.asarray of the int16 track + block
  * program with HOST input (upload included, the production call)
  * program with DEVICE-RESIDENT input (pure compute)
  * fused program (OLA + detection bundle) both ways
Prints one JSON dict. Clean exit always.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())


def best3(fn):
    ts = []
    for _ in range(3):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return round(min(ts), 4)


def main() -> int:
    from audio_cut_tpu.utils.device import configure_jax

    configure_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import make_song
    from audio_cut_tpu.config import set_runtime_config
    from audio_cut_tpu.separation.backends import make_backend
    from audio_cut_tpu.separation.engine import SeparationEngine, quantize_upload

    out = {}
    audio, sr = make_song(60.0)

    # attach probe
    bk_sp = make_backend("spectral", sr)
    w = jnp.asarray((np.random.default_rng(0).standard_normal(444416) * 0.1).astype(np.float32))
    v, _ = bk_sp.separate_window(w)
    np.asarray(v[:1])
    t0 = time.time()
    v, _ = bk_sp.separate_window(w)
    np.asarray(v[:1])
    out["probe_s"] = round(time.time() - t0, 3)
    if out["probe_s"] > 0.6:
        out["verdict"] = "slow_attach"
        print(json.dumps(out))
        return 3

    set_runtime_config({
        "enhanced_separation.backend": "convtdf",
        "enhanced_separation.convtdf.checkpoint": "packaged",
    })
    eng = SeparationEngine(sr)
    n = audio.shape[-1]
    bucket = int(round(15.0 * sr))
    padded_len = max(bucket, ((n + bucket - 1) // bucket) * bucket)
    eng._ensure_geometry()
    padded_len = ((padded_len + eng.align - 1) // eng.align) * eng.align
    fn, n_chunks = eng._device_ola_fn(padded_len)
    padded = np.pad(audio, (0, padded_len - n))
    raw, scale = quantize_upload(padded)
    out["n_chunks"] = n_chunks
    out["padded_len"] = padded_len

    # warm compile
    r = fn(jnp.asarray(raw), scale)
    jax.block_until_ready(r)

    out["upload_only_s"] = best3(lambda: jax.block_until_ready(jnp.asarray(raw)))
    out["program_host_input_s"] = best3(
        lambda: jax.block_until_ready(fn(jnp.asarray(raw), scale)))
    raw_dev = jax.block_until_ready(jnp.asarray(raw))
    out["program_device_input_s"] = best3(
        lambda: jax.block_until_ready(fn(raw_dev, scale)))

    # model forward alone on resident windows (group-batched as production)
    bk = eng.backend
    rng = np.random.default_rng(1)
    wins = jnp.asarray(
        rng.standard_normal((n_chunks, bk.sep.window_samples)).astype(np.float32) * 0.1)
    fw = jax.jit(lambda w_: bk.separate_windows_fn(w_))
    jax.block_until_ready(fw(wins))
    out["forward_windows_s"] = best3(lambda: jax.block_until_ready(fw(wins)))

    # scalar-download round-trip cost (tunnel latency floor)
    one = jax.block_until_ready(jnp.zeros(()))
    out["scalar_roundtrip_s"] = best3(lambda: np.asarray(one + 1.0))

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    rc = 1
    try:
        rc = main()
    except Exception as exc:
        print(json.dumps({"error": repr(exc)}))
    sys.exit(rc)
