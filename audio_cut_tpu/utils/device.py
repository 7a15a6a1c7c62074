"""Device runtime utilities.

Replaces the reference's CUDA device selection + NVML telemetry
(reference src/audio_cut/utils/gpu_pipeline.py:87-130 select_device,
:191-269 NVML/nvidia-smi) with the TPU equivalents: JAX device discovery,
live device memory statistics, and the persistent XLA compilation cache
(the TPU analog of "warmup" — cold-start compiles amortise across processes).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)

_CONFIGURED = False
_DEFAULT_CACHE_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "audio_cut_tpu", "xla"
)


def configure_jax(cache_dir: Optional[str] = None) -> None:
    """Enable the persistent compilation cache (idempotent, best-effort).

    Measured on the v5e tunnel: the 45 s-bucket separation program compiles
    in ~15 s cold and loads in ~1.7 s from this cache in a fresh process.
    """
    global _CONFIGURED
    if _CONFIGURED:
        return
    _CONFIGURED = True
    import jax

    path = cache_dir or os.environ.get("AUDIO_CUT_TPU_XLA_CACHE", _DEFAULT_CACHE_DIR)
    # namespace by host CPU fingerprint: XLA:CPU AOT results compiled on a
    # machine with different vector extensions SIGILL on load (observed when
    # a cache dir migrated between container hosts)
    try:
        import hashlib
        import platform

        # include the platform selection: TPU-attached processes emit CPU AOT
        # entries with different XLA target pseudo-features (prefer-no-scatter
        # etc.) than CPU-only processes, which trips the loader's SIGILL check
        try:
            platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        except AttributeError:
            platforms = os.environ.get("JAX_PLATFORMS", "")
        fp = platform.machine() + str(platforms)
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        fp += line
                        break
        except OSError:
            pass
        path = os.path.join(path, hashlib.sha1(fp.encode()).hexdigest()[:10])
    except Exception:  # pragma: no cover
        pass
    try:
        Path(path).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        logger.debug("XLA compilation cache at %s", path)
    except Exception as exc:  # pragma: no cover - cache is an optimisation
        logger.debug("compilation cache unavailable: %s", exc)


def select_device(prefer: Optional[str] = None):
    """Pick the compute device (parity: gpu_pipeline.select_device)."""
    import jax

    devices = jax.devices()
    if prefer:
        want = prefer.split(":")[0].lower()
        # migration compat: reference configs/flags say cuda:N / gpu:N
        # (run_splitter.py --gpu-device); map them to "any accelerator".
        if want in ("cuda", "gpu"):
            accel = [d for d in devices if d.platform.lower() != "cpu"]
            if accel:
                idx = 0
                if ":" in prefer:
                    try:
                        idx = int(prefer.split(":")[1])
                    except ValueError:
                        idx = 0
                return accel[min(idx, len(accel) - 1)]
            want = "cpu"  # no accelerator present
        matches = [d for d in devices if d.platform.lower().startswith(want)]
        if matches:
            idx = 0
            if ":" in prefer:
                try:
                    idx = int(prefer.split(":")[1])
                except ValueError:
                    idx = 0
            return matches[min(idx, len(matches) - 1)]
        logger.warning("no %r device; using %s", prefer, devices[0])
    return devices[0]


def device_info() -> List[Dict[str, Any]]:
    import jax

    return [
        {
            "id": d.id,
            "platform": d.platform,
            "kind": getattr(d, "device_kind", "unknown"),
            "process_index": d.process_index,
        }
        for d in jax.devices()
    ]


def device_memory_stats() -> Dict[str, Any]:
    """Live per-device memory statistics (TPU analog of NVML)."""
    import jax

    out: Dict[str, Any] = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[f"device_{d.id}"] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
