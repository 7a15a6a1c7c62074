"""Runtime probe: can this process safely run Mosaic (Pallas) kernels?

Round-1's tunnel routed Mosaic compiles through a remote helper that HUNG;
by round 2 the helper returns proper compile results (verified live: both
production kernels compile, run, and match jnp to <1e-6 on the tunnel chip),
so the policy is now probe-everywhere, decided once and cached on disk per
(jax version, device kind):

* ``AUDIO_CUT_TPU_PALLAS=1`` forces ON, ``=0`` forces OFF (operator override).
* Non-TPU backends: OFF (kernels are TPU-specific; jnp path is identical).
* Any TPU (direct or relay): compile+run a trivial kernel in a SUBPROCESS
  with a generous timeout; the verdict persists on disk so the one risky
  compile happens once per environment, not per process.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path
from typing import Optional

_VERDICT: Optional[bool] = None

_PROBE_CODE = """
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :] * 2.0

x = jnp.ones((8, 128), jnp.float32)
y = pl.pallas_call(
    k,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x)
assert float(y[0, 0]) == 2.0
print("PALLAS_OK")
"""


def _cache_path() -> Path:
    root = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return Path(root) / "audio_cut_tpu" / "pallas_verdict.json"


def _cache_key() -> str:
    import jax

    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        kind = "unknown"
    return f"{jax.__version__}/{kind}"


def pallas_supported() -> bool:
    """True when Pallas kernels should run on this process's devices."""
    global _VERDICT
    if _VERDICT is not None:
        return _VERDICT

    env = os.environ.get("AUDIO_CUT_TPU_PALLAS")
    if env in ("0", "1"):
        _VERDICT = env == "1"
        return _VERDICT

    import jax

    if jax.default_backend() != "tpu":
        _VERDICT = False
        return _VERDICT

    # probe once per environment, cache the verdict on disk
    cache = _cache_path()
    key = _cache_key()
    try:
        data = json.loads(cache.read_text())
        if key in data:
            _VERDICT = bool(data[key])
            return _VERDICT
    except (OSError, json.JSONDecodeError):
        data = {}

    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE], capture_output=True, timeout=120
        )
        verdict = b"PALLAS_OK" in proc.stdout
    except subprocess.TimeoutExpired:
        verdict = False
    data[key] = verdict
    try:
        cache.parent.mkdir(parents=True, exist_ok=True)
        cache.write_text(json.dumps(data))
    except OSError:
        pass
    _VERDICT = verdict
    return _VERDICT
