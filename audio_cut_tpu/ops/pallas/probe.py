"""Runtime probe: can this process safely run Mosaic (Pallas) kernels?

History: round-1's tunnel routed Mosaic compiles through a remote helper that
HUNG; round 2 briefly saw it return results; round 3 reproduced the hang live
(a trivial 8x128 kernel compile sat >8 min with no error). So the policy is
probe-everywhere, decided once per (jax version, device kind) and cached on
disk WITH the reason, not just a bool:

* ``AUDIO_CUT_TPU_PALLAS=1`` forces ON, ``=0`` forces OFF (operator override).
* ``AUDIO_CUT_TPU_PALLAS_REPROBE=1`` discards the cached verdict first.
* Non-TPU backends: OFF (kernels are TPU-specific; jnp path is identical).
* Any TPU (direct or relay): compile+run a trivial kernel in a SUBPROCESS.
  The child carries its OWN deadline (SIGALRM -> exception -> clean exit) so
  the hung-compile case still tears the TPU client down properly — the
  parent NEVER kills a TPU-attached child (a killed client wedges the shared
  tunnel for minutes for every later attach; round-2 ops note). The parent
  timeout is a last resort an order of magnitude beyond the child's.

Verdict cache format (per key): {"ok": bool, "reason": str, "at": iso8601}.
Legacy bool entries from round 2 are still readable.

A cache MISS no longer blocks the caller: a provisional OFF verdict is
written and the probe runs in a DETACHED supervisor process that records the
final verdict when it completes (on a wedged tunnel that can take the full
PARENT_LAST_RESORT_S — previously the first caller stalled for all of it).
A stale provisional entry (supervisor died) is re-probed on the next call.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path
from typing import Optional

_VERDICT: Optional[bool] = None

CHILD_DEADLINE_S = 90
PARENT_LAST_RESORT_S = 900

_PROBE_CODE = f"""
import signal, sys

def _deadline(signum, frame):
    raise TimeoutError("mosaic compile exceeded {CHILD_DEADLINE_S}s")

signal.signal(signal.SIGALRM, _deadline)
signal.alarm({CHILD_DEADLINE_S})

import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :] * 2.0

try:
    x = jnp.ones((8, 128), jnp.float32)
    y = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert float(y[0, 0]) == 2.0
    signal.alarm(0)
    print("PALLAS_OK")
except TimeoutError as exc:
    # clean exit: the TPU client tears down normally, the tunnel stays healthy
    print("PALLAS_TIMEOUT", exc)
    sys.exit(0)
except Exception as exc:  # compile/runtime error — report, exit cleanly
    print("PALLAS_ERROR", type(exc).__name__, str(exc)[:300].replace(chr(10), " "))
    sys.exit(0)
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


def _write_verdict(
    data: dict, key: str, ok: bool, reason: str, provisional: bool = False
) -> None:
    import datetime

    data[key] = {
        "ok": ok,
        "reason": reason,
        "at": datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds"),
    }
    if provisional:
        data[key]["provisional"] = True
    cache = _cache_path()
    try:
        cache.parent.mkdir(parents=True, exist_ok=True)
        cache.write_text(json.dumps(data, indent=1))
    except OSError:
        pass


def _entry_age_s(entry: dict) -> float:
    import datetime

    try:
        at = datetime.datetime.fromisoformat(str(entry.get("at")))
        return (datetime.datetime.now(datetime.timezone.utc) - at).total_seconds()
    except (TypeError, ValueError):
        return 1e9


def _supervise(key: str) -> None:
    """Detached probe supervisor: runs the probe and records the FINAL
    verdict while the original caller has already moved on (it returned
    False on the provisional entry instead of blocking up to 15 min on a
    wedged tunnel, ADVICE r3). This process never imports jax itself —
    the TPU attach happens only in the probe child it spawns."""
    ok, reason = _run_probe()
    try:
        data = json.loads(_cache_path().read_text())
    except (OSError, json.JSONDecodeError):
        data = {}
    _write_verdict(data, key, ok, reason)


def _run_probe() -> tuple:
    """(ok, reason). Child self-deadlines via SIGALRM — but a Mosaic compile
    hung inside the tunnel's C++ RPC never returns to the interpreter, so the
    alarm may never fire. The parent therefore polls up to
    PARENT_LAST_RESORT_S and then ABANDONS the child (it eventually errors
    out of the RPC and exits cleanly on its own) — it never kills it: a
    killed TPU-attached process wedges the relay for every later attach
    (STATUS.md ops notes)."""
    import time as _time

    try:
        proc = subprocess.Popen(
            [sys.executable, "-c", _PROBE_CODE],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        deadline = _time.time() + PARENT_LAST_RESORT_S
        while _time.time() < deadline:
            if proc.poll() is not None:
                break
            _time.sleep(1.0)
        else:
            return False, (
                f"probe child hung past its {CHILD_DEADLINE_S}s deadline "
                f"(compile blocked in a native call where SIGALRM cannot "
                f"fire); abandoned after {PARENT_LAST_RESORT_S}s — left to "
                "exit on its own, not killed"
            )
    except OSError as exc:
        return False, f"probe child failed to launch: {exc}"
    out = proc.stdout.read() if proc.stdout else ""
    err = proc.stderr.read() if proc.stderr else ""
    if "PALLAS_OK" in out:
        return True, "probe kernel compiled and ran"
    for line in out.splitlines():
        if line.startswith(("PALLAS_TIMEOUT", "PALLAS_ERROR")):
            return False, line.strip()
    return False, f"probe exited rc={proc.returncode}: {err[-300:]}"


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

    cache = _cache_path()
    key = _cache_key()
    try:
        data = json.loads(cache.read_text())
    except (OSError, json.JSONDecodeError):
        data = {}
    if not os.environ.get("AUDIO_CUT_TPU_PALLAS_REPROBE"):
        entry = data.get(key)
        if isinstance(entry, dict):
            if entry.get("provisional") and _entry_age_s(entry) > (
                PARENT_LAST_RESORT_S + 120
            ):
                # a previous supervisor died before recording its verdict
                # (host restart, OOM) — fall through and probe again
                pass
            else:
                _VERDICT = bool(entry.get("ok"))
                return _VERDICT
        if isinstance(entry, bool):  # legacy round-2 format
            _VERDICT = entry
            return _VERDICT

    # cache miss: record a provisional OFF verdict and hand the actual probe
    # to a DETACHED supervisor — on a wedged tunnel the probe can block up to
    # PARENT_LAST_RESORT_S, and the first caller must not stall its startup
    # for that (ADVICE r3). The supervisor overwrites the entry when done;
    # until then (and on this process, for its lifetime) Pallas stays off —
    # the jnp paths are behavior-identical.
    _write_verdict(data, key, False, "probing in a detached supervisor", provisional=True)
    try:
        subprocess.Popen(
            [sys.executable, "-c",
             "from audio_cut_tpu.ops.pallas.probe import _supervise; "
             f"_supervise({key!r})"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            start_new_session=True,
        )
    except OSError:
        pass
    _VERDICT = False
    return _VERDICT
