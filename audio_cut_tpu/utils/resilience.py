"""Device-runtime failure resilience.

The reference survives mid-run device failures by rebuilding its ORT session
on CPU (reference src/audio_cut/separation/backends.py:234-244, 366-371) and
retrying fp16 VAD in fp32. The TPU analog implemented here: JAX runtime
errors (e.g. a wedged tunnel raising FAILED_PRECONDITION during device_put)
are classified, retried once after a backoff, and finally re-run under the
always-available CPU backend via ``jax.default_device`` — jitted programs
recompile transparently for the CPU placement, so the same compute path
serves as its own fallback.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Optional

logger = logging.getLogger(__name__)

_DEVICE_ERROR_MARKERS = (
    "FAILED_PRECONDITION",
    "RESOURCE_EXHAUSTED",
    "DEADLINE_EXCEEDED",
    "UNAVAILABLE",
    "INTERNAL",
    "ABORTED",
    "DataLoss",
    "TPU backend error",
)

_DEVICE_ERROR_TYPES = ("XlaRuntimeError", "JaxRuntimeError")


def is_device_runtime_error(exc: BaseException) -> bool:
    """True when the exception looks like a device/runtime failure (not a bug).

    Programming errors (TypeError, shape mismatches, tracer leaks) must NOT be
    retried — only errors raised by the XLA runtime / transfer layer.
    """
    for e in _iter_chain(exc):
        name = type(e).__name__
        if name in _DEVICE_ERROR_TYPES:
            return True
        if name == "RuntimeError" or "Error" in name:
            msg = str(e)
            if any(marker in msg for marker in _DEVICE_ERROR_MARKERS):
                return True
    return False


def _iter_chain(exc: BaseException):
    seen = set()
    while exc is not None and id(exc) not in seen:
        seen.add(id(exc))
        yield exc
        exc = exc.__cause__ or exc.__context__


def cpu_device() -> Optional[Any]:
    """The always-available JAX CPU device, or None if even that fails."""
    import jax

    try:
        return jax.devices("cpu")[0]
    except Exception:  # pragma: no cover - CPU backend should always exist
        return None


def default_is_cpu() -> bool:
    import jax

    try:
        return jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover
        return False


def run_with_device_fallback(
    thunk: Callable[[], Any],
    *,
    label: str,
    retries: Optional[int] = None,
    backoff_s: Optional[float] = None,
    cpu_fallback: bool = True,
):
    """Run ``thunk`` with device-runtime retry + CPU fallback.

    ``thunk`` must build its own device arrays from HOST data each call, so a
    retry re-uploads fresh buffers (a poisoned device array from a failed
    transfer must not be reused) and the CPU attempt places inputs on CPU.

    Raises the original exception when it is not a device-runtime error, or
    when every attempt (including CPU) failed.
    """
    from audio_cut_tpu.config import get_config

    if retries is None:
        retries = int(get_config("device_pipeline.runtime_retries", 1))
    if backoff_s is None:
        backoff_s = float(get_config("device_pipeline.retry_backoff_s", 10.0))

    try:
        return thunk()
    except Exception as exc:
        if not is_device_runtime_error(exc):
            raise
        last = exc
        logger.warning("%s: device runtime error (%s)", label, exc)

    for attempt in range(max(0, retries)):
        # the tunnel-attached TPU recovers on the order of tens of seconds
        # after a wedge; give it a chance before abandoning the accelerator
        time.sleep(backoff_s * (attempt + 1))
        try:
            return thunk()
        except Exception as exc:
            if not is_device_runtime_error(exc):
                raise
            last = exc
            logger.warning("%s: retry %d failed (%s)", label, attempt + 1, exc)

    if cpu_fallback and not default_is_cpu():
        import jax

        cpu = cpu_device()
        if cpu is not None:
            logger.warning("%s: falling back to CPU execution", label)
            with jax.default_device(cpu):
                return thunk()
    raise last
