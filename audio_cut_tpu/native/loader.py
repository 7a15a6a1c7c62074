"""Compile-on-demand ctypes loader for the native PCM codec."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "pcm_codec.cpp"
_LIB = _DIR / "_pcm_codec.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O3", "-fPIC", "-shared", "-std=c++17",
           str(_SRC), "-o", str(_LIB)]
    tmp_path = None
    try:
        # build into a temp file first: another process may be racing us
        with tempfile.NamedTemporaryFile(dir=_DIR, suffix=".so", delete=False) as tmp:
            tmp_path = tmp.name
        cmd[-1] = tmp_path
        proc = subprocess.run(cmd, capture_output=True, timeout=120)
        if proc.returncode != 0:
            logger.warning("native codec build failed: %s", proc.stderr.decode()[:300])
            os.unlink(tmp_path)
            return False
        os.replace(tmp_path, _LIB)
        return True
    except (OSError, subprocess.TimeoutExpired) as exc:
        logger.warning("native codec build unavailable: %s", exc)
        if tmp_path is not None:
            try:
                os.unlink(tmp_path)
            except OSError:
                pass
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError as exc:
            logger.warning("native codec load failed: %s", exc)
            _load_failed = True
            return None
        c_float_p = ctypes.POINTER(ctypes.c_float)
        c_u8_p = ctypes.POINTER(ctypes.c_ubyte)
        c_i16_p = ctypes.POINTER(ctypes.c_int16)
        lib.pcm24_encode.argtypes = [c_float_p, ctypes.c_long, c_u8_p]
        lib.pcm24_encode.restype = ctypes.c_long
        lib.pcm24_decode.argtypes = [c_u8_p, ctypes.c_long, c_float_p]
        lib.pcm24_decode.restype = ctypes.c_long
        lib.pcm16_encode.argtypes = [c_float_p, ctypes.c_long, c_i16_p]
        lib.pcm16_encode.restype = ctypes.c_long
        lib.pcm16_decode.argtypes = [c_i16_p, ctypes.c_long, c_float_p]
        lib.pcm16_decode.restype = ctypes.c_long
        lib.peak_rms_scan.argtypes = [c_float_p, ctypes.c_long,
                                      c_float_p, ctypes.POINTER(ctypes.c_double)]
        lib.peak_rms_scan.restype = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


class PcmCodec:
    """float32 <-> PCM byte conversion, native when possible."""

    def __init__(self) -> None:
        self._lib = _load()

    @property
    def is_native(self) -> bool:
        return self._lib is not None

    def encode_pcm24(self, audio: np.ndarray) -> bytes:
        flat = np.ascontiguousarray(audio, dtype=np.float32).reshape(-1)
        if self._lib is not None:
            out = np.empty(flat.size * 3, dtype=np.uint8)
            self._lib.pcm24_encode(
                flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                flat.size,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            )
            return out.tobytes()
        scaled = np.round(np.clip(flat, -1.0, 1.0).astype(np.float64) * 8388607.0).astype("<i4")
        as32 = scaled.view(np.uint8).reshape(-1, 4)
        return np.ascontiguousarray(as32[:, :3]).tobytes()

    def decode_pcm24(self, data: bytes) -> np.ndarray:
        n = len(data) // 3
        if self._lib is not None:
            src = np.frombuffer(data, dtype=np.uint8, count=n * 3)
            out = np.empty(n, dtype=np.float32)
            self._lib.pcm24_decode(
                src.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                n,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            return out
        b = np.frombuffer(data, dtype=np.uint8, count=n * 3).reshape(-1, 3)
        v = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        v = (v ^ 0x800000) - 0x800000
        return (v.astype(np.float64) / 8388607.0).astype(np.float32)

    def encode_pcm16(self, audio: np.ndarray) -> bytes:
        flat = np.ascontiguousarray(audio, dtype=np.float32).reshape(-1)
        if self._lib is not None:
            out = np.empty(flat.size, dtype="<i2")
            self._lib.pcm16_encode(
                flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                flat.size,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            )
            return out.tobytes()
        return np.round(np.clip(flat, -1, 1) * 32767.0).astype("<i2").tobytes()

    def peak_rms(self, audio: np.ndarray) -> Tuple[float, float]:
        flat = np.ascontiguousarray(audio, dtype=np.float32).reshape(-1)
        if flat.size == 0:
            return 0.0, 0.0
        if self._lib is not None:
            peak = ctypes.c_float()
            sumsq = ctypes.c_double()
            self._lib.peak_rms_scan(
                flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                flat.size, ctypes.byref(peak), ctypes.byref(sumsq),
            )
            return float(peak.value), float(np.sqrt(sumsq.value / flat.size))
        return float(np.abs(flat).max()), float(np.sqrt(np.mean(np.square(flat))))


_codec: Optional[PcmCodec] = None


def get_pcm_codec() -> PcmCodec:
    global _codec
    if _codec is None:
        _codec = PcmCodec()
    return _codec
