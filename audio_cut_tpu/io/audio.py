"""Audio load/save/resample helpers (host side).

Parity: reference src/vocal_smart_splitter/utils/audio_processor.py:17-323
(librosa load with mono + target SR + optional normalize) and
audio_resample.py:27-46 (16 kHz mono detection copies). librosa is not
available here; decoding is our own WAV codec and resampling is polyphase
(scipy.signal.resample_poly), which matches librosa's ``res_type='polyphase'``.
"""

from __future__ import annotations

import logging
import math
from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np
from scipy import signal as _signal

from audio_cut_tpu.exceptions import AudioIOError
from audio_cut_tpu.io.wavio import read_wav, write_wav

logger = logging.getLogger(__name__)

_SUPPORTED_EXTS = {".wav", ".wave"}
_FFMPEG_EXTS = {".mp3", ".flac", ".m4a", ".mp4", ".ogg", ".opus", ".aac", ".wma"}
_UNSUPPORTED_HINT = (
    "cannot decode {src}: no ffmpeg on PATH and no {ext} decoder is bundled; "
    "install ffmpeg or convert with `ffmpeg -i {src} -acodec pcm_s24le out.wav` first"
)


def ffmpeg_available() -> bool:
    import shutil

    return shutil.which("ffmpeg") is not None


def _decode_via_ffmpeg(path: Path) -> Tuple[np.ndarray, int]:
    """Decode a compressed file through an ffmpeg subprocess to raw float32.

    Parity: the reference accepts mp3/wav/flac/m4a via librosa/audioread
    (reference src/vocal_smart_splitter/utils/audio_processor.py:45; CLI
    examples are .mp3, run_splitter.py:59-62). This mirrors the export-side
    ffmpeg gating in io/export.py — a host-process seam, no new libraries.
    """
    import json
    import subprocess

    probe = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "a:0",
         "-show_entries", "stream=sample_rate,channels", "-of", "json", str(path)],
        capture_output=True,
    )
    sr, channels = 44100, 2
    if probe.returncode == 0:
        try:
            info = json.loads(probe.stdout)["streams"][0]
            sr = int(info.get("sample_rate", sr))
            channels = int(info.get("channels", channels))
        except (KeyError, IndexError, ValueError, json.JSONDecodeError):
            pass
    proc = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", str(path),
         "-f", "f32le", "-acodec", "pcm_f32le", "-"],
        capture_output=True,
    )
    if proc.returncode != 0:
        raise AudioIOError(
            f"ffmpeg failed to decode {path.name}: {proc.stderr.decode(errors='replace')[:300]}"
        )
    flat = np.frombuffer(proc.stdout, dtype="<f4")
    if channels > 1:
        flat = flat[: (flat.size // channels) * channels].reshape(-1, channels)
    return flat.astype(np.float32), sr


def to_mono(audio: np.ndarray) -> np.ndarray:
    if audio.ndim == 1:
        return audio
    return np.mean(audio, axis=-1, dtype=np.float32)


def resample_poly(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resample along the time axis (axis 0).

    float32 end-to-end: the float64 round-trip doubled both memory traffic
    and filter cost on multi-minute tracks for no audible benefit.
    """
    if sr_in == sr_out:
        return audio
    g = math.gcd(int(sr_in), int(sr_out))
    up, down = sr_out // g, sr_in // g
    out = _signal.resample_poly(np.asarray(audio, dtype=np.float32), up, down, axis=0)
    return np.asarray(out, dtype=np.float32)


def load_audio(
    path: Union[str, Path],
    target_sr: Optional[int] = None,
    mono: bool = True,
    normalize: bool = False,
) -> Tuple[np.ndarray, int]:
    """Load an audio file as float32, optionally mono/resampled/normalized."""
    p = Path(path)
    if not p.exists():
        raise AudioIOError(f"audio file not found: {p}")
    ext = p.suffix.lower()
    if ext in _SUPPORTED_EXTS:
        audio, sr = read_wav(p)
    elif ext in _FFMPEG_EXTS:
        if not ffmpeg_available():
            raise AudioIOError(_UNSUPPORTED_HINT.format(src=p.name, ext=ext))
        audio, sr = _decode_via_ffmpeg(p)
    else:
        raise AudioIOError(
            f"unsupported audio format {ext!r} for {p.name}; "
            f"supported: wav natively, {sorted(_FFMPEG_EXTS)} via ffmpeg"
        )
    if mono:
        audio = to_mono(audio)
    if target_sr is not None and target_sr != sr:
        audio = resample_poly(audio, sr, target_sr)
        sr = int(target_sr)
    if normalize:
        peak = float(np.max(np.abs(audio))) if audio.size else 0.0
        if peak > 0:
            audio = audio / peak
    return np.ascontiguousarray(audio, dtype=np.float32), sr


def save_audio(
    path: Union[str, Path],
    audio: np.ndarray,
    sample_rate: int,
    subtype: str = "PCM_24",
) -> str:
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    write_wav(p, audio, sample_rate, subtype=subtype)
    return str(p)


def write_asr_copy(
    audio: np.ndarray,
    sample_rate: int,
    dest: Union[str, Path],
    asr_sr: int = 16000,
) -> str:
    """Write a 16 kHz mono PCM_16 detection copy for ASR workers."""
    mono = to_mono(np.asarray(audio, dtype=np.float32))
    res = resample_poly(mono, sample_rate, asr_sr)
    return save_audio(dest, res, asr_sr, subtype="PCM_16")


_ASR_COPY_FNS: dict = {}


def _asr_copy_fn(sample_rate: int, asr_sr: int):
    """Jitted resample+PCM16 program, cached per (sr_in, sr_out) — a fresh
    closure per call would recompile for every track (XLA also re-specializes
    per input length, which track-length bucketing keeps bounded)."""
    key = (sample_rate, asr_sr)
    if key not in _ASR_COPY_FNS:
        import jax

        from audio_cut_tpu.ops.pcm import pcm16_pack_graph
        from audio_cut_tpu.ops.resample import resample_graph

        _ASR_COPY_FNS[key] = jax.jit(
            lambda x: pcm16_pack_graph(resample_graph(x, sample_rate, asr_sr))
        )
    return _ASR_COPY_FNS[key]


def write_asr_copy_from_device(
    audio_device,
    sample_rate: int,
    dest: Union[str, Path],
    asr_sr: int = 16000,
) -> str:
    """Device-side ASR copy: resample to 16 kHz on the MXU (ops/resample.py)
    and quantize to PCM_16 on the VPU, so only int16 @ 16 kHz crosses the
    tunnel (~5.5x fewer bytes than the float stem the host path needs).
    The anti-alias filter differs slightly from the host's scipy polyphase
    (windowed-sinc+linear-interp vs kaiser) — both are valid detection
    copies; ASR output is insensitive at this level (>40 dB agreement)."""
    import jax.numpy as jnp

    from audio_cut_tpu.io.wavio import write_wav_payload
    from audio_cut_tpu.separation.engine import padded_track_len

    # bucket-pad so the jitted program re-specializes per length bucket, not
    # per exact track length (same buckets as the OLA program); the zero
    # tail's filter bleed lies beyond out_len, so slicing on the host is exact
    n = int(audio_device.shape[-1])
    padded = padded_track_len(n, sample_rate)
    out_len = int(round(n * asr_sr / sample_rate))
    xp = jnp.pad(audio_device, (0, padded - n)) if padded != n else audio_device
    i16 = np.asarray(_asr_copy_fn(sample_rate, asr_sr)(xp))[:out_len]
    p = Path(dest)
    p.parent.mkdir(parents=True, exist_ok=True)
    write_wav_payload(p, i16.astype("<i2").tobytes(), asr_sr, bits=16, channels=1)
    return str(p)


def find_zero_crossings(audio: np.ndarray) -> np.ndarray:
    """Indices i where audio[i-1] and audio[i] straddle zero."""
    a = np.asarray(audio)
    return np.nonzero(np.signbit(a[:-1]) != np.signbit(a[1:]))[0] + 1


def apply_fades(audio: np.ndarray, sr: int, fade_in_s: float = 0.0, fade_out_s: float = 0.0) -> np.ndarray:
    out = np.array(audio, dtype=np.float32, copy=True)
    n_in = int(round(fade_in_s * sr))
    n_out = int(round(fade_out_s * sr))
    if n_in > 0:
        n_in = min(n_in, out.shape[0])
        out[:n_in] *= np.linspace(0.0, 1.0, n_in, dtype=np.float32)
    if n_out > 0:
        n_out = min(n_out, out.shape[0])
        out[-n_out:] *= np.linspace(1.0, 0.0, n_out, dtype=np.float32)
    return out
