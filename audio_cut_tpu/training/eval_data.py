"""Out-of-distribution synthetic eval set for the packaged models.

The training generator (training/sep_data.py) defines one family of vocal
and instrumental timbres; quality numbers measured on held-out draws from
the SAME family overstate real-music behavior (VERDICT r2 weak #3). This
module generates mixtures from a deliberately DIFFERENT family:

* vocals — stepped note melodies (not glides) with sawtooth-ish rolloff,
  out-of-band vibrato rates, square-ish syllable gating, detuned unison
  ("choir") layers, darker/brighter formant sets;
* instrumentals — Karplus-Strong plucked arpeggios, hi-hat noise bursts,
  bowed-string pads WITH vibrato (an adversarial cue: vibrato is a vocal
  marker in the training family), wider tempo range;
* channel — exponential-decay noise reverb, spectral tilt, soft
  saturation, pink-noise floor.

Used by scripts/eval_models_diverse.py to report ConvTDF SI-SNR and ConvVAD
frame F1 on material the training distribution never produced.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

SR = 44100

# darker + brighter vowel colors than the training set's five
_EVAL_FORMANTS = [(600, 900), (300, 2700), (500, 1500), (350, 3000)]

_SCALE = np.array([0, 2, 3, 5, 7, 8, 10])  # natural minor — training used glides


def _note_seq(rng: np.random.Generator, n: int) -> np.ndarray:
    """Stepped melody f0 contour (semitone grid, per-note portamento)."""
    base = rng.uniform(130, 350)
    t_note = rng.uniform(0.18, 0.45)
    n_notes = max(1, int(n / SR / t_note))
    degrees = rng.choice(_SCALE, size=n_notes) + 12 * rng.integers(0, 2, size=n_notes)
    f0 = np.repeat(base * 2 ** (degrees / 12.0), int(t_note * SR))[:n]
    if f0.size < n:
        f0 = np.pad(f0, (0, n - f0.size), mode="edge")
    # short portamento between notes (5 ms boxcar smoothing)
    k = max(1, int(0.005 * SR))
    return np.convolve(f0, np.ones(k) / k, mode="same")


def eval_vocal_stem(rng: np.random.Generator, n: int) -> np.ndarray:
    """Choir-layered stepped-melody vocal with square-ish syllables."""
    t = np.arange(n) / SR
    out = np.zeros(n, np.float32)
    pos = int(rng.uniform(0, 0.5) * SR)
    while pos < n - int(0.3 * SR):
        pn = min(int(rng.uniform(0.6, 2.8) * SR), n - pos)
        f0 = _note_seq(rng, pn)
        vib_rate = rng.choice([rng.uniform(3.0, 4.2), rng.uniform(7.0, 9.0)])
        f0 = f0 * (1 + rng.uniform(0.005, 0.02)
                   * np.sin(2 * np.pi * vib_rate * t[:pn] + rng.uniform(0, 6.28)))
        f1, f2 = _EVAL_FORMANTS[rng.integers(len(_EVAL_FORMANTS))]
        x = np.zeros(pn)
        for detune in (1.0, rng.uniform(0.994, 0.999), rng.uniform(1.001, 1.006)):
            phase = 2 * np.pi * np.cumsum(f0 * detune) / SR
            for h in range(1, 14):
                fh = h * float(np.median(f0))
                if fh > SR / 2 - 2000:
                    break
                gain = (1.0 + 2.0 * np.exp(-0.5 * ((fh - f1) / 150.0) ** 2)
                        + 1.5 * np.exp(-0.5 * ((fh - f2) / 220.0) ** 2)) / h ** 0.8
                x += gain * np.sin(h * phase + rng.uniform(0, 6.28))
        # square-ish syllable gate (training used clipped sine AM)
        syl = rng.uniform(1.8, 4.5)
        gate = (np.sin(2 * np.pi * syl * t[:pn] + rng.uniform(0, 6.28)) > -0.4)
        gate = np.convolve(gate.astype(float), np.ones(221) / 221, mode="same")
        edge = np.minimum(1.0, np.minimum(np.arange(pn), pn - np.arange(pn)) / (0.02 * SR))
        out[pos:pos + pn] += (rng.uniform(0.2, 0.5) * x * (0.25 + 0.75 * gate) * edge
                              ).astype(np.float32)
        pos += pn + int(rng.uniform(0.2, 1.5) * SR)
    return out / max(1.0, float(np.abs(out).max()))


def _karplus(rng: np.random.Generator, freq: float, n: int) -> np.ndarray:
    """Karplus-Strong plucked string."""
    period = max(2, int(SR / freq))
    buf = rng.standard_normal(period)
    out = np.empty(n)
    for i in range(n):
        j = i % period
        out[i] = buf[j]
        buf[j] = 0.996 * 0.5 * (buf[j] + buf[(j + 1) % period])
    return out


def eval_instrumental_stem(rng: np.random.Generator, n: int) -> np.ndarray:
    """Plucked arpeggios + hi-hats + vibrato string pad."""
    t = np.arange(n) / SR
    out = np.zeros(n, np.float32)
    period = rng.uniform(0.2, 0.8)  # wider tempo range than training
    root = rng.uniform(80, 260)
    arp = [root * 2 ** (d / 12.0) for d in (0, 3, 7, 12)]
    k = 0
    for onset in np.arange(rng.uniform(0, period), n / SR - 0.05, period / 2):
        i = int(onset * SR)
        pn = min(int(rng.uniform(0.15, 0.4) * SR), n - i)
        if pn <= 0:
            continue
        out[i:i + pn] += (rng.uniform(0.1, 0.3)
                          * _karplus(rng, arp[k % len(arp)], pn)).astype(np.float32)
        k += 1
    # hi-hats: high-passed noise bursts off the beat
    for onset in np.arange(rng.uniform(0, period) + period / 4, n / SR - 0.05, period):
        i = int(onset * SR)
        hn = min(int(0.03 * SR), n - i)
        burst = rng.standard_normal(hn) * np.exp(-np.arange(hn) / (0.004 * SR))
        out[i:i + hn] += (rng.uniform(0.08, 0.2) * np.diff(burst, prepend=0.0)
                          ).astype(np.float32)
    # bowed pad WITH vibrato — adversarial for vibrato-keyed vocal detection
    pad_f = root * rng.choice([1.0, 1.5])
    vib = 1 + 0.012 * np.sin(2 * np.pi * 5.2 * t + rng.uniform(0, 6.28))
    phase = 2 * np.pi * np.cumsum(pad_f * vib) / SR
    pad = sum(np.sin(h * phase + rng.uniform(0, 6.28)) / h ** 1.4 for h in range(1, 7))
    out += (rng.uniform(0.05, 0.16) * pad
            * (0.6 + 0.4 * np.sin(2 * np.pi * 0.11 * t))).astype(np.float32)
    return out / max(1.0, float(np.abs(out).max()))


def _reverb(rng: np.random.Generator, x: np.ndarray, wet: float) -> np.ndarray:
    ir_n = int(rng.uniform(0.15, 0.45) * SR)
    ir = rng.standard_normal(ir_n) * np.exp(-np.arange(ir_n) / (0.08 * SR))
    ir[0] = 1.0
    n = x.size
    m = 1 << int(np.ceil(np.log2(n + ir_n)))
    y = np.fft.irfft(np.fft.rfft(x, m) * np.fft.rfft(ir, m), m)[:n]
    y = y / max(1e-9, float(np.abs(y).max())) * float(np.abs(x).max())
    return ((1 - wet) * x + wet * y).astype(np.float32)


def eval_pair(rng: np.random.Generator, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """One OOD (mix, vocal) pair with channel effects on the mix bus.

    The reverb/saturation are applied per-stem (so the vocal reference
    includes the vocal's own reverb tail — the realistic target)."""
    vocal = eval_vocal_stem(rng, n)
    inst = eval_instrumental_stem(rng, n) * rng.uniform(0.6, 1.8)
    if rng.random() < 0.8:
        vocal = _reverb(rng, vocal, wet=rng.uniform(0.1, 0.35))
        inst = _reverb(rng, inst, wet=rng.uniform(0.05, 0.3))
    mix = vocal + inst
    # soft saturation + pink-ish noise floor on the bus
    drive = rng.uniform(1.0, 2.2)
    sat = np.tanh(mix * drive) / drive
    vocal = vocal + (sat - mix) * 0.5          # attribute half the nonlinearity
    mix = sat + (rng.standard_normal(n) * rng.uniform(0.001, 0.004)
                 * np.cumsum(rng.standard_normal(n)) / np.sqrt(np.arange(1, n + 1))
                 ).astype(np.float32) * 0.05
    peak = max(float(np.abs(mix).max()), 1e-6)
    if peak > 1.0:
        mix, vocal = mix / peak, vocal / peak
    return mix.astype(np.float32), vocal.astype(np.float32)


def vocal_activity_frames(vocal: np.ndarray, frame: int, hop: int,
                          rel_db: float = -35.0) -> np.ndarray:
    """Ground-truth voice-activity labels from the clean vocal stem."""
    n_frames = max(1, (vocal.size - frame) // hop + 1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame)[None, :]
    rms = np.sqrt(np.mean(vocal[np.minimum(idx, vocal.size - 1)] ** 2, axis=-1))
    peak = max(float(rms.max()), 1e-9)
    return (20 * np.log10(rms / peak + 1e-12) > rel_db).astype(np.int32)
