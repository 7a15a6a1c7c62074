"""Widened rich training families (training/rich_data.py): shape/sanity and
class-property checks; the OOD eval family must stay disjoint (eval_data.py
is never imported here or by rich_data)."""

import numpy as np

from audio_cut_tpu.training import rich_data as rd

SR = 44100
N = SR * 3


def test_pair_contract():
    rng = np.random.default_rng(7)
    for _ in range(20):
        mix, vocal = rd.synth_pair_rich(rng, N)
        assert mix.shape == vocal.shape == (N,)
        assert mix.dtype == vocal.dtype == np.float32
        assert np.isfinite(mix).all() and np.isfinite(vocal).all()
        assert np.abs(mix).max() <= 1.0 + 1e-6


def test_every_instrument_class_emits_audio():
    rng = np.random.default_rng(11)
    for fn in rd._INST_CLASSES:
        x = fn(rng, N)
        assert x.shape == (N,) and np.isfinite(x).all(), fn.__name__
        assert float(np.abs(x).max()) > 1e-4, f"{fn.__name__} produced silence"


def test_whisper_is_unvoiced():
    """The whisper class must have no dominant harmonic line (spectral
    flatness well above any voiced class)."""
    rng = np.random.default_rng(3)

    def flatness(x):
        mag = np.abs(np.fft.rfft(x * np.hanning(x.size))) + 1e-12
        band = mag[(np.fft.rfftfreq(x.size, 1 / SR) > 300)
                   & (np.fft.rfftfreq(x.size, 1 / SR) < 6000)]
        return float(np.exp(np.mean(np.log(band))) / np.mean(band))

    w = rd._vocal_whisper(rng, N)
    assert flatness(w) > 0.1
    # among several rich draws, at least one clearly voiced (harmonic) class
    # must sit far below the whisper's flatness
    voiced = [flatness(rd._vocal_rich(np.random.default_rng(s), N))
              for s in range(8)]
    assert min(voiced) < 0.5 * flatness(w)


def test_rich_batches_mixes_families():
    rng = np.random.default_rng(0)
    mixes, vocals = next(rd.rich_batches(SR, 6, rng))
    assert mixes.shape == vocals.shape == (6, SR)
    assert np.isfinite(mixes).all() and np.isfinite(vocals).all()


def test_arrangement_pair_contract_and_pauses():
    """Full-arrangement pairs: valid (mix, vocal), instrumental present, and
    true vocal rest bars (the pause floor the cut guards search)."""
    rng = np.random.default_rng(21)
    for _ in range(5):
        mix, vocal = rd.synth_pair_arrangement(rng, SR * 6)
        assert mix.shape == vocal.shape == (SR * 6,)
        assert mix.dtype == vocal.dtype == np.float32
        assert np.abs(mix).max() <= 1.0 + 1e-6
        inst = mix - vocal
        assert float(np.sqrt((inst ** 2).mean())) > 1e-3  # band actually plays
        env = np.convolve(vocal ** 2, np.ones(2205) / 2205, "same")
        pause_frac = float((env < 1e-6).mean())
        assert pause_frac > 0.1, "arrangement vocals must have true rests"
        assert pause_frac < 0.95, "arrangement vocals must actually sing"


def test_legato_is_continuous():
    """The sung-vowel class must hold without syllable gaps: its envelope
    never collapses to silence mid-note (unlike the gated classes)."""
    rng = np.random.default_rng(5)
    v = rd._vocal_legato(rng, N)
    env = np.convolve(v ** 2, np.ones(4410) / 4410, "same")
    core = env[SR // 2 : -SR // 2]  # skip attack/release
    assert float(core.min()) > 0.01 * float(core.max())


def test_hard_augmentation_contract():
    rng = np.random.default_rng(13)
    mix, vocal = rd.synth_pair_arrangement(rng, SR * 4)
    for _ in range(6):
        m2, v2 = rd.augment_pair_hard(rng, mix.copy(), vocal.copy())
        assert m2.shape == mix.shape and v2.shape == vocal.shape
        assert np.isfinite(m2).all() and np.isfinite(v2).all()
        assert np.abs(m2).max() <= 1.0 + 1e-6


def test_crowd_bed_is_unpitched():
    rng = np.random.default_rng(17)
    c = rd._crowd_bed(rng, N)
    mag = np.abs(np.fft.rfft(c * np.hanning(c.size))) + 1e-12
    band = mag[(np.fft.rfftfreq(c.size, 1 / SR) > 200)
               & (np.fft.rfftfreq(c.size, 1 / SR) < 4000)]
    flatness = float(np.exp(np.mean(np.log(band))) / np.mean(band))
    assert flatness > 0.05, "crowd bed must not carry a tonal line"
