"""The headline invariant: splice reconstruction is EXACT (<=1e-12, bit-equal).

Parity: reference tests/unit/test_cpu_baseline_perfect_reconstruction.py.
"""

import numpy as np

from audio_cut_tpu.pipeline.split import split_at_sample_level


def test_perfect_reconstruction_ramp():
    sr = 44100
    audio = np.linspace(-1.0, 1.0, sr * 7, dtype=np.float32)
    cuts = [0, 12345, 123456, 200001, len(audio)]
    segments, _, _ = split_at_sample_level(audio, cuts, sr)
    recon = np.concatenate(segments)
    assert recon.shape == audio.shape
    assert np.array_equal(recon, audio)  # bit-exact, stronger than <=1e-12


def test_reconstruction_with_tiny_fragment_carry():
    sr = 44100
    audio = np.random.default_rng(0).standard_normal(sr * 3).astype(np.float32)
    # 100-sample fragment (< 10 ms) must be carried, never dropped
    cuts = [0, 50000, 50100, len(audio)]
    segments, flags, _ = split_at_sample_level(
        audio, cuts, sr, segment_flags=[True, False, False]
    )
    recon = np.concatenate(segments)
    assert np.array_equal(recon, audio)
    assert len(segments) == 2  # fragment merged into the following segment
    # flag OR-merge: fragment was False, next False -> second stays False; first True
    assert flags == [True, False]


def test_trailing_fragment_joins_last_segment():
    sr = 44100
    audio = np.arange(sr, dtype=np.float32)
    cuts = [0, sr - 200, sr]  # trailing 200-sample fragment
    segments, _, _ = split_at_sample_level(audio, cuts, sr)
    assert len(segments) == 1
    assert np.array_equal(segments[0], audio)


def test_flags_or_merge_on_carry():
    sr = 44100
    audio = np.ones(sr, dtype=np.float32)
    cuts = [0, 100, sr]  # leading fragment flagged True merges into big False segment
    segments, flags, _ = split_at_sample_level(audio, cuts, sr, segment_flags=[True, False])
    assert len(segments) == 1
    assert flags == [True]
    assert np.array_equal(np.concatenate(segments), audio)
