"""Out-of-distribution eval generator (training/eval_data.py) contracts."""

import numpy as np

from audio_cut_tpu.training.eval_data import (
    SR,
    eval_instrumental_stem,
    eval_pair,
    eval_vocal_stem,
    vocal_activity_frames,
)


def test_eval_pair_contract():
    rng = np.random.default_rng(3)
    n = 3 * SR
    mix, vocal = eval_pair(rng, n)
    assert mix.shape == vocal.shape == (n,)
    assert mix.dtype == vocal.dtype == np.float32
    assert np.all(np.isfinite(mix)) and np.all(np.isfinite(vocal))
    assert float(np.abs(mix).max()) <= 1.0 + 1e-6
    # the instrumental residue is substantial (vocal != mix)
    resid = mix - vocal
    assert float(np.sqrt(np.mean(resid ** 2))) > 0.02


def test_eval_pair_deterministic():
    a1 = eval_pair(np.random.default_rng(7), SR)[0]
    a2 = eval_pair(np.random.default_rng(7), SR)[0]
    np.testing.assert_array_equal(a1, a2)


def test_vocal_has_phrase_structure():
    rng = np.random.default_rng(11)
    vocal = eval_vocal_stem(rng, 6 * SR)
    labels = vocal_activity_frames(vocal, frame=1411, hop=1411)
    # phrases and rests both present
    assert 0.15 < labels.mean() < 0.95
    # at least one transition (phrase boundaries exist)
    assert int(np.abs(np.diff(labels)).sum()) >= 2


def test_instrumental_is_not_silence():
    rng = np.random.default_rng(13)
    inst = eval_instrumental_stem(rng, 2 * SR)
    assert float(np.sqrt(np.mean(inst ** 2))) > 0.01
