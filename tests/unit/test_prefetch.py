"""training/prefetch.py — producer threads must fail loudly, not hang.

A generator exception used to die silently in the daemon thread, leaving the
train loop blocked in Queue.get() for its whole --max-minutes budget.
"""
import numpy as np
import pytest

from audio_cut_tpu.training.prefetch import PrefetchBatches


def _ok_iter(seed):
    rng = np.random.default_rng(seed)
    while True:
        yield rng.standard_normal(4), rng.standard_normal(4)


def test_prefetch_yields_batches():
    pf = PrefetchBatches(_ok_iter, threads=2, depth=2)
    try:
        for _ in range(6):
            mix, voc = next(pf)
            assert mix.shape == (4,)
    finally:
        pf.close()


def test_prefetch_dead_producer_raises_instead_of_hanging():
    def dying_iter(seed):
        yield np.zeros(4), np.zeros(4)
        raise ValueError("generator blew up")

    pf = PrefetchBatches(dying_iter, threads=1, depth=2)
    next(pf)  # the one good batch drains first
    with pytest.raises(RuntimeError, match="producer died") as ei:
        for _ in range(3):
            next(pf)
    assert isinstance(ei.value.__cause__, ValueError)


def test_prefetch_close_stops_iteration():
    pf = PrefetchBatches(_ok_iter, threads=1, depth=1)
    next(pf)
    pf.close()
    with pytest.raises(StopIteration):
        while True:
            next(pf)
