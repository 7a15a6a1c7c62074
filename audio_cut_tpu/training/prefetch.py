"""Host-side batch prefetch for the training loops.

The synthetic batch generators (training/sep_data.py, training/rich_data.py)
are pure-NumPy host code; at the round-5 large geometry a 4x130k-sample rich
batch costs ~500 ms to synthesize while the TPU train step is ~350 ms — a
synchronous loop wastes more than half its wall-clock on the host. This
wrapper runs N generator instances on producer threads feeding a bounded
queue so data synthesis overlaps the device step (the reference's analogous
trick is pinned-buffer prefetch, reference src/audio_cut/utils/
gpu_pipeline.py:378-421; here the host/device overlap is the TPU-native
equivalent: the device step runs under XLA async dispatch while the queue
refills).

Threads hold no JAX state — they only build NumPy arrays — so there is no
interaction with the single-threaded dispatch path.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Tuple

import numpy as np

Batch = Tuple[np.ndarray, np.ndarray]


class PrefetchBatches:
    """Iterator yielding batches produced by `make_iter(seed)` instances on
    background threads.

    make_iter: called once per thread with a distinct integer seed; must
        return an infinite iterator of (mix, vocal) NumPy batches.
    threads: number of producer threads (>=1). With k threads the steady-state
        batch rate is ~k/datagen_cost; 2 is enough to hide a 500 ms generator
        behind a 350 ms device step.
    depth: bounded queue size (backpressure so producers never run far ahead
        of training — batches at the large window are ~4 MB each).

    Producers are daemon threads: the process may exit mid-epoch without
    joining them (training scripts budget by wall-clock, not epochs).
    """

    def __init__(self, make_iter: Callable[[int], Iterator[Batch]],
                 threads: int = 2, depth: int = 4, base_seed: int = 0):
        if threads < 1:
            raise ValueError("threads must be >= 1")
        self._q: "queue.Queue[Batch]" = queue.Queue(maxsize=max(depth, threads))
        self._stop = threading.Event()
        self._error: BaseException | None = None
        self._threads = []
        for i in range(threads):
            t = threading.Thread(
                target=self._produce, args=(make_iter, base_seed + i),
                daemon=True, name=f"batch-prefetch-{i}")
            t.start()
            self._threads.append(t)

    def _produce(self, make_iter, seed: int) -> None:
        # a generator exception must reach the train loop, not die silently
        # in a daemon thread: with every producer dead the consumer's
        # blocking get() would hang a TPU-attached run for its whole
        # --max-minutes budget producing nothing
        try:
            it = make_iter(seed)
            while not self._stop.is_set():
                batch = next(it)
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as exc:  # noqa: BLE001 - re-raised by __next__
            self._error = exc
            self._stop.set()

    def __iter__(self):
        return self

    def __next__(self) -> Batch:
        while True:
            try:
                return self._q.get(timeout=0.5)
            except queue.Empty:
                if self._error is not None:
                    raise RuntimeError(
                        "batch prefetch producer died") from self._error
                if self._stop.is_set():
                    raise StopIteration

    def close(self) -> None:
        self._stop.set()
