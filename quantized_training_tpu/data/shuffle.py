"""Double-buffer shuffle with snapshotting (data/utils.py:19-67 semantics)
plus a simple stateful batcher replacing torchdata's StatefulDataLoader."""

from __future__ import annotations

import numpy as np


class ShuffleDataset:
    """Two-buffer shuffle: buffer2 fills; when full it is shuffled and
    swapped into buffer1, which drains one sample per step — maintaining
    len(b1)+len(b2) == buffer_size - 1 (data/utils.py:28-50)."""

    def __init__(self, ds, buffer_size: int = 1000, seed: int = 2024) -> None:
        self.ds = ds
        self.buffer_size = buffer_size
        self._rng = np.random.Generator(np.random.PCG64(seed))
        self._buffer1: list = []
        self._buffer2: list = []

    def __iter__(self):
        for sample in self.ds:
            self._buffer2.append(sample)
            if len(self._buffer2) == self.buffer_size:
                self._buffer2 = self._shuffle(self._buffer2)
                self._buffer1, self._buffer2 = self._buffer2, self._buffer1
            if self._buffer1:
                yield self._buffer1.pop()

        while self._buffer1:
            yield self._buffer1.pop()
        self._buffer2 = self._shuffle(self._buffer2)
        while self._buffer2:
            yield self._buffer2.pop()

    def _shuffle(self, buffer: list) -> list:
        idx = self._rng.permutation(len(buffer))
        return [buffer[i] for i in idx]

    def state_dict(self) -> dict:
        return dict(
            ds=self.ds.state_dict(),
            rng=self._rng.bit_generator.state,
            _buffer1=list(self._buffer1),
            _buffer2=list(self._buffer2),
        )

    def load_state_dict(self, state: dict) -> None:
        self.ds.load_state_dict(state["ds"])
        self._rng.bit_generator.state = state["rng"]
        self._buffer1 = list(state["_buffer1"])
        self._buffer2 = list(state["_buffer2"])


class BatchLoader:
    """Stacks samples into numpy batches; stateful via the inner dataset.

    Replaces torchdata StatefulDataLoader (llm_pretrain.py:153-159). By
    default a daemon thread PREFETCHES ``prefetch`` batches ahead through
    a bounded queue, so host-side batch assembly (tokenize/stack/augment)
    overlaps the device step — the worker-process overlap of the
    reference's ``num_workers=4`` loader without process-spawn cost
    (numpy stacking releases the GIL for the big copies). ``prefetch=0``
    restores the synchronous path.

    Resume correctness: each prefetched batch carries the inner dataset
    state snapshot taken right after it was produced; ``state_dict()``
    returns the snapshot of the last batch actually YIELDED, so save/
    resume never skips or replays the batches sitting in the queue.
    """

    def __init__(self, ds, batch_size: int, prefetch: int = 2) -> None:
        self.ds = ds
        self.batch_size = batch_size
        self.prefetch = prefetch
        self._last_state = None

    def _batches(self):
        it = iter(self.ds)
        while True:
            samples = []
            try:
                for _ in range(self.batch_size):
                    samples.append(next(it))
            except StopIteration:
                if samples:
                    pass  # drop ragged tail batch (reference drops too)
                return
            yield tuple(
                np.stack([s[j] for s in samples]) for j in range(len(samples[0]))
            )

    def __iter__(self):
        if self.prefetch <= 0:
            for batch in self._batches():
                self._last_state = self.ds.state_dict()
                yield batch
            return

        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _END = object()
        stop = threading.Event()

        # snapshot BEFORE the worker starts mutating self.ds: a
        # state_dict() call before the first batch is yielded must
        # describe the pre-iteration position, not wherever the
        # prefetcher has already advanced to
        self._last_state = self.ds.state_dict()

        def put(item) -> bool:
            # stop-aware put: never leaves the worker blocked forever on
            # a full queue after the consumer abandons iteration
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch in self._batches():
                    if not put((batch, self.ds.state_dict(), None)):
                        return
                put((_END, None, None))
            except BaseException as e:  # surface worker errors to consumer
                put((_END, None, e))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                batch, state, err = q.get()
                if batch is _END:
                    if err is not None:
                        raise err
                    return
                self._last_state = state
                yield batch
        finally:
            # consumer done (exhausted, errored, or closed early):
            # release the worker and its handle on the dataset
            stop.set()
            t.join(timeout=5)

    def state_dict(self) -> dict:
        if self._last_state is not None:
            return dict(ds=self._last_state)
        return dict(ds=self.ds.state_dict())

    def load_state_dict(self, state: dict) -> None:
        self._last_state = None
        self.ds.load_state_dict(state["ds"])
