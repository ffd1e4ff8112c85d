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

    Replaces torchdata StatefulDataLoader (llm_pretrain.py:153-159): no
    worker processes — the native prefetch loader (cpp/) overlaps host IO
    with device steps instead.
    """

    def __init__(self, ds, batch_size: int) -> None:
        self.ds = ds
        self.batch_size = batch_size

    def __iter__(self):
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

    def state_dict(self) -> dict:
        return dict(ds=self.ds.state_dict())

    def load_state_dict(self, state: dict) -> None:
        self.ds.load_state_dict(state["ds"])
