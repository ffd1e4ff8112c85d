"""Dataset-layer tests: factory, synthetic/markov streams, shuffle/batch
state snapshots (data/utils.py:52-67 and data/text.py semantics)."""

import collections

import numpy as np

from quantized_training_tpu.data import get_dataset
from quantized_training_tpu.data.shuffle import BatchLoader, ShuffleDataset


class TestMarkovTokenDataset:
    def test_next_token_alignment(self):
        ds = get_dataset("markov", seq_len=64, vocab_size=512, n_states=64)
        x, y = next(iter(ds))
        np.testing.assert_array_equal(x[1:], y[:-1])

    def test_deterministic_and_resumable(self):
        ds = get_dataset("markov", seq_len=32, vocab_size=256, n_states=32, seed=5)
        it = iter(ds)
        [next(it) for _ in range(3)]
        state = ds.state_dict()
        a = next(it)

        ds2 = get_dataset("markov", seq_len=32, vocab_size=256, n_states=32, seed=5)
        ds2.load_state_dict(state)
        b = next(iter(ds2))
        np.testing.assert_array_equal(a[0], b[0])

    def test_learnable_structure(self):
        """Bigram conditional entropy must be far below uniform ln(V)."""
        ds = get_dataset("markov", seq_len=128, vocab_size=512, n_states=64, seed=3)
        it = iter(ds)
        toks = np.concatenate([next(it)[0] for _ in range(100)])
        pair = collections.Counter(zip(toks[:-1], toks[1:]))
        uni = collections.Counter(toks[:-1])
        total = sum(pair.values())
        h = -sum(n * np.log(n / uni[a]) for (a, _), n in pair.items()) / total
        assert h < 0.5 * np.log(512), h

    def test_eval_split_disjoint_and_finite(self):
        tr = get_dataset("markov", seq_len=32, vocab_size=256, n_states=32, seed=5)
        ev = get_dataset("markov", seq_len=32, vocab_size=256, n_states=32, seed=5, eval=True)
        ev_seqs = list(ev)
        assert len(ev_seqs) == 128
        tr_first = next(iter(tr))[0]
        assert not any(np.array_equal(tr_first, e[0]) for e in ev_seqs)


class TestPipelineState:
    def test_shuffle_batch_snapshot_roundtrip(self):
        def mk():
            ds = get_dataset("markov", seq_len=16, vocab_size=128, n_states=16, seed=1)
            return BatchLoader(ShuffleDataset(ds, buffer_size=8, seed=0), batch_size=4)

        dl = mk()
        it = iter(dl)
        [next(it) for _ in range(5)]
        state = dl.state_dict()
        want = next(it)

        dl2 = mk()
        dl2.load_state_dict(state)
        got = next(iter(dl2))
        np.testing.assert_array_equal(want[0], got[0])
        np.testing.assert_array_equal(want[1], got[1])


def test_batchloader_prefetch_resume_exact():
    """state_dict() under prefetching reflects the last YIELDED batch,
    not the batches sitting in the queue — resume is gap/replay-free."""

    def make(prefetch):
        ds = get_dataset("markov", seq_len=16, vocab_size=128, n_states=16, seed=1)
        return BatchLoader(ds, batch_size=2, prefetch=prefetch)

    sync_batches = [b for _, b in zip(range(6), iter(make(0)))]

    pre = make(2)
    it = iter(pre)
    for _ in range(3):
        next(it)
    state = pre.state_dict()

    pre2 = make(2)
    pre2.load_state_dict(state)
    nxt = next(iter(pre2))
    np.testing.assert_array_equal(nxt[0], sync_batches[3][0])


def test_batchloader_prefetch_state_before_first_yield():
    """Regression (ADVICE r2): a state_dict() taken after iter() but
    before the first batch is yielded must describe position 0 — not
    wherever the prefetch worker has already advanced the dataset."""
    import time

    def make():
        ds = get_dataset("markov", seq_len=16, vocab_size=128, n_states=16, seed=1)
        return BatchLoader(ds, batch_size=2, prefetch=2)

    first = next(iter(make()))

    dl = make()
    it = iter(dl)
    time.sleep(0.2)  # let the worker fill the queue (advancing dl.ds)
    state = dl.state_dict()
    it.close()

    dl2 = make()
    dl2.load_state_dict(state)
    got = next(iter(dl2))
    np.testing.assert_array_equal(got[0], first[0])


def test_batchloader_prefetch_early_close_stops_worker():
    """Abandoning iteration mid-stream must terminate the prefetch
    worker (it used to stay blocked on q.put holding the dataset)."""
    import threading

    ds = get_dataset("markov", seq_len=16, vocab_size=128, n_states=16, seed=1)
    dl = BatchLoader(ds, batch_size=2, prefetch=1)
    n0 = threading.active_count()
    it = iter(dl)
    next(it)
    it.close()  # triggers the generator's finally: stop + join
    assert threading.active_count() == n0
