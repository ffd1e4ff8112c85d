"""Checkpoint save/restore for arbitrary param/optimizer pytrees.

Contract parity with llm_pretrain.py:239-249 + :173-179: a checkpoint holds
model params, optimizer state, dataloader state, and the step counter, and
``--resume`` restores all four. Quantized-weight wrappers and optimizer
NamedTuples round-trip because they are plain dataclass/NamedTuple pytrees
whose leaves are converted to numpy on save.

Multi-host: each process writes its own file (``last_{proc}.pkl``, the
analog of FSDP's file-per-rank save, llm_pretrain.py:246-247) containing
ONLY the shards its devices address — a cross-host-sharded FSDP array is
never gathered (``device_get`` on a non-fully-addressable array raises).
Such leaves are stored as :class:`ShardedLeaf` (global shape + the local
``(index, data)`` shard list, one entry per distinct shard index on this
process) and reassembled on load by :func:`restore_sharded` via
``jax.make_array_from_single_device_arrays`` against the restoring job's
shardings. Each rank's file is self-sufficient for its own devices —
replicated leaves are stored once per rank, not only on the rank holding
global replica 0. Resume assumes the same process topology, the standard
file-per-rank contract; validated end-to-end by a real 2-process
``jax.distributed`` run in tests/test_multiprocess.py.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from pathlib import Path

import jax
import numpy as np


@dataclass
class ShardedLeaf:
    """Host-local piece of a (possibly cross-host) sharded jax.Array."""

    global_shape: tuple
    dtype: str
    # [(index, data)] where index is the tuple-of-slices of this shard in
    # the global array (one entry per addressable shard, replica 0 only)
    shards: list = field(default_factory=list)

    def to_numpy(self) -> np.ndarray:
        """Reassemble a FULL array — only valid when the saved shards
        cover the global shape (single-process save or full replication)."""
        out = np.zeros(self.global_shape, np.dtype(self.dtype))
        covered = np.zeros(self.global_shape, bool)
        for idx, data in self.shards:
            out[idx] = data
            covered[idx] = True
        if not covered.all():
            raise ValueError(
                "saved shards do not cover the global array — restore with "
                "restore_sharded() under the original process topology"
            )
        return out


def _to_numpy(tree, shard_arrays: bool = False):
    def conv(x):
        # only device arrays come back to host; python/numpy scalars, RNG
        # state dicts etc. are stored as-is
        if not isinstance(x, jax.Array):
            return x
        if x.is_fully_addressable and not shard_arrays:
            return np.asarray(jax.device_get(x))
        # One shard per distinct index among THIS process's devices.
        # Filtering on global replica_id==0 instead would drop replicated
        # leaves from every rank but the one holding replica 0, leaving
        # the other ranks' files unable to restore them (each rank's file
        # must be self-sufficient for its own devices — file-per-rank
        # contract).
        best = {}
        for s in x.addressable_shards:
            # key on (start, stop) pairs: slice objects themselves are
            # only hashable on Python >= 3.12
            key = tuple((sl.start, sl.stop) for sl in s.index)
            cur = best.get(key)
            if cur is None or s.replica_id < cur.replica_id:
                best[key] = s
        return ShardedLeaf(
            tuple(x.shape),
            np.dtype(x.dtype).name,
            [(s.index, np.asarray(s.data)) for s in best.values()],
        )

    return jax.tree.map(conv, tree)


def save_checkpoint(path: str | Path, payload: dict, *, shard_arrays=False) -> None:
    """Atomically write a pytree dict checkpoint.

    ``shard_arrays=True`` forces the per-shard representation even for
    fully addressable arrays (automatic for cross-host-sharded leaves) —
    what a multi-host FSDP job writes; also lets the single-host tests
    exercise the exact multi-host save/restore path.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    arrays = {
        k: _to_numpy(v, shard_arrays) for k, v in payload.items() if k != "meta"
    }
    arrays["meta"] = payload.get("meta", {})
    with open(tmp, "wb") as f:
        pickle.dump(arrays, f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)


def load_checkpoint(path: str | Path) -> dict:
    """Raw load: ShardedLeaf placeholders stay as-is (pass the tree to
    :func:`restore_sharded` with target shardings, or leaf.to_numpy())."""
    with open(path, "rb") as f:
        return pickle.load(f)


def _is_leaf(x) -> bool:
    return isinstance(x, ShardedLeaf)


def restore_sharded(tree, shardings):
    """Rebuild jax.Arrays from a loaded checkpoint tree.

    ``shardings``: matching pytree of jax.sharding.Sharding (e.g. from
    parallel.state_shardings). ShardedLeaf entries are placed shard-by-
    shard (no host gather); plain numpy leaves are device_put with their
    target sharding.
    """

    def conv(leaf, sharding):
        if isinstance(leaf, ShardedLeaf):
            shape = leaf.global_shape
            by_index = {}
            for idx, data in leaf.shards:
                by_index[_norm_index(idx, shape)] = data
            arrays = []
            for dev, idx in sharding.addressable_devices_indices_map(shape).items():
                key = _norm_index(idx, shape)
                data = by_index.get(key)
                if data is None:
                    # saved sharding differs from the restore sharding
                    # (XLA may propagate different output shardings than
                    # the param rule): assemble the target region from
                    # the overlapping saved shards
                    data = _assemble_region(by_index, key, leaf.dtype)
                if data is None:
                    raise ValueError(
                        f"missing shard {key} for restore — was the "
                        "checkpoint saved under a different topology?"
                    )
                arrays.append(jax.device_put(data, dev))
            return jax.make_array_from_single_device_arrays(
                shape, sharding, arrays
            )
        if sharding is not None and hasattr(leaf, "shape"):
            return jax.device_put(leaf, sharding)
        return leaf

    return jax.tree.map(conv, tree, shardings, is_leaf=_is_leaf)


def _assemble_region(by_index: dict, key: tuple, dtype):
    """Build the region ``key`` from overlapping saved shards; None if the
    host-local shards don't fully cover it."""
    shape = tuple(t1 - t0 for t0, t1 in key)
    out = np.zeros(shape, np.dtype(dtype))
    covered = np.zeros(shape, bool)
    for src_key, data in by_index.items():
        dst, src = [], []
        for (s0, s1), (t0, t1) in zip(src_key, key):
            lo, hi = max(s0, t0), min(s1, t1)
            if lo >= hi:
                dst = None
                break
            dst.append(slice(lo - t0, hi - t0))
            src.append(slice(lo - s0, hi - s0))
        if dst is None:
            continue
        out[tuple(dst)] = data[tuple(src)]
        covered[tuple(dst)] = True
    return out if covered.all() else None


def _norm_index(idx, shape) -> tuple:
    """Canonicalize a tuple-of-slices index (fill Nones with bounds)."""
    out = []
    for s, dim in zip(idx, shape):
        start = 0 if s.start is None else int(s.start)
        stop = dim if s.stop is None else int(s.stop)
        out.append((start, stop))
    return tuple(out)


def materialize(tree):
    """Loaded tree -> plain numpy arrays (single-host convenience: calls
    ShardedLeaf.to_numpy on placeholders, leaves everything else)."""
    return jax.tree.map(
        lambda x: x.to_numpy() if isinstance(x, ShardedLeaf) else x,
        tree,
        is_leaf=_is_leaf,
    )


def checkpoint_name(save_dir: str | Path, step: int | None = None) -> Path:
    """Per-process checkpoint path (file-per-host like llm_pretrain.py:246)."""
    proc = jax.process_index()
    name = f"last_{proc}.pkl" if step is None else f"step{step}_{proc}.pkl"
    return Path(save_dir) / name
