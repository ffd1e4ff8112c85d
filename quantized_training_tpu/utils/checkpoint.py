"""Checkpoint save/restore for arbitrary param/optimizer pytrees.

Contract parity with llm_pretrain.py:239-249 + :173-179: a checkpoint holds
model params, optimizer state, dataloader state, and the step counter, and
``--resume`` restores all four. Quantized-weight wrappers and optimizer
NamedTuples round-trip because they are plain dataclass/NamedTuple pytrees
whose leaves are converted to numpy on save.

Multi-host: each process saves/loads its own addressable shard file
(``last_{proc}.pkl``), the analog of FSDP's file-per-rank save
(llm_pretrain.py:246-247).
"""

from __future__ import annotations

import pickle
from pathlib import Path

import jax
import numpy as np


def _to_numpy(tree):
    def conv(x):
        # only device arrays come back to host; python/numpy scalars, RNG
        # state dicts etc. are stored as-is
        if isinstance(x, jax.Array):
            return np.asarray(jax.device_get(x))
        return x

    return jax.tree.map(conv, tree)


def save_checkpoint(path: str | Path, payload: dict) -> None:
    """Atomically write a pytree dict checkpoint."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    arrays = {
        k: _to_numpy(v) for k, v in payload.items() if k != "meta"
    }
    arrays["meta"] = payload.get("meta", {})
    with open(tmp, "wb") as f:
        pickle.dump(arrays, f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)


def load_checkpoint(path: str | Path) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def checkpoint_name(save_dir: str | Path, step: int | None = None) -> Path:
    """Per-process checkpoint path (file-per-host like llm_pretrain.py:246)."""
    proc = jax.process_index()
    name = f"last_{proc}.pkl" if step is None else f"step{step}_{proc}.pkl"
    return Path(save_dir) / name
