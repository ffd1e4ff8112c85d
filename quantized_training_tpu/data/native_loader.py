"""ctypes binding for the native C++ prefetching token loader
(cpp/tokenloader.cpp) — the torchdata-StatefulDataLoader replacement.

Falls back cleanly: callers should use :func:`available` and construct the
Python TokenDataset+BatchLoader pipeline when the shared library is absent.
Build: ``make native`` (g++ -O3 -shared) -> data/libtokenloader.so.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent / "libtokenloader.so"
_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.tl_create.restype = ctypes.c_void_p
        lib.tl_create.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_uint64,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.tl_next.restype = ctypes.c_int
        lib.tl_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.tl_state.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.tl_restore.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64]
        lib.tl_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def available() -> bool:
    return _LIB_PATH.exists()


class NativeTokenLoader:
    """Batched (tokens, labels) int32 stream over .bin shard dirs with
    background-thread prefetch and (epoch, cursor) resume state."""

    def __init__(
        self,
        dataset_dir: str,
        seq_len: int,
        batch_size: int,
        seed: int = 2024,
        n_threads: int = 2,
        eval: bool = False,
    ):
        lib = _load()
        self._lib = lib
        self.seq_len = seq_len
        self.batch_size = batch_size
        self._h = lib.tl_create(
            str(dataset_dir).encode(), seq_len, batch_size, seed, n_threads, int(eval)
        )
        if not self._h:
            raise RuntimeError(f"tl_create failed for {dataset_dir}")

    def __iter__(self):
        while True:
            tokens = np.empty((self.batch_size, self.seq_len), np.int32)
            labels = np.empty((self.batch_size, self.seq_len), np.int32)
            ok = self._lib.tl_next(
                self._h,
                tokens.ctypes.data_as(ctypes.c_void_p),
                labels.ctypes.data_as(ctypes.c_void_p),
            )
            if not ok:
                return
            yield tokens, labels

    def state_dict(self) -> dict:
        epoch = ctypes.c_uint64()
        cursor = ctypes.c_uint64()
        self._lib.tl_state(self._h, ctypes.byref(epoch), ctypes.byref(cursor))
        return {"epoch": epoch.value, "cursor": cursor.value}

    def load_state_dict(self, state: dict) -> None:
        self._lib.tl_restore(self._h, state["epoch"], state["cursor"])

    def close(self) -> None:
        if self._h:
            self._lib.tl_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
