"""Backend selection for the op layer.

``auto`` uses Pallas MXU kernels on TPU and XLA-lowered jnp everywhere else
(tests run the jnp path on CPU; Pallas kernels are additionally covered on
CPU via ``interpret=True``).
"""

from __future__ import annotations

import contextlib

import jax

_BACKEND = "auto"
_VALID = ("auto", "xla", "pallas")


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in _VALID:
        raise ValueError(f"backend must be one of {_VALID}, got {name!r}")
    _BACKEND = name


def _pallas_available() -> bool:
    try:
        from . import pallas_mm  # noqa: F401

        return True
    except ImportError:
        return False


def backend() -> str:
    """Resolve the effective backend ('xla' or 'pallas')."""
    if _BACKEND != "auto":
        return _BACKEND
    try:
        platform = jax.default_backend()
    except Exception:
        platform = "cpu"
    return "pallas" if platform == "tpu" and _pallas_available() else "xla"


@contextlib.contextmanager
def use_backend(name: str):
    global _BACKEND
    prev = _BACKEND
    set_backend(name)
    try:
        yield
    finally:
        _BACKEND = prev
