"""Backend selection for the op layer.

``auto`` resolves to the XLA-lowered jnp path everywhere: measured on a
v5e chip (llama2-1b bs8 seq2048 int8 mixed-precision train step), XLA's
native int8 ``dot_general`` with the fp32 scale epilogue fused by the
compiler beats the hand-written Pallas scaled_mm kernel — 11,892 vs
8,224 tok/s — because XLA overlaps the quantize/dequantize elementwise
work with the MXU pipeline across op boundaries, which a standalone
pallas_call cannot. An 18-config autotune sweep (ops/autotune.py)
confirms the scoping: the best Pallas block config reaches 303 TFLOPS at
4096^3 int8 vs 337 for XLA's dot+epilogue, so the Pallas kernel layer's
value on this chip is (a) fusions XLA cannot express — the quantize
family, in-kernel-unpack INT4, in-kernel-SR optimizer — and (b) the
tile-scaled two-accumulator GEMM. The MXU workhorse stays on XLA. The
Pallas kernels remain available via ``set_backend("pallas")``.
"""

from __future__ import annotations

import contextlib
import os

# 'tuned' = per-shape data-driven dispatch: canonical-form int8 scaled
# matmuls route to the Pallas kernel where the autotune cache measured it
# faster than XLA (e.g. 342 vs 328 TFLOPS at [16384,2048]x[2048,5632] on
# v5e). Not the default: embedding the large-block Pallas kernels inside
# the full train program raised compile pressure past this environment's
# remote helper, so 'auto' stays pure XLA for robustness. QT_OPS_BACKEND
# overrides the initial setting (e.g. QT_OPS_BACKEND=tuned bench.py).
_VALID = ("auto", "xla", "pallas", "tuned")
_BACKEND = os.environ.get("QT_OPS_BACKEND", "auto")
if _BACKEND not in _VALID:
    raise ValueError(
        f"QT_OPS_BACKEND must be one of {_VALID}, got {_BACKEND!r}"
    )


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in _VALID:
        raise ValueError(f"backend must be one of {_VALID}, got {name!r}")
    _BACKEND = name


def backend() -> str:
    """Resolve the effective backend ('xla' or 'pallas')."""
    if _BACKEND != "auto":
        return _BACKEND
    return "xla"


def raw_backend() -> str:
    """The un-resolved setting ('auto' | 'xla' | 'pallas').

    The quantize hot path (quant/core.py) uses this to distinguish
    'auto' (Pallas fused quantize allowed — it beats any XLA lowering)
    from an explicit 'xla' opt-out (A/B benchmarking must measure the
    pure-XLA path it claims to measure)."""
    return _BACKEND


@contextlib.contextmanager
def use_backend(name: str):
    global _BACKEND
    prev = _BACKEND
    set_backend(name)
    try:
        yield
    finally:
        _BACKEND = prev
