"""Fused Pallas INT8 quantization kernels (absmax + scale in VMEM).

Why these exist: on TPU, XLA fuses the ``jnp`` absmax/scale chain of a
dynamic quantize into its *producer* — including an int8 ``dot_general``
— and then lowers the combined dot+elementwise+reduce fusion with a slow
convolution emitter (measured 31.7 ms vs ~2.5 ms for the bare MXU GEMM at
[16384,2048]x[2048,5632] on v5e; ``optimization_barrier`` is stripped by
the TPU pipeline before fusion and cannot prevent this). A ``pallas_call``
is a custom call, which XLA cannot fuse across, so routing the quantize
through these kernels keeps every int8 matmul on the fast GEMM path —
and does the quantize itself in the minimum number of HBM passes:

  - :func:`quantize_int8_rowwise`  (reduce along the last axis):
    ONE pass — read bf16 block, absmax + scale in VMEM, write int8.
  - :func:`quantize_int8_colwise`  (reduce along axis 0):
    TWO passes — K-blocked absmax accumulation, then scale+cast.

Semantics match quant.core.quantize_int8 (absmax symmetric, scale =
absmax/127 computed in fp32, round-half-even, subclasses/int8.py:13-26).
Deterministic rounding only — the SR path stays on the jnp implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_EPS = 1e-12


def _pick_block(dim: int, other: int, step: int = 32, elem_bytes: int = 2,
                vmem_budget: int = 1024 * 1024) -> int | None:
    """Largest divisor of ``dim`` that is a multiple of ``step`` (int8 output
    tiling wants 32 sublanes / 128 lanes) and keeps a [block, other] bf16
    tile under the VMEM budget. The budget is the INPUT tile only; the fp32
    math temporaries cost ~4x more scoped VMEM on top (16 MB hard limit),
    hence the conservative 1 MB default. None if dim has no such divisor
    (caller falls back to jnp)."""
    limit = max(step, vmem_budget // max(other * elem_bytes, 1))
    best = None
    for b in range(step, min(dim, limit) + 1, step):
        if dim % b == 0:
            best = b
    return best


def _rowwise_kernel(x_ref, q_ref, s_ref):
    xf = x_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    scale = absmax * (1.0 / 127.0)
    q = jnp.round(xf / jnp.clip(scale, min=_EPS))
    q_ref[:] = jnp.clip(q, -128, 127).astype(jnp.int8)
    s_ref[:] = scale


def _rowwise_amax_kernel(x_ref, amax_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        amax_ref[:] = jnp.zeros_like(amax_ref)

    xf = x_ref[:].astype(jnp.float32)
    amax_ref[:] = jnp.maximum(amax_ref[:], jnp.max(jnp.abs(xf), axis=1, keepdims=True))


def _rowwise_scale_kernel(x_ref, s_ref, q_ref):
    xf = x_ref[:].astype(jnp.float32)
    q = jnp.round(xf / jnp.clip(s_ref[:], min=_EPS))
    q_ref[:] = jnp.clip(q, -128, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_int8_rowwise(x: Array, *, interpret: bool = False):
    """x [M, K] -> (q int8 [M, K], scale f32 [M, 1]); reduce along axis 1.

    Single-pass (one HBM read) when a [bm, K] tile fits VMEM; K-blocked
    two-pass otherwise (wide rows, e.g. vocab-sized logits grads).
    """
    M, K = x.shape
    bm = _pick_block(M, K)
    if bm is not None:
        out = pl.pallas_call(
            _rowwise_kernel,
            grid=(M // bm,),
            in_specs=[pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((M, K), jnp.int8),
                jax.ShapeDtypeStruct((M, 1), jnp.float32),
            ],
            interpret=interpret,
        )(x)
        return out[0], out[1]

    bk = _pick_block(K, 1, step=128)
    bm = _pick_block(M, bk, step=32)
    if bk is None or bm is None:
        raise ValueError(f"no row blocks for shape {x.shape}")
    absmax = pl.pallas_call(
        _rowwise_amax_kernel,
        grid=(M // bm, K // bk),
        in_specs=[pl.BlockSpec((bm, bk), lambda i, k: (i, k), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, 1), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x)
    scale = absmax * (1.0 / 127.0)
    q = pl.pallas_call(
        _rowwise_scale_kernel,
        grid=(M // bm, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bk), lambda i, k: (i, k), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.int8),
        interpret=interpret,
    )(x, scale)
    return q, scale


def _colwise_absmax_kernel(x_ref, amax_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        amax_ref[:] = jnp.zeros_like(amax_ref)

    xf = x_ref[:].astype(jnp.float32)
    amax_ref[:] = jnp.maximum(amax_ref[:], jnp.max(jnp.abs(xf), axis=0, keepdims=True))


def _colwise_scale_kernel(x_ref, s_ref, q_ref):
    xf = x_ref[:].astype(jnp.float32)
    q = jnp.round(xf / jnp.clip(s_ref[:], min=_EPS))
    q_ref[:] = jnp.clip(q, -128, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_int8_colwise(x: Array, *, interpret: bool = False):
    """x [K, N] -> (q int8 [K, N], scale f32 [1, N]); reduce along axis 0."""
    K, N = x.shape
    bn = _pick_block(N, min(K, 2048), step=128)
    bk = _pick_block(K, bn, step=32) if bn else None
    if bn is None or bk is None:
        raise ValueError(f"no col blocks for shape {x.shape}")

    absmax = pl.pallas_call(
        _colwise_absmax_kernel,
        grid=(N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((bk, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x)
    scale = absmax * (1.0 / 127.0)

    q = pl.pallas_call(
        _colwise_scale_kernel,
        grid=(K // bk, N // bn),
        in_specs=[
            pl.BlockSpec((bk, bn), lambda k, j: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda k, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bk, bn), lambda k, j: (k, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.int8),
        interpret=interpret,
    )(x, scale)
    return q, scale


def supported(x: Array, axis: int) -> bool:
    """Whether the Pallas kernels can take this (shape, axis)."""
    if x.ndim != 2 or x.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    M, K = x.shape
    if M < 32 or K < 128 or K % 128:
        return False
    if axis in (1, -1):
        if _pick_block(M, K) is not None:
            return True
        bk = _pick_block(K, 1, step=128)
        return bk is not None and _pick_block(M, bk, step=32) is not None
    if axis == 0:
        bn = _pick_block(K, min(M, 2048), step=128)
        return bn is not None and _pick_block(M, bn, step=32) is not None
    return False


def quantize_int8(x: Array, axis: int, *, interpret: bool = False):
    """Dispatch to the row/col kernel; caller checks :func:`supported`."""
    if axis in (1, -1):
        return quantize_int8_rowwise(x, interpret=interpret)
    assert axis == 0
    return quantize_int8_colwise(x, interpret=interpret)
