"""Scaled matmul op family — the workhorse of every quantized scheme.

Semantics mirror the reference kernel contracts
(kernels/gn_kernels/triton_mm.py:146-342, :349-373):

  ``scaled_mm(A, B, scale_a, scale_b)`` computes
  ``(A @ B).astype(f32) * scale_a * scale_b`` cast to ``out_dtype``, where

  - A: [M, K] int8 (or fp8/bf16), B: [K, N] same dtype
  - scale_a: row scale [M, 1], tensor scalar, or tile scale [M/QM, K/QK]
  - scale_b: col scale [1, N], tensor scalar (the BitNet ``COL_SCALE_SCALAR``
    path, triton_mm.py:211-215), or tile scale [K/QK, N/QN]

Two backends:
  - ``xla``: jnp.dot with ``preferred_element_type`` — XLA tiles int8 onto
    the MXU at 2x bf16 throughput and fuses the fp32 scale epilogue.
  - ``pallas``: hand-written MXU kernels (ops/pallas_mm.py) with the scale
    epilogue fused in VMEM; used for the tile-scaled two-accumulator loop
    and quantize-fused variants.

The backend is selected by :func:`quantized_training_tpu.ops.set_backend`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import _dispatch

Array = jax.Array

_INT_TYPES = (jnp.int8, jnp.int4)
_FP8_TYPES = (jnp.float8_e4m3fn, jnp.float8_e5m2)


def _accum_dtype(a_dtype) -> jnp.dtype:
    return jnp.int32 if a_dtype in (jnp.int8,) else jnp.float32


def _is_tensor_scale(s: Array) -> bool:
    return s.ndim == 0 or s.size == 1


def int8_mm(a: Array, b: Array) -> Array:
    """Plain INT8 x INT8 -> INT32 matmul (triton_mm.py:112-128 contract)."""
    assert a.dtype == jnp.int8 and b.dtype == jnp.int8
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _mm_f32(a: Array, b: Array) -> Array:
    """A @ B accumulated at full precision, result fp32."""
    if a.dtype in _FP8_TYPES:
        # No fp8 MXU on v5e — upcast to bf16 (documented perf fallback).
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=_accum_dtype(a.dtype)
    )
    return acc.astype(jnp.float32)


def scaled_mm(
    a: Array,
    b: Array,
    scale_a: Array,
    scale_b: Array,
    *,
    out_dtype=jnp.bfloat16,
) -> Array:
    """Row/col/tensor/tile-scaled matmul (triton_mm.py:349-373 dispatcher).

    Scale layout decides the mode:
      - scale_a [M,1] or scalar AND scale_b [1,N] or scalar -> fused epilogue
      - scale_a [M/QM, K/QK] AND scale_b [K/QK, N/QN]       -> tile-scaled
    """
    M, K = a.shape
    K2, N = b.shape
    assert K == K2, f"shape mismatch {a.shape} @ {b.shape}"
    assert a.dtype == b.dtype or {a.dtype, b.dtype} <= set(_FP8_TYPES)

    row_col_mode = (_is_tensor_scale(scale_a) or scale_a.shape == (M, 1)) and (
        _is_tensor_scale(scale_b) or scale_b.shape == (1, N)
    )

    if a.dtype in _FP8_TYPES or b.dtype in _FP8_TYPES:
        # no fp8 MXU on v5e; upcast BEFORE backend dispatch in BOTH scale
        # modes (neither Pallas kernel has an fp8 path)
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)

    if row_col_mode:
        use_pallas = _dispatch.backend() == "pallas"
        if not use_pallas and _dispatch.raw_backend() == "tuned" and a.dtype == jnp.int8:
            from .autotune import pallas_wins

            use_pallas = pallas_wins("scaled_mm", M, K, N, a.dtype)
        if use_pallas:
            from . import pallas_mm

            return pallas_mm.scaled_mm(a, b, scale_a, scale_b, out_dtype=out_dtype)
        acc = _mm_f32(a, b)
        sa = jnp.reshape(scale_a.astype(jnp.float32), (1, 1) if _is_tensor_scale(scale_a) else (M, 1))
        sb = jnp.reshape(scale_b.astype(jnp.float32), (1, 1) if _is_tensor_scale(scale_b) else (1, N))
        return (acc * sa * sb).astype(out_dtype)

    # tile-scaled (DeepSeek-style) mode: triton_mm.py:223-342
    assert scale_a.ndim == 2 and scale_b.ndim == 2, (
        f"unrecognized scale shapes {scale_a.shape}, {scale_b.shape} for "
        f"A[{M},{K}] @ B[{K},{N}]"
    )
    assert K % scale_a.shape[1] == 0 and scale_a.shape[1] == scale_b.shape[0]
    if _dispatch.backend() == "pallas":
        from . import pallas_mm

        return pallas_mm.tile_scaled_mm(a, b, scale_a, scale_b, out_dtype=out_dtype)
    return _tile_scaled_mm_xla(a, b, scale_a, scale_b, out_dtype)


def scaled_mm_general(
    a: Array,
    b: Array,
    scale_a: Array,
    scale_b: Array,
    *,
    dims: tuple[int, int] = (1, 0),
    out_dtype=jnp.bfloat16,
) -> Array:
    """Row/col-scaled matmul with explicit contraction dims — the
    transpose-free form used by the mixed-precision backward pass.

    ``dims = (ca, cb)`` contracts ``a`` over axis ``ca`` and ``b`` over
    axis ``cb`` (each operand quantized along its contraction axis, so the
    scales lie off the reduction dim). Avoids materializing ``x.T`` /
    ``w.T`` operands: XLA folds the layout choice into the MXU GEMM,
    where an explicit ``jnp.transpose`` before the quantize costs a full
    HBM pass (and int8 transposes lower to pathologically slow copies,
    ~22 ms for [16384,2048] s8 on v5e).

    scale_a has size a.shape[1-ca] (per out-row), scale_b size
    b.shape[1-cb] (per out-col); scalars broadcast.
    """
    ca, cb = dims
    M = a.shape[1 - ca]
    N = b.shape[1 - cb]
    if a.dtype in _FP8_TYPES:
        # no fp8 MXU on v5e — upcast for the dot (same fallback as _mm_f32);
        # on fp8-capable TPUs XLA consumes the fp8 dot directly. BEFORE any
        # backend dispatch: the Pallas kernel has no fp8 path.
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    if _dispatch.backend() == "pallas":
        # Explicit opt-in only: the Pallas kernel takes A[M,K] @ B[K,N], so
        # non-standard contraction dims pay a materialized int8 transpose
        # here — the XLA default path folds the layout into the GEMM instead.
        from . import pallas_mm

        a_std = a if ca == 1 else a.T
        b_std = b if cb == 0 else b.T
        return pallas_mm.scaled_mm(a_std, b_std, scale_a, scale_b, out_dtype=out_dtype)
    if _dispatch.raw_backend() == "tuned" and a.dtype == jnp.int8:
        # per-shape data-driven dispatch: every contraction form routes to
        # its Pallas kernel when the autotune cache measured it faster
        # than XLA at this exact shape — the canonical (1,0) grad_input
        # form via scaled_mm, the stored-layout (0,0) grad_weight /
        # (1,1) fwd forms via scaled_mm_dims (no materialized transpose)
        from .autotune import pallas_wins

        name = {(1, 0): "scaled_mm", (0, 0): "scaled_mm_lhsT",
                (1, 1): "scaled_mm_rhsT"}.get(dims)
        if name and pallas_wins(name, M, a.shape[ca], N, a.dtype):
            from . import pallas_mm

            if dims == (1, 0):
                return pallas_mm.scaled_mm(
                    a, b, scale_a, scale_b, out_dtype=out_dtype
                )
            return pallas_mm.scaled_mm_dims(
                a, b, scale_a, scale_b, dims=dims, out_dtype=out_dtype
            )
    acc = jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())), preferred_element_type=_accum_dtype(a.dtype)
    ).astype(jnp.float32)
    sa = jnp.reshape(scale_a.astype(jnp.float32), (1, 1) if _is_tensor_scale(scale_a) else (M, 1))
    sb = jnp.reshape(scale_b.astype(jnp.float32), (1, 1) if _is_tensor_scale(scale_b) else (1, N))
    return (acc * sa * sb).astype(out_dtype)


def _tile_scaled_mm_xla(
    a: Array, b: Array, scale_a: Array, scale_b: Array, out_dtype
) -> Array:
    """XLA fallback for tile-scaled matmul.

    Computes per-K-block partial products (batched over K blocks on the MXU)
    then applies block scales and reduces — the two-accumulator structure of
    triton_mm.py:288-331 expressed as a batched dot.
    """
    M, K = a.shape
    N = b.shape[1]
    n_qm, n_qk = scale_a.shape
    n_qk2, n_qn = scale_b.shape
    qm, qk, qn = M // n_qm, K // n_qk, N // n_qn

    a3 = a.reshape(M, n_qk, qk).transpose(1, 0, 2)  # [KB, M, qk]
    b3 = b.reshape(n_qk, qk, N)  # [KB, qk, N]
    part = jax.lax.dot_general(
        a3,
        b3,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=_accum_dtype(a.dtype),
    ).astype(jnp.float32)  # [KB, M, N]

    sa = jnp.repeat(scale_a.astype(jnp.float32), qm, axis=0).T  # [KB, M]
    sb = jnp.repeat(scale_b.astype(jnp.float32), qn, axis=1)  # [KB, N]
    out = jnp.einsum("kmn,km,kn->mn", part, sa, sb)
    return out.astype(out_dtype)


def scaled_mm_ref(
    a: Array, b: Array, scale_a: Array, scale_b: Array, *, out_dtype=jnp.float32
) -> Array:
    """Pure-fp32 oracle used by tests/benchmarks (benchmark_mm.py:46-50).

    Expands any scale layout to full [M,K] / [K,N] grids, multiplies into
    fp32 operands, and matmuls.
    """
    M, K = a.shape
    N = b.shape[1]
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)

    def expand(s, rows, cols):
        s = s.astype(jnp.float32)
        if s.ndim == 0 or s.size == 1:
            return jnp.broadcast_to(jnp.reshape(s, (1, 1)), (rows, cols))
        r = jnp.repeat(s, rows // s.shape[0], axis=0)
        return jnp.repeat(r, cols // s.shape[1], axis=1)

    return jnp.dot(
        af * expand(scale_a, M, K),
        bf * expand(scale_b, K, N),
        precision="highest",  # TPU fp32 matmul is bf16x3 otherwise
    ).astype(out_dtype)
