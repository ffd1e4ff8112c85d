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

Stochastic rounding runs IN-KERNEL via the TPU PRNG
(``pltpu.prng_random_bits``): q = floor(x/scale + U[0,1)), the reference
SR formulation (subclasses/int8.py:20-22). The noise stream differs from
the jnp path's ``jax.random.uniform`` (different RNG), but the estimator
is identically unbiased; determinism comes from seeding each grid block
with (key-derived seed, program ids).
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
    tile under the VMEM budget. The budget is the INPUT tile only; with
    double-buffered in/out plus the fp32 math temporary the total VMEM is
    ~5-6x the input tile (16 MB hard scoped limit — a 3 MB budget made the
    two-output both-kernel OOM at [256, 5632] blocks), hence 1 MB. Device
    profiles show the kernels run at ~HBM speed at this block size in the
    real train step (the apparent slowness in host-loop microbenchmarks
    was the benchmark's own fold pass). None if ``dim`` has no admissible
    divisor (caller falls back to jnp)."""
    limit = vmem_budget // max(other * elem_bytes, 1)
    best = None
    for b in range(step, min(dim, limit) + 1, step):
        if dim % b == 0:
            best = b
    return best  # None when even `step` rows blow the budget (huge `other`)


def _uniform_noise(shape):
    """U[0,1) fp32 from the per-core PRNG (seeded by the caller)."""
    bits = pltpu.prng_random_bits(shape)  # int32
    # take the top 24 bits -> exact fp32 in [0, 1)
    u24 = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.uint32), jnp.uint32(8)
    )
    # Mosaic has no uint32->f32 cast; the top-24-bit value is positive, so
    # bitcast to int32 first
    return pltpu.bitcast(u24, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))


def _round_op(q_f32, sr: bool):
    if sr:
        return jnp.floor(q_f32 + _uniform_noise(q_f32.shape))
    # NOTE: the (q + 1.5*2^23) - 1.5*2^23 magic-rounding trick is NOT safe
    # here — XLA's algebraic simplifier cancels the add/sub pair and the
    # int8 cast then truncates (caught by the oracle tests).
    return jnp.round(q_f32)


def _inv_scale(scale, eps):
    """Per-row/col reciprocal (tiny) so the per-ELEMENT op is a multiply,
    not a ~10x-slower divide."""
    return 1.0 / jnp.clip(scale, min=eps)


def _block_seed(seed_ref, *pids):
    """One int32 seed per grid block (distinct noise stream per block)."""
    s = seed_ref[0]
    for p in pids:
        s = s * jnp.int32(1000003) + p.astype(jnp.int32)
    return s


def _rowwise_kernel(x_ref, seed_ref, q_ref, s_ref, *, eps, sr):
    if sr:
        pltpu.prng_seed(_block_seed(seed_ref, pl.program_id(0)))
    xf = x_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    scale = absmax * (1.0 / 127.0)
    q = _round_op(xf * _inv_scale(scale, eps), sr)
    q_ref[:] = jnp.clip(q, -128, 127).astype(jnp.int8)
    s_ref[:] = scale


def _rowwise_amax_kernel(x_ref, amax_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        amax_ref[:] = jnp.zeros_like(amax_ref)

    xf = x_ref[:].astype(jnp.float32)
    amax_ref[:] = jnp.maximum(amax_ref[:], jnp.max(jnp.abs(xf), axis=1, keepdims=True))


def _rowwise_scale_kernel(x_ref, seed_ref, s_ref, q_ref, *, eps, sr):
    if sr:
        pltpu.prng_seed(_block_seed(seed_ref, pl.program_id(0), pl.program_id(1)))
    xf = x_ref[:].astype(jnp.float32)
    q = _round_op(xf * _inv_scale(s_ref[:], eps), sr)
    q_ref[:] = jnp.clip(q, -128, 127).astype(jnp.int8)


def _seed_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _as_seed(seed: Array | None) -> Array:
    if seed is None:
        return jnp.zeros((1,), jnp.int32)
    return jnp.reshape(seed, (1,)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("eps", "sr", "interpret"))
def quantize_int8_rowwise(
    x: Array,
    seed: Array | None = None,
    *,
    eps: float = _EPS,
    sr: bool = False,
    interpret: bool = False,
):
    """x [M, K] -> (q int8 [M, K], scale f32 [M, 1]); reduce along axis 1.

    Single-pass (one HBM read) when a [bm, K] tile fits VMEM; K-blocked
    two-pass otherwise (wide rows, e.g. vocab-sized logits grads).
    ``sr`` enables in-kernel stochastic rounding seeded by ``seed``.
    """
    M, K = x.shape
    seed = _as_seed(seed)
    eb = x.dtype.itemsize
    bm = _pick_block(M, K, elem_bytes=eb)
    if bm is not None:
        out = pl.pallas_call(
            functools.partial(_rowwise_kernel, eps=eps, sr=sr),
            grid=(M // bm,),
            in_specs=[
                pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                _seed_spec(),
            ],
            out_specs=[
                pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((M, K), jnp.int8),
                jax.ShapeDtypeStruct((M, 1), jnp.float32),
            ],
            interpret=interpret,
        )(x, seed)
        return out[0], out[1]

    # two-pass: bound bk so a [32, bk] tile fits the budget, then grow bm
    bk = _pick_block(K, 32, step=128, elem_bytes=eb)
    bm = _pick_block(M, bk, step=32, elem_bytes=eb) if bk else None
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
        functools.partial(_rowwise_scale_kernel, eps=eps, sr=sr),
        grid=(M // bm, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, k: (i, k), memory_space=pltpu.VMEM),
            _seed_spec(),
            pl.BlockSpec((bm, 1), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bk), lambda i, k: (i, k), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.int8),
        interpret=interpret,
    )(x, seed, scale)
    return q, scale


def _colwise_absmax_kernel(x_ref, amax_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        amax_ref[:] = jnp.zeros_like(amax_ref)

    xf = x_ref[:].astype(jnp.float32)
    amax_ref[:] = jnp.maximum(amax_ref[:], jnp.max(jnp.abs(xf), axis=0, keepdims=True))


def _colwise_scale_kernel(x_ref, seed_ref, s_ref, q_ref, *, eps, sr):
    if sr:
        pltpu.prng_seed(_block_seed(seed_ref, pl.program_id(0), pl.program_id(1)))
    xf = x_ref[:].astype(jnp.float32)
    q = _round_op(xf * _inv_scale(s_ref[:], eps), sr)
    q_ref[:] = jnp.clip(q, -128, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("eps", "sr", "interpret"))
def quantize_int8_colwise(
    x: Array,
    seed: Array | None = None,
    *,
    eps: float = _EPS,
    sr: bool = False,
    interpret: bool = False,
):
    """x [K, N] -> (q int8 [K, N], scale f32 [1, N]); reduce along axis 0."""
    K, N = x.shape
    seed = _as_seed(seed)
    eb = x.dtype.itemsize
    bn = _pick_block(N, min(K, 2048), step=128, elem_bytes=eb)
    bk = _pick_block(K, bn, step=32, elem_bytes=eb) if bn else None
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
        functools.partial(_colwise_scale_kernel, eps=eps, sr=sr),
        grid=(K // bk, N // bn),
        in_specs=[
            pl.BlockSpec((bk, bn), lambda k, j: (k, j), memory_space=pltpu.VMEM),
            _seed_spec(),
            pl.BlockSpec((1, bn), lambda k, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bk, bn), lambda k, j: (k, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.int8),
        interpret=interpret,
    )(x, seed, scale)
    return q, scale


def _both_pass1_kernel(x_ref, seed_ref, qr_ref, sr_ref, camax_ref, *, eps, sr):
    """Rowwise quantize + accumulate column absmax in ONE read."""
    i = pl.program_id(0)
    if sr:
        pltpu.prng_seed(_block_seed(seed_ref, i))
    xf = x_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    scale = absmax * (1.0 / 127.0)
    q = _round_op(xf * _inv_scale(scale, eps), sr)
    qr_ref[:] = jnp.clip(q, -128, 127).astype(jnp.int8)
    sr_ref[:] = scale

    @pl.when(i == 0)
    def _():
        camax_ref[:] = jnp.zeros_like(camax_ref)

    camax_ref[:] = jnp.maximum(
        camax_ref[:], jnp.max(jnp.abs(xf), axis=0, keepdims=True)
    )


def _both_pass2_kernel(x_ref, seed_ref, cs_ref, qc_ref, *, eps, sr):
    if sr:
        pltpu.prng_seed(_block_seed(seed_ref, pl.program_id(0), jnp.int32(7)))
    xf = x_ref[:].astype(jnp.float32)
    q = _round_op(xf * _inv_scale(cs_ref[:], eps), sr)
    qc_ref[:] = jnp.clip(q, -128, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("eps", "sr", "interpret"))
def quantize_int8_both(
    x: Array,
    seed: Array | None = None,
    *,
    eps: float = _EPS,
    sr: bool = False,
    interpret: bool = False,
):
    """BOTH-axis quantize in 2 HBM reads: x [M, K] ->
    (q_row [M,K], s_row [M,1], q_col [M,K], s_col [1,K]).

    The mixed-precision backward needs the SAME output-grad tensor
    quantized along axis 1 (for grad_input) and axis 0 (for grad_weight);
    done separately that costs 3 reads of the bf16 (1 rowwise + 2-pass
    colwise). Here pass 1 fuses the rowwise quantize with the column-
    absmax accumulation, so the total is 2 reads + 2 int8 writes.
    Numerics are identical to the separate kernels (same scales, same
    round-half-even); SR noise streams are per-block-independent as usual.
    """
    M, K = x.shape
    seed = _as_seed(seed)
    eb = x.dtype.itemsize
    bm = _pick_block(M, K, elem_bytes=eb)
    if bm is None:
        raise ValueError(f"no row blocks for shape {x.shape}")

    qr, s_row, camax = pl.pallas_call(
        functools.partial(_both_pass1_kernel, eps=eps, sr=sr),
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _seed_spec(),
        ],
        out_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, K), jnp.int8),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, K), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, seed)
    s_col = camax * (1.0 / 127.0)

    qc = pl.pallas_call(
        functools.partial(_both_pass2_kernel, eps=eps, sr=sr),
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _seed_spec(),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.int8),
        interpret=interpret,
    )(x, seed, s_col)
    return qr, s_row, qc, s_col


def both_supported(x: Array) -> bool:
    if x.ndim != 2 or x.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    M, K = x.shape
    if M < 32 or K < 128 or K % 128:
        return False
    return _pick_block(M, K, elem_bytes=x.dtype.itemsize) is not None


def supported(x: Array, axis: int) -> bool:
    """Whether the Pallas kernels can take this (shape, axis)."""
    if x.ndim != 2 or x.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    M, K = x.shape
    if M < 32 or K < 128 or K % 128:
        return False
    eb = x.dtype.itemsize
    if axis in (1, -1):
        if _pick_block(M, K, elem_bytes=eb) is not None:
            return True
        bk = _pick_block(K, 32, step=128, elem_bytes=eb)
        return bk is not None and _pick_block(M, bk, step=32, elem_bytes=eb) is not None
    if axis == 0:
        bn = _pick_block(K, min(M, 2048), step=128, elem_bytes=eb)
        return bn is not None and _pick_block(M, bn, step=32, elem_bytes=eb) is not None
    return False


def quantize_int8(
    x: Array,
    axis: int,
    *,
    eps: float = _EPS,
    sr: bool = False,
    seed: Array | None = None,
    interpret: bool = False,
):
    """Dispatch to the row/col kernel; caller checks :func:`supported`."""
    if axis in (1, -1):
        return quantize_int8_rowwise(x, seed, eps=eps, sr=sr, interpret=interpret)
    assert axis == 0
    return quantize_int8_colwise(x, seed, eps=eps, sr=sr, interpret=interpret)
