"""Pallas MXU matmul kernels — the TPU-native replacement for the
reference's Triton/CUTLASS GEMMs.

Kernel contracts (behavior parity, TPU-first implementation):
  - :func:`scaled_mm`: INT8 (or bf16/fp32) tiled matmul with the fused
    fp32 ``acc * row_scale * col_scale`` epilogue — the workhorse used by
    int8 / bitnet / mixed-precision schemes (triton_mm.py:146-220
    semantics, incl. the scalar col-scale BitNet path :211-215).
  - :func:`tile_scaled_mm`: DeepSeek-style two-accumulator loop — int32
    partial accumulation per K quant-block, rescaled into an fp32
    accumulator (triton_mm.py:223-342 semantics).
  - :func:`matmul`: plain tiled matmul with configurable accumulation
    dtype (the templated ``_matmul_kernel`` analog, triton_mm.py:53-109).

Design notes (TPU):
  - grid = (M/BM, N/BN, K/BK) with K innermost; a VMEM scratch carries the
    accumulator across K steps; the scale epilogue runs once at the last
    K step. Pallas double-buffers the A/B block DMAs automatically.
  - int8 blocks use min tile (32, 128); default blocks 256x256x512 keep
    the MXU busy while staying well under VMEM (~1.5 MB for int8).
  - Shapes must be multiples of the hardware tile; the wrapper pads
    (model dims here are all multiples of 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _acc_dtype(dtype) -> jnp.dtype:
    return jnp.int32 if dtype == jnp.int8 else jnp.float32


def _pad2(x: Array, rows: int, cols: int) -> Array:
    pr, pc = rows - x.shape[0], cols - x.shape[1]
    if pr or pc:
        x = jnp.pad(x, ((0, pr), (0, pc)))
    return x


# ---------------------------------------------------------------------------
# scaled_mm: fused row x col scale epilogue
# ---------------------------------------------------------------------------


def _scaled_mm_kernel(a_ref, b_ref, sa_ref, sb_ref, out_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:],
        b_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=acc_ref.dtype,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        acc = acc_ref[:].astype(jnp.float32)
        out_ref[:] = (acc * sa_ref[:] * sb_ref[:]).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_m", "block_n", "block_k", "interpret"),
)
def scaled_mm(
    a: Array,
    b: Array,
    scale_a: Array,
    scale_b: Array,
    *,
    out_dtype=jnp.bfloat16,
    block_m: int | None = None,
    block_n: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> Array:
    """A[M,K] @ B[K,N] * row_scale[M,1] * col_scale[1,N] -> out_dtype.

    Blocks not passed explicitly resolve through the autotune cache
    (ops/autotune.py, ``ops/tuned/<device>.json``) with a measured-best
    v5e fallback of 1024x256x2048 (293 TFLOPS at [16384,2048]x[2048,2048]
    — parity with XLA's int8 dot+epilogue at 295; the old untuned
    256x256x512 ran at 134).

    Tensor-wide scalar scales (shape () or (1,1)) are broadcast to the
    row/col vectors by the wrapper.
    """
    M, K = a.shape
    N = b.shape[1]
    if block_m is None or block_n is None or block_k is None:
        from .autotune import lookup

        tm, tn, tk = lookup("scaled_mm", M, K, N, a.dtype)
        block_m, block_n, block_k = block_m or tm, block_n or tn, block_k or tk

    sa = jnp.broadcast_to(
        jnp.reshape(scale_a.astype(jnp.float32), (-1, 1)), (M, 1)
    )
    sb = jnp.broadcast_to(
        jnp.reshape(scale_b.astype(jnp.float32), (1, -1)), (1, N)
    )

    bm, bn, bk = min(block_m, _round_up(M, 128)), min(block_n, _round_up(N, 128)), min(
        block_k, _round_up(K, 128)
    )
    Mp, Np, Kp = _round_up(M, bm), _round_up(N, bn), _round_up(K, bk)
    a = _pad2(a, Mp, Kp)
    b = _pad2(b, Kp, Np)
    sa = _pad2(sa, Mp, 1)
    sb = _pad2(sb, 1, Np)

    out = pl.pallas_call(
        _scaled_mm_kernel,
        grid=(Mp // bm, Np // bn, Kp // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), _acc_dtype(a.dtype))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp * a.dtype.itemsize
            + Kp * Np * b.dtype.itemsize
            + Mp * Np * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b, sa, sb)
    return out[:M, :N]


# ---------------------------------------------------------------------------
# scaled_mm_dims: the transpose-free contraction forms of the backward pass
# ---------------------------------------------------------------------------


def _scaled_mm_dims_kernel(a_ref, b_ref, sa_ref, sb_ref, out_ref, acc_ref, *, dims):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ca, cb = dims
    acc_ref[:] += jax.lax.dot_general(
        a_ref[:],
        b_ref[:],
        (((ca,), (cb,)), ((), ())),
        preferred_element_type=acc_ref.dtype,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        acc = acc_ref[:].astype(jnp.float32)
        out_ref[:] = (acc * sa_ref[:] * sb_ref[:]).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("dims", "out_dtype", "block_m", "block_n", "block_k",
                     "interpret"),
)
def scaled_mm_dims(
    a: Array,
    b: Array,
    scale_a: Array,
    scale_b: Array,
    *,
    dims: tuple[int, int] = (1, 0),
    out_dtype=jnp.bfloat16,
    block_m: int | None = None,
    block_n: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> Array:
    """``scaled_mm_general``'s contraction-dims form as a Pallas kernel:
    the operands stay in their STORED layouts and the contraction dim is
    folded into the in-kernel dot (Mosaic handles the block-local
    relayout), so the backward matmuls avoid both a materialized int8
    transpose (~22 ms for [16384, 2048] s8 on v5e) and XLA's layout
    choice:

      dims=(0, 0): grad_weight form — A[Kc, M] . B[Kc, N] over the token
                   dim Kc (autotune kernel name 'scaled_mm_lhsT')
      dims=(1, 1): fwd/weight-stationary form — A[M, Kc] . B[N, Kc]
                   ('scaled_mm_rhsT')
      dims=(1, 0): canonical; delegates to :func:`scaled_mm`

    scale_a is per out-row [M], scale_b per out-col [N] (off the
    contraction dim, as everywhere in quant/mixed_precision.py).
    """
    ca, cb = dims
    if dims == (1, 0):
        return scaled_mm(
            a, b, scale_a, scale_b, out_dtype=out_dtype, block_m=block_m,
            block_n=block_n, block_k=block_k, interpret=interpret,
        )
    assert dims in ((0, 0), (1, 1)), dims
    M = a.shape[1 - ca]
    N = b.shape[1 - cb]
    K = a.shape[ca]
    assert b.shape[cb] == K, (a.shape, b.shape, dims)
    if block_m is None or block_n is None or block_k is None:
        from .autotune import lookup

        name = "scaled_mm_lhsT" if dims == (0, 0) else "scaled_mm_rhsT"
        tm, tn, tk = lookup(name, M, K, N, a.dtype)
        block_m, block_n, block_k = block_m or tm, block_n or tn, block_k or tk

    sa = jnp.broadcast_to(
        jnp.reshape(scale_a.astype(jnp.float32), (-1, 1)), (M, 1)
    )
    sb = jnp.broadcast_to(
        jnp.reshape(scale_b.astype(jnp.float32), (1, -1)), (1, N)
    )

    bm = min(block_m, _round_up(M, 128))
    bn = min(block_n, _round_up(N, 128))
    bk = min(block_k, _round_up(K, 128))
    Mp, Np, Kp = _round_up(M, bm), _round_up(N, bn), _round_up(K, bk)
    if dims == (0, 0):
        a = _pad2(a, Kp, Mp)
        a_spec = pl.BlockSpec(
            (bk, bm), lambda i, j, k: (k, i), memory_space=pltpu.VMEM
        )
    else:
        a = _pad2(a, Mp, Kp)
        a_spec = pl.BlockSpec(
            (bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM
        )
    if cb == 0:
        b = _pad2(b, Kp, Np)
        b_spec = pl.BlockSpec(
            (bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
        )
    else:
        b = _pad2(b, Np, Kp)
        b_spec = pl.BlockSpec(
            (bn, bk), lambda i, j, k: (j, k), memory_space=pltpu.VMEM
        )
    sa = _pad2(sa, Mp, 1)
    sb = _pad2(sb, 1, Np)

    out = pl.pallas_call(
        functools.partial(_scaled_mm_dims_kernel, dims=dims),
        grid=(Mp // bm, Np // bn, Kp // bk),
        in_specs=[
            a_spec,
            b_spec,
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), _acc_dtype(a.dtype))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp * a.dtype.itemsize
            + Kp * Np * b.dtype.itemsize
            + Mp * Np * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b, sa, sb)
    return out[:M, :N]


# ---------------------------------------------------------------------------
# tile_scaled_mm: two-accumulator DeepSeek-style loop
# ---------------------------------------------------------------------------


def _tile_scaled_mm_kernel(a_ref, b_ref, sa_ref, sb_ref, out_ref, acc_ref, *, qk, n_q):
    """One K grid step covers ``n_q`` quant blocks of width ``qk``: each
    block's int32 inner product is rescaled by its sa x sb pair and
    accumulated in fp32 (the two-accumulator structure of
    triton_mm.py:313-331, unrolled n_q-wide so the A/B DMAs amortize —
    one-block-per-step was DMA-bound at ~60 TFLOPS on v5e).

    Scales arrive in their NATURAL layouts — sa [M, KB] (block (bm, n_q)),
    sb [KB, N] (block (n_q, bn)) — and each quant block takes a STATIC
    row/column slice. An earlier [KB, M, 1]-layout version put a 1-wide
    lane dim on the sa block: Mosaic pads lanes to 128, so the scale DMA
    ballooned to n_q*bm*128 fp32 (6.7 MB/step at 4096^3) and the kernel
    collapsed from 154 to 87 TFLOPS going 2048^3 -> 4096^3.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_dtype = jnp.int32 if a_ref.dtype == jnp.int8 else jnp.float32
    acc = acc_ref[:]
    for j in range(n_q):
        part = jax.lax.dot_general(
            a_ref[:, j * qk : (j + 1) * qk],
            b_ref[j * qk : (j + 1) * qk, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        acc = acc + part.astype(jnp.float32) * sa_ref[:, j : j + 1] * sb_ref[j : j + 1, :]
    acc_ref[:] = acc

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _tile_scaled_mm_kernel3(a_ref, b_ref, sa_ref, sb_ref, out_ref, acc_ref,
                            *, qk, n_q):
    """3D-scale-layout variant for n_qk > 32 (see tile_scaled_mm): sa
    block (1, bm, n_q), sb block (1, n_q, bn) — same unrolled
    two-accumulator loop."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_dtype = jnp.int32 if a_ref.dtype == jnp.int8 else jnp.float32
    acc = acc_ref[:]
    sa = sa_ref[0]
    sb = sb_ref[0]
    for j in range(n_q):
        part = jax.lax.dot_general(
            a_ref[:, j * qk : (j + 1) * qk],
            b_ref[j * qk : (j + 1) * qk, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        acc = acc + part.astype(jnp.float32) * sa[:, j : j + 1] * sb[j : j + 1, :]
    acc_ref[:] = acc

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_m", "block_n", "interpret"),
)
def tile_scaled_mm(
    a: Array,
    b: Array,
    scale_a: Array,
    scale_b: Array,
    *,
    out_dtype=jnp.bfloat16,
    block_m: int | None = None,
    block_n: int | None = None,
    interpret: bool = False,
) -> Array:
    """Tile-scaled matmul: scale_a [M/QM, K/QK], scale_b [K/QK, N/QN].

    Each K grid step covers up to 16 quant blocks (unrolled in-kernel with
    per-block rescale). Row/col-expanded scale grids ([M, K/QK] and
    [K/QK, N] fp32) are materialized by the wrapper — a few hundred KB at
    LLM shapes. Blocks not passed explicitly resolve through the autotune
    cache (ops/autotune.py) with a (256, 256) fallback.
    """
    M, K = a.shape
    N = b.shape[1]
    if block_m is None or block_n is None:
        from .autotune import lookup

        tm, tn, _ = lookup("tile_scaled_mm", M, K, N, a.dtype)
        block_m = block_m or tm
        block_n = block_n or tn
    n_qm, n_qk = scale_a.shape
    n_qk2, n_qn = scale_b.shape
    assert n_qk == n_qk2 and K % n_qk == 0
    qk = K // n_qk

    sa_full = jnp.repeat(scale_a.astype(jnp.float32), M // n_qm, axis=0)  # [M, KB]
    sb_full = jnp.repeat(scale_b.astype(jnp.float32), N // n_qn, axis=1)  # [KB, N]

    bm, bn = min(block_m, _round_up(M, 128)), min(block_n, _round_up(N, 128))
    assert qk >= 128, f"K quant block ({qk}) must be >= 128"
    # VMEM guard with the ACTUAL bk (full-K unroll for n_qk <= 32, which
    # the autotune lookup's working-set cap cannot model — its cached bk
    # is 0 for this kernel) and the CALLER's out dtype: a config swept
    # with a bf16 out can exceed the 16M scoped limit when asked for f32
    # (benchmark_mm's exactness checks, 16.12M at 4096^3 / (1024, 512)).
    out_b = jnp.dtype(out_dtype).itemsize
    bk_eff = K if n_qk <= 32 else min(16, n_qk) * qk

    def _vmem(bm_, bn_):
        return (2 * (bm_ * bk_eff + bk_eff * bn_)
                + 4 * bm_ * bn_ + out_b * bm_ * bn_)

    while _vmem(bm, bn) > 14 * 1024 * 1024 and (bm > 256 or bn > 256):
        if bm >= bn and bm > 256:
            bm //= 2
        else:
            bn //= 2
    Mp, Np = _round_up(M, bm), _round_up(N, bn)
    a = _pad2(a, Mp, K)
    b = _pad2(b, K, Np)

    # Mosaic's block rule constrains the SCALE blocks: the natural-layout
    # sa block (bm, n_q) has n_q on the lane dim, which must equal the
    # array's n_qk or be a 128-multiple. So for n_qk <= 32 the quant
    # blocks unroll FULLY (n_q = n_qk, one K grid step — this is also the
    # fastest shape: no accumulator revisit; r4's partial unroll silently
    # failed this rule at 4096^3, where n_q=16 < n_qk=32 made every
    # config raise at lowering and the kernel fell to its DMA-bound
    # default). For larger n_qk the scales move to a 3D layout
    # [KB/n_q, {M|n_q}, {n_q|N}] whose lane dim is n_q (block == array
    # dim) at the cost of Mosaic lane-padding the (1, bm, n_q) block.
    if n_qk <= 32:
        n_q = n_qk
        bk = K
        sa_full = _pad2(sa_full, Mp, n_qk)
        sb_full = _pad2(sb_full, n_qk, Np)
        out = pl.pallas_call(
            functools.partial(_tile_scaled_mm_kernel, qk=qk, n_q=n_q),
            grid=(Mp // bm, Np // bn, 1),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda i, j, k: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, n_q), lambda i, j, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_q, bn), lambda i, j, k: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(a, b, sa_full, sb_full)
        return out[:M, :N]

    n_q = 16
    while n_qk % n_q:
        n_q //= 2
    bk = n_q * qk
    n_kb = n_qk // n_q
    sa3 = _pad2(sa_full, Mp, n_qk).reshape(Mp, n_kb, n_q).transpose(1, 0, 2)
    sb3 = _pad2(sb_full, n_qk, Np).reshape(n_kb, n_q, Np)
    out = pl.pallas_call(
        functools.partial(_tile_scaled_mm_kernel3, qk=qk, n_q=n_q),
        grid=(Mp // bm, Np // bn, n_kb),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, n_q), lambda i, j, k: (k, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_q, bn), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(a, b, sa3, sb3)
    return out[:M, :N]


# ---------------------------------------------------------------------------
# plain matmul with configurable accumulation
# ---------------------------------------------------------------------------


def _matmul_kernel(a_ref, b_ref, out_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:],
        b_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=acc_ref.dtype,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("acc_dtype", "out_dtype", "block_m", "block_n", "block_k", "interpret"),
)
def matmul(
    a: Array,
    b: Array,
    *,
    acc_dtype=None,
    out_dtype=None,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> Array:
    M, K = a.shape
    N = b.shape[1]
    acc_dtype = acc_dtype or _acc_dtype(a.dtype)
    out_dtype = out_dtype or acc_dtype

    bm, bn, bk = min(block_m, _round_up(M, 128)), min(block_n, _round_up(N, 128)), min(
        block_k, _round_up(K, 128)
    )
    Mp, Np, Kp = _round_up(M, bm), _round_up(N, bn), _round_up(K, bk)
    a = _pad2(a, Mp, Kp)
    b = _pad2(b, Kp, Np)

    out = pl.pallas_call(
        _matmul_kernel,
        grid=(Mp // bm, Np // bn, Kp // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(a, b)
    return out[:M, :N]


# ---------------------------------------------------------------------------
# scaled_int4_mm: in-kernel INT4 unpack (packed operands stay 4-bit in HBM)
# ---------------------------------------------------------------------------


def _unpack_hi_lo(packed):
    """int8 [r, c] of nibble pairs -> (hi [r, c], lo [r, c]) sign-extended.

    hi holds the EVEN logical elements (high nibble), lo the odd ones
    (quant/core.py pack layout). Shifts run in int32: Mosaic refuses to
    legalize the unsigned i8 shift (`arith.shrui`) the old uint8-typed
    expression lowered to, and i32 arithmetic shifts are the supported
    form. For a sign-extended int8 input, bits 8..31 replicate the high
    nibble's sign bit, so `p32 >> 4` IS the sign-extended high nibble."""
    p32 = packed.astype(jnp.int32)
    hi = (p32 >> 4).astype(jnp.int8)
    lo = ((p32 << 28) >> 28).astype(jnp.int8)
    return hi, lo


def _scaled_int4_mm_kernel(a_ref, b_ref, sa_ref, sb_ref, out_ref, acc_ref):
    """A_packed [bm, bk//2] x B_t_packed [bn, bk//2] with the unpack done
    in VMEM. The nibble interleave never materializes: the contraction
    splits into even/odd logical positions, so

        acc += A_hi @ B_hi.T + A_lo @ B_lo.T

    — two MXU dots per block on the sign-extended int8 halves. This is the
    TPU equivalent of the reference's CUTLASS s4 GEMM keeping operands
    4-bit through global memory (cutlass_sm80_int4.cu:32-65): HBM traffic
    stays at 4 bits/element, vs the in-graph-unpack XLA fallback that
    materializes int8 copies first (2x packed bytes + an extra pass).
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a_hi, a_lo = _unpack_hi_lo(a_ref[:])
    b_hi, b_lo = _unpack_hi_lo(b_ref[:])
    dims = (((1,), (1,)), ((), ()))  # contract packed axis of both
    acc_ref[:] += jax.lax.dot_general(
        a_hi, b_hi, dims, preferred_element_type=jnp.int32
    ) + jax.lax.dot_general(a_lo, b_lo, dims, preferred_element_type=jnp.int32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        acc = acc_ref[:].astype(jnp.float32)
        out_ref[:] = (acc * sa_ref[:] * sb_ref[:]).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_m", "block_n", "block_k", "interpret"),
)
def scaled_int4_mm(
    a_packed: Array,
    b_t_packed: Array,
    row_scale: Array,
    col_scale: Array,
    *,
    out_dtype=jnp.bfloat16,
    block_m: int | None = None,
    block_n: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> Array:
    """A_packed [M, K//2] @ unpack(B_t_packed [N, K//2]).T with fused
    row x col fp32 scale epilogue; operands cross HBM packed (4 bits/elem).

    ``block_k`` counts PACKED columns (logical K block = 2 * block_k).
    Blocks not passed explicitly resolve through the autotune cache with
    a (512, 512, 1024) fallback.
    """
    # nibble semantics are SIGNED: reinterpret uint8-packed operands so
    # the in-kernel sign extension is correct (and Mosaic never sees an
    # unsigned shift)
    if a_packed.dtype == jnp.uint8:
        a_packed = jax.lax.bitcast_convert_type(a_packed, jnp.int8)
    if b_t_packed.dtype == jnp.uint8:
        b_t_packed = jax.lax.bitcast_convert_type(b_t_packed, jnp.int8)
    M, Kp = a_packed.shape
    N = b_t_packed.shape[0]
    assert b_t_packed.shape[1] == Kp
    if block_m is None or block_n is None or block_k is None:
        from .autotune import lookup

        tm, tn, tk = lookup("scaled_int4_mm", M, 2 * Kp, N, a_packed.dtype)
        block_m, block_n, block_k = block_m or tm, block_n or tn, block_k or tk

    sa = jnp.broadcast_to(
        jnp.reshape(row_scale.astype(jnp.float32), (-1, 1)), (M, 1)
    )
    sb = jnp.broadcast_to(
        jnp.reshape(col_scale.astype(jnp.float32), (1, -1)), (1, N)
    )

    bm = min(block_m, _round_up(M, 128))
    bn = min(block_n, _round_up(N, 128))
    bk = min(block_k, _round_up(Kp, 128))
    Mp, Np, Kpp = _round_up(M, bm), _round_up(N, bn), _round_up(Kp, bk)
    a_packed = _pad2(a_packed, Mp, Kpp)
    b_t_packed = _pad2(b_t_packed, Np, Kpp)
    sa = _pad2(sa, Mp, 1)
    sb = _pad2(sb, 1, Np)

    out = pl.pallas_call(
        _scaled_int4_mm_kernel,
        grid=(Mp // bm, Np // bn, Kpp // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), lambda i, j, k: (j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(a_packed, b_t_packed, sa, sb)
    return out[:M, :N]
