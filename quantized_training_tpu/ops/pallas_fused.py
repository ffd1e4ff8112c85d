"""Fused producer->INT8-quantize Pallas kernels (VERDICT r3 item 1c).

In the all-INT8 mixed-precision step every quantized linear's input is
produced by a cheap elementwise op — RMSNorm (qkv and gate/up inputs) or
silu(gate)*up (down-proj input) — then materialized in bf16 and re-read
by a separate quantize kernel, in the forward AND again in the remat
recompute, plus a third colwise read for grad_weight. A pallas_call is a
custom call XLA cannot fuse into, so that bf16 round-trip is structural,
not a missed fusion. These kernels put the producer INSIDE the quantize:

  rmsnorm_quant_rowwise   x [M,K], g [K] -> (q int8 [M,K], s [M,1])
      one HBM read of x, int8 write — the bf16 norm output never exists.
  rmsnorm_quant_colwise   two passes over x (col absmax needs all rows),
      still never materializes the bf16 norm output.
  silu_mul_quant_rowwise  a,b [M,K] -> quantize(silu(a)*b) rowwise
  silu_mul_quant_colwise  two-pass colwise variant

Per llama2-1b layer at bs8 seq2048 this removes ~1 GB of HBM traffic
(norm/mul writes + quantize re-reads) from the int8 step — traffic the
bf16 baseline never pays, so it directly closes the INT8-vs-BF16 ratio
(the reference hits its ratio with unfused quantizes because its GPU
baseline is comparatively weaker, README.md:123-137; on TPU the quantize
overhead is the ratio's denominator).

Numerics: the fused quantize sees the producer's UNROUNDED fp32 values
(oracles :func:`rms_norm_f32` / :func:`silu_mul_f32`) — one fewer
rounding than the unfused bf16 materialization, and well-defined in a
kernel (a compiler may elide bf16 round-trips on values that never hit
memory). The quantize itself matches quant.core.quantize_int8
(absmax/127 fp32 scale, round-half-even, subclasses/int8.py:13-26); int8
outputs vs the bf16-materialized composite differ by at most 1 LSB.
Stochastic rounding uses the in-kernel TPU PRNG exactly like
ops/pallas_quant.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_quant import (
    _EPS,
    _as_seed,
    _block_seed,
    _inv_scale,
    _pick_block,
    _round_op,
    _seed_spec,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# jnp oracles (reference semantics; also the CPU fallback path)
# ---------------------------------------------------------------------------


def rms_norm_ref(x: Array, g: Array, eps: float) -> Array:
    """fp32 math, weight applied in the input dtype (models.llama.rms_norm)."""
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return xf.astype(x.dtype) * g


def rms_norm_f32(x: Array, g: Array, eps: float) -> Array:
    """The fused kernels' producer semantics: everything in fp32, no
    intermediate rounding (see _norm_block)."""
    xf = x.astype(jnp.float32)
    rstd = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return xf * rstd * g.astype(jnp.float32)


def silu_mul_ref(a: Array, b: Array) -> Array:
    """silu(a) * b with fp32 silu math, product in the input dtype."""
    af = a.astype(jnp.float32)
    return (af * jax.nn.sigmoid(af)).astype(a.dtype) * b


def silu_mul_f32(a: Array, b: Array) -> Array:
    """The fused kernels' producer semantics (fp32 throughout)."""
    af = a.astype(jnp.float32)
    return af * jax.nn.sigmoid(af) * b.astype(jnp.float32)


# ---------------------------------------------------------------------------
# in-kernel producer bodies (operate on f32 blocks, return values in x dtype)
# ---------------------------------------------------------------------------


def _norm_block(x_ref, g_ref, eps):
    """fp32 norm values — the fused quantize sees the UNROUNDED producer
    output (one fewer rounding than the unfused bf16 materialization; the
    intermediate bf16 cast cannot be relied on inside a kernel anyway —
    compilers legally elide convert round-trips on values that never hit
    memory). Oracle: quantize_int8(rms_norm computed in fp32)."""
    xf = x_ref[:].astype(jnp.float32)
    rstd = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
    return xf * rstd * g_ref[:].astype(jnp.float32)


def _silu_mul_block(a_ref, b_ref):
    af = a_ref[:].astype(jnp.float32)
    return af * jax.nn.sigmoid(af) * b_ref[:].astype(jnp.float32)


def _quant_row_block(y, seed_ref, q_ref, s_ref, *, eps, sr, pid,
                     amax_ref=None):
    if sr:
        pltpu.prng_seed(_block_seed(seed_ref, pid))
    yf = y.astype(jnp.float32)
    ya = jnp.abs(yf)
    absmax = jnp.max(ya, axis=1, keepdims=True)
    scale = absmax * (1.0 / 127.0)
    q = _round_op(yf * _inv_scale(scale, eps), sr)
    q_ref[:] = jnp.clip(q, -128, 127).astype(jnp.int8)
    s_ref[:] = scale
    if amax_ref is not None:
        # column absmax accumulated across the (sequential) row-block
        # grid: a free extra output that lets the BACKWARD's colwise
        # quantize skip its amax pass (one fewer full read of the inputs)
        @pl.when(pid == 0)
        def _():
            amax_ref[:] = jnp.zeros_like(amax_ref)

        amax_ref[:] = jnp.maximum(
            amax_ref[:], jnp.max(ya, axis=0, keepdims=True)
        )


# ---------------------------------------------------------------------------
# rmsnorm -> rowwise int8
# ---------------------------------------------------------------------------


def _make_norm_row_kernel(norm_eps, eps, sr, with_col_amax):
    def kernel(x_ref, g_ref, seed_ref, q_ref, s_ref, *rest):
        y = _norm_block(x_ref, g_ref, norm_eps)
        _quant_row_block(y, seed_ref, q_ref, s_ref, eps=eps, sr=sr,
                         pid=pl.program_id(0),
                         amax_ref=rest[0] if with_col_amax else None)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("norm_eps", "eps", "sr", "interpret", "with_col_amax"),
)
def rmsnorm_quant_rowwise(
    x: Array,
    g: Array,
    seed: Array | None = None,
    *,
    norm_eps: float = 1e-5,
    eps: float = _EPS,
    sr: bool = False,
    interpret: bool = False,
    with_col_amax: bool = False,
):
    """quantize_int8(rms_norm(x, g), axis=1) in ONE HBM read of x.

    x [M, K] (rows fully resident per block — K must fit the VMEM block
    budget; callers check :func:`supported`), g [K].
    Returns (q int8 [M,K], scale f32 [M,1]); with ``with_col_amax`` also
    the column absmax f32 [1,K] of the SAME norm values, so a later
    colwise quantize (grad_weight operand) can skip its amax pass.
    """
    M, K = x.shape
    seed = _as_seed(seed)
    bm = _pick_block(M, K, elem_bytes=x.dtype.itemsize)
    if bm is None:
        raise ValueError(f"no row blocks for shape {x.shape}")
    out_specs = [
        pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((M, K), jnp.int8),
        jax.ShapeDtypeStruct((M, 1), jnp.float32),
    ]
    if with_col_amax:
        out_specs.append(
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((1, K), jnp.float32))
    out = pl.pallas_call(
        _make_norm_row_kernel(norm_eps, eps, sr, with_col_amax),
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            _seed_spec(),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, g, seed)
    return tuple(out)


# ---------------------------------------------------------------------------
# rmsnorm -> colwise int8 (2 passes; never materializes the norm output)
# ---------------------------------------------------------------------------


def _make_norm_col_amax_kernel(norm_eps):
    def kernel(x_ref, g_ref, amax_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            amax_ref[:] = jnp.zeros_like(amax_ref)

        y = _norm_block(x_ref, g_ref, norm_eps)
        amax_ref[:] = jnp.maximum(
            amax_ref[:], jnp.max(jnp.abs(y), axis=0, keepdims=True)
        )

    return kernel


def _make_norm_col_scale_kernel(norm_eps, eps, sr):
    def kernel(x_ref, g_ref, seed_ref, s_ref, q_ref):
        if sr:
            pltpu.prng_seed(
                _block_seed(seed_ref, pl.program_id(0), jnp.int32(11))
            )
        y = _norm_block(x_ref, g_ref, norm_eps)
        q = _round_op(y * _inv_scale(s_ref[:], eps), sr)
        q_ref[:] = jnp.clip(q, -128, 127).astype(jnp.int8)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("norm_eps", "eps", "sr", "interpret")
)
def rmsnorm_quant_colwise(
    x: Array,
    g: Array,
    seed: Array | None = None,
    *,
    norm_eps: float = 1e-5,
    eps: float = _EPS,
    sr: bool = False,
    interpret: bool = False,
    scale: Array | None = None,
):
    """quantize_int8(rms_norm(x, g), axis=0) in TWO HBM reads of x —
    or ONE when ``scale`` [1,K] is supplied (the forward's col_amax/127,
    see rmsnorm_quant_rowwise(with_col_amax=True)).

    Returns (q int8 [M,K], scale f32 [1,K])."""
    M, K = x.shape
    seed = _as_seed(seed)
    bm = _pick_block(M, K, elem_bytes=x.dtype.itemsize)
    if bm is None:
        raise ValueError(f"no row blocks for shape {x.shape}")
    if scale is None:
        amax = pl.pallas_call(
            _make_norm_col_amax_kernel(norm_eps),
            grid=(M // bm,),
            in_specs=[
                pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, K), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(x, g)
        scale = amax * (1.0 / 127.0)
    q = pl.pallas_call(
        _make_norm_col_scale_kernel(norm_eps, eps, sr),
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            _seed_spec(),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.int8),
        interpret=interpret,
    )(x, g, seed, scale)
    return q, scale


# ---------------------------------------------------------------------------
# silu(a)*b -> rowwise / colwise int8
# ---------------------------------------------------------------------------


def _make_silu_row_kernel(eps, sr, with_col_amax):
    def kernel(a_ref, b_ref, seed_ref, q_ref, s_ref, *rest):
        y = _silu_mul_block(a_ref, b_ref)
        _quant_row_block(y, seed_ref, q_ref, s_ref, eps=eps, sr=sr,
                         pid=pl.program_id(0),
                         amax_ref=rest[0] if with_col_amax else None)

    return kernel


# VMEM input budget for the two-input silu kernels: 64-row blocks at
# K=5632 measured 405 vs 391 GB/s for the 32-row blocks the default 1 MB
# budget picks (the chain is VPU-bound on the sigmoid, so bigger blocks
# only trim pipeline overhead; 256-row blocks blow the 16 MB scoped VMEM
# limit with the doubled-buffered f32 temporaries and fail to compile).
_SILU_VMEM_BUDGET = 1536 * 1024


@functools.partial(
    jax.jit, static_argnames=("eps", "sr", "interpret", "with_col_amax")
)
def silu_mul_quant_rowwise(
    a: Array,
    b: Array,
    seed: Array | None = None,
    *,
    eps: float = _EPS,
    sr: bool = False,
    interpret: bool = False,
    with_col_amax: bool = False,
):
    """quantize_int8(silu(a) * b, axis=1) reading a and b ONCE.

    a, b [M, K]; returns (q int8 [M,K], scale f32 [M,1]); with
    ``with_col_amax`` also the column absmax f32 [1,K] of the same
    product values (lets the backward's colwise quantize skip its amax
    pass — one fewer full read of a and b)."""
    M, K = a.shape
    seed = _as_seed(seed)
    # two resident input blocks -> account double the bytes per element
    bm = _pick_block(M, K, elem_bytes=2 * a.dtype.itemsize,
                     vmem_budget=_SILU_VMEM_BUDGET)
    if bm is None:
        raise ValueError(f"no row blocks for shape {a.shape}")
    out_specs = [
        pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((M, K), jnp.int8),
        jax.ShapeDtypeStruct((M, 1), jnp.float32),
    ]
    if with_col_amax:
        out_specs.append(
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((1, K), jnp.float32))
    out = pl.pallas_call(
        _make_silu_row_kernel(eps, sr, with_col_amax),
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _seed_spec(),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(a, b, seed)
    return tuple(out)


def _make_silu_col_amax_kernel():
    def kernel(a_ref, b_ref, amax_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            amax_ref[:] = jnp.zeros_like(amax_ref)

        y = _silu_mul_block(a_ref, b_ref)
        amax_ref[:] = jnp.maximum(
            amax_ref[:], jnp.max(jnp.abs(y), axis=0, keepdims=True)
        )

    return kernel


def _make_silu_col_scale_kernel(eps, sr):
    def kernel(a_ref, b_ref, seed_ref, s_ref, q_ref):
        if sr:
            pltpu.prng_seed(
                _block_seed(seed_ref, pl.program_id(0), jnp.int32(13))
            )
        y = _silu_mul_block(a_ref, b_ref)
        q = _round_op(y * _inv_scale(s_ref[:], eps), sr)
        q_ref[:] = jnp.clip(q, -128, 127).astype(jnp.int8)

    return kernel


@functools.partial(jax.jit, static_argnames=("eps", "sr", "interpret"))
def silu_mul_quant_colwise(
    a: Array,
    b: Array,
    seed: Array | None = None,
    *,
    eps: float = _EPS,
    sr: bool = False,
    interpret: bool = False,
    scale: Array | None = None,
):
    """quantize_int8(silu(a) * b, axis=0) in two reads of (a, b) — or
    ONE when ``scale`` [1,K] is supplied (the forward's col_amax/127,
    see silu_mul_quant_rowwise(with_col_amax=True)).

    Returns (q int8 [M,K], scale f32 [1,K])."""
    M, K = a.shape
    seed = _as_seed(seed)
    bm = _pick_block(M, K, elem_bytes=2 * a.dtype.itemsize,
                     vmem_budget=_SILU_VMEM_BUDGET)
    if bm is None:
        raise ValueError(f"no row blocks for shape {a.shape}")
    if scale is None:
        amax = pl.pallas_call(
            _make_silu_col_amax_kernel(),
            grid=(M // bm,),
            in_specs=[
                pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, K), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(a, b)
        scale = amax * (1.0 / 127.0)
    q = pl.pallas_call(
        _make_silu_col_scale_kernel(eps, sr),
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _seed_spec(),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.int8),
        interpret=interpret,
    )(a, b, seed, scale)
    return q, scale


# ---------------------------------------------------------------------------
# rmsnorm backward (single-pass; dgamma accumulated across the grid)
# ---------------------------------------------------------------------------


def _make_norm_bwd_kernel(norm_eps):
    def kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dg_ref[:] = jnp.zeros_like(dg_ref)

        xf = x_ref[:].astype(jnp.float32)
        dyf = dy_ref[:].astype(jnp.float32)
        gf = g_ref[:].astype(jnp.float32)
        rstd = jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=1, keepdims=True) + norm_eps
        )
        xn = xf * rstd
        dxn = dyf * gf
        c = jnp.mean(dxn * xn, axis=1, keepdims=True)
        dx_ref[:] = ((dxn - xn * c) * rstd).astype(dx_ref.dtype)
        dg_ref[:] += jnp.sum(dyf * xn, axis=0, keepdims=True)

    return kernel


@functools.partial(jax.jit, static_argnames=("norm_eps", "interpret"))
def rmsnorm_bwd(
    x: Array,
    g: Array,
    dy: Array,
    *,
    norm_eps: float = 1e-5,
    interpret: bool = False,
):
    """Single-pass RMSNorm backward: (dx [M,K] in x.dtype, dgamma f32 [1,K]).

    One read of x and dy, one write of dx — XLA lowers the same closed-form
    math (quant/fused.py _rmsnorm_bwd_math) as a multi-pass fusion chain
    measured ~4x over its bandwidth floor in the int8 train step (35 ms/step
    at llama2-1b bs8 seq2048, profile_step.py fusion.384/396). Same fp32
    formula; dgamma's cross-row sum associates per row-block (grid-
    sequential accumulate), so it differs from the jnp oracle only by fp32
    summation order."""
    M, K = x.shape
    bm = _pick_block(M, K, elem_bytes=2 * x.dtype.itemsize)
    if bm is None:
        raise ValueError(f"no row blocks for shape {x.shape}")
    dx, dg = pl.pallas_call(
        _make_norm_bwd_kernel(norm_eps),
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, K), x.dtype),
            jax.ShapeDtypeStruct((1, K), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, g, dy)
    return dx, dg


# ---------------------------------------------------------------------------
# silu backward -> both-axis int8 quantize of (dgate, dup)
# ---------------------------------------------------------------------------


def silu_mul_bwd_f32(a: Array, b: Array, dy: Array):
    """fp32 producer backward: y = silu(a)*b -> (da, db), unrounded.

    (The unfused composite rounds silu(a) to bf16 before the db product —
    quant/fused.py _silu_mm_bwd; the fused kernels keep fp32 throughout,
    the same 1-LSB policy as every other fused producer here.)"""
    af = a.astype(jnp.float32)
    s = jax.nn.sigmoid(af)
    dyf = dy.astype(jnp.float32)
    da = dyf * b.astype(jnp.float32) * s * (1.0 + af * (1.0 - s))
    db = dyf * af * s
    return da, db


def _silu_bwd_block(a_ref, b_ref, dy_ref):
    return silu_mul_bwd_f32(a_ref[:], b_ref[:], dy_ref[:])


def _make_silu_bwd_row_kernel(eps, sr, with_amax=True, with_bf16=False):
    """Rowwise-int8 quantize of the silu-mul backward pair.

    ``with_amax``: also accumulate per-column absmaxes (feeds the colwise
    pass when grad_weight is int8). ``with_bf16``: also write (da, db)
    rounded to the input dtype — the operands of a BF16 grad_weight matmul
    when only grad_input is int8 (gw=False configs); emitting them here
    keeps the backward at ONE read of (a, b, dy) instead of XLA's unfused
    f32 chain (measured: a 25 ms/step f32 [B,S,F] transposing layout copy
    plus duplicate f32 materializations at llama2-1b bs8)."""

    def kernel(a_ref, b_ref, dy_ref, seed_ref, *out_refs):
        refs = list(out_refs)
        daq_ref, das_ref, dbq_ref, dbs_ref = refs[:4]
        refs = refs[4:]
        daa_ref = dba_ref = daf_ref = dbf_ref = None
        if with_amax:
            daa_ref, dba_ref = refs[:2]
            refs = refs[2:]
        if with_bf16:
            daf_ref, dbf_ref = refs[:2]
        pid = pl.program_id(0)
        if sr:
            pltpu.prng_seed(_block_seed(seed_ref, pid, jnp.int32(29)))
        da, db = _silu_bwd_block(a_ref, b_ref, dy_ref)

        if with_amax:

            @pl.when(pid == 0)
            def _():
                daa_ref[:] = jnp.zeros_like(daa_ref)
                dba_ref[:] = jnp.zeros_like(dba_ref)

        for v, q_ref, s_ref, am_ref, f_ref in (
            (da, daq_ref, das_ref, daa_ref, daf_ref),
            (db, dbq_ref, dbs_ref, dba_ref, dbf_ref),
        ):
            ya = jnp.abs(v)
            scale = jnp.max(ya, axis=1, keepdims=True) * (1.0 / 127.0)
            q = _round_op(v * _inv_scale(scale, eps), sr)
            q_ref[:] = jnp.clip(q, -128, 127).astype(jnp.int8)
            s_ref[:] = scale
            if with_amax:
                am_ref[:] = jnp.maximum(
                    am_ref[:], jnp.max(ya, axis=0, keepdims=True)
                )
            if with_bf16:
                f_ref[:] = v.astype(f_ref.dtype)

    return kernel


def _make_silu_bwd_col_kernel(eps, sr):
    def kernel(a_ref, b_ref, dy_ref, seed_ref, das_ref, dbs_ref,
               daq_ref, dbq_ref):
        if sr:
            pltpu.prng_seed(
                _block_seed(seed_ref, pl.program_id(0), jnp.int32(31))
            )
        da, db = _silu_bwd_block(a_ref, b_ref, dy_ref)
        qa = _round_op(da * _inv_scale(das_ref[:], eps), sr)
        daq_ref[:] = jnp.clip(qa, -128, 127).astype(jnp.int8)
        qb = _round_op(db * _inv_scale(dbs_ref[:], eps), sr)
        dbq_ref[:] = jnp.clip(qb, -128, 127).astype(jnp.int8)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("eps", "sr", "interpret", "with_amax", "with_bf16"),
)
def silu_mul_bwd_quant_rowwise(
    a: Array,
    b: Array,
    dy: Array,
    seed: Array | None = None,
    *,
    eps: float = _EPS,
    sr: bool = False,
    interpret: bool = False,
    with_amax: bool = True,
    with_bf16: bool = False,
):
    """(dgate, dup) of y = silu(a)*b, rowwise-INT8, in ONE read of
    (a, b, dy) — the bf16 dgate/dup never exist. Returns
    (da_q, da_s [M,1], db_q, db_s[, da_col_amax [1,K], db_col_amax]
    [, da_bf16, db_bf16]); the col amaxes feed
    :func:`silu_mul_bwd_quant_colwise` (one more read instead of two),
    the bf16 pair feeds BF16 grad_weight matmuls (gw=False configs)."""
    M, K = a.shape
    seed = _as_seed(seed)
    # block sizing counts the 3 input tiles (same as the 6-output amax
    # variant); the optional bf16 output pair adds ~25% resident VMEM on
    # top, well under the 16 MB scoped limit at the 32-row floor
    bm = _pick_block(M, K, elem_bytes=3 * a.dtype.itemsize,
                     vmem_budget=_SILU_VMEM_BUDGET)
    if bm is None:
        raise ValueError(f"no row blocks for shape {a.shape}")
    io = [
        pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    amax_spec = pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((bm, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_specs = io + io
    out_shape = [
        jax.ShapeDtypeStruct((M, K), jnp.int8),
        jax.ShapeDtypeStruct((M, 1), jnp.float32),
        jax.ShapeDtypeStruct((M, K), jnp.int8),
        jax.ShapeDtypeStruct((M, 1), jnp.float32),
    ]
    if with_amax:
        out_specs += [amax_spec, amax_spec]
        out_shape += [
            jax.ShapeDtypeStruct((1, K), jnp.float32),
            jax.ShapeDtypeStruct((1, K), jnp.float32),
        ]
    if with_bf16:
        out_specs += [full_spec, full_spec]
        out_shape += [
            jax.ShapeDtypeStruct((M, K), a.dtype),
            jax.ShapeDtypeStruct((M, K), a.dtype),
        ]
    out = pl.pallas_call(
        _make_silu_bwd_row_kernel(eps, sr, with_amax, with_bf16),
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _seed_spec(),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(a, b, dy, seed)
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("eps", "sr", "interpret"))
def silu_mul_bwd_quant_colwise(
    a: Array,
    b: Array,
    dy: Array,
    da_scale: Array,
    db_scale: Array,
    seed: Array | None = None,
    *,
    eps: float = _EPS,
    sr: bool = False,
    interpret: bool = False,
):
    """(dgate, dup) colwise-INT8 given precomputed col scales [1,K]
    (= the rowwise pass's col_amax/127): one more read of (a, b, dy),
    no bf16 intermediates. Returns (da_q, db_q)."""
    M, K = a.shape
    seed = _as_seed(seed)
    bm = _pick_block(M, K, elem_bytes=3 * a.dtype.itemsize,
                     vmem_budget=_SILU_VMEM_BUDGET)
    if bm is None:
        raise ValueError(f"no row blocks for shape {a.shape}")
    scale_spec = pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_silu_bwd_col_kernel(eps, sr),
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _seed_spec(),
            scale_spec,
            scale_spec,
        ],
        out_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, K), jnp.int8),
            jax.ShapeDtypeStruct((M, K), jnp.int8),
        ],
        interpret=interpret,
    )(a, b, dy, seed, da_scale, db_scale)
    return tuple(out)


def supported(M: int, K: int, dtype, n_inputs: int = 1) -> bool:
    """Whether the fused kernels can take [M, K] inputs of ``dtype``."""
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    if M < 32 or K < 128 or K % 128:
        return False
    eb = n_inputs * jnp.dtype(dtype).itemsize
    # multi-input kernels (silu fwd/bwd) size their blocks against the
    # larger silu budget — keep this check consistent with what they use
    budget = _SILU_VMEM_BUDGET if n_inputs >= 2 else 1024 * 1024
    return _pick_block(M, K, elem_bytes=eb, vmem_budget=budget) is not None


# ---------------------------------------------------------------------------
# layernorm -> int8 and gelu -> int8 (ViT producers, models/vit.py:92-128)
# ---------------------------------------------------------------------------


def layer_norm_ref(x: Array, g: Array, b: Array, eps: float) -> Array:
    """Unfused composite semantics (models.vit.layer_norm): fp32 math,
    xhat cast to the input dtype before the affine."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * g + b


def layer_norm_f32(x: Array, g: Array, b: Array, eps: float) -> Array:
    """Fused-kernel semantics of models.vit.layer_norm: fp32 throughout."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xhat = (xf - mean) * jax.lax.rsqrt(var + eps)
    return xhat * g.astype(jnp.float32) + b.astype(jnp.float32)


def gelu_f32(a: Array) -> Array:
    """Fused-kernel semantics of jax.nn.gelu (tanh approximation), fp32."""
    return jax.nn.gelu(a.astype(jnp.float32), approximate=True)


def _ln_block(x_ref, g_ref, b_ref, eps):
    xf = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    xhat = (xf - mean) * jax.lax.rsqrt(var + eps)
    return xhat * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)


def _gelu_block(a_ref):
    return jax.nn.gelu(a_ref[:].astype(jnp.float32), approximate=True)


def _producer_quant_call(
    producer, inputs, M, K, bm, seed, *, eps, sr, axis, interpret, salt,
    with_col_amax=False, scale=None,
):
    """Shared row/col quantize driver around an in-kernel producer.

    ``producer(refs) -> f32 [bm, K] block``; ``inputs`` are the [M, K]
    (or [1, K]) arrays it reads. axis=1: one pass, per-row scales
    (``with_col_amax`` adds the col absmax [1,K] as a third output).
    axis=0: two passes (col absmax accumulate, then scale+cast), or one
    pass when ``scale`` [1,K] is supplied."""
    n = len(inputs)
    in_specs = [
        pl.BlockSpec(
            (bm, K) if a.shape[0] != 1 else (1, K),
            (lambda i: (i, 0)) if a.shape[0] != 1 else (lambda i: (0, 0)),
            memory_space=pltpu.VMEM,
        )
        for a in inputs
    ]

    if axis == 1:

        def row_kernel(*refs):
            seed_ref, q_ref, s_ref = refs[n], refs[n + 1], refs[n + 2]
            y = producer(refs[:n])
            _quant_row_block(
                y, seed_ref, q_ref, s_ref, eps=eps, sr=sr,
                pid=pl.program_id(0),
                amax_ref=refs[n + 3] if with_col_amax else None,
            )

        out_specs = [
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((M, K), jnp.int8),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ]
        if with_col_amax:
            out_specs.append(
                pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
            out_shape.append(jax.ShapeDtypeStruct((1, K), jnp.float32))
        out = pl.pallas_call(
            row_kernel,
            grid=(M // bm,),
            in_specs=in_specs + [_seed_spec()],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(*inputs, seed)
        return tuple(out)

    def amax_kernel(*refs):
        amax_ref = refs[n]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            amax_ref[:] = jnp.zeros_like(amax_ref)

        y = producer(refs[:n])
        amax_ref[:] = jnp.maximum(
            amax_ref[:], jnp.max(jnp.abs(y), axis=0, keepdims=True)
        )

    if scale is None:
        amax = pl.pallas_call(
            amax_kernel,
            grid=(M // bm,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, K), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(*inputs)
        scale = amax * (1.0 / 127.0)

    def scale_kernel(*refs):
        seed_ref, s_ref, q_ref = refs[n], refs[n + 1], refs[n + 2]
        if sr:
            pltpu.prng_seed(
                _block_seed(seed_ref, pl.program_id(0), jnp.int32(salt))
            )
        y = producer(refs[:n])
        qv = _round_op(y * _inv_scale(s_ref[:], eps), sr)
        q_ref[:] = jnp.clip(qv, -128, 127).astype(jnp.int8)

    q = pl.pallas_call(
        scale_kernel,
        grid=(M // bm,),
        in_specs=in_specs
        + [
            _seed_spec(),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.int8),
        interpret=interpret,
    )(*inputs, seed, scale)
    return q, scale


@functools.partial(
    jax.jit,
    static_argnames=("axis", "norm_eps", "eps", "sr", "interpret",
                     "with_col_amax"),
)
def layernorm_quant(
    x: Array,
    g: Array,
    b: Array,
    seed: Array | None = None,
    *,
    axis: int = 1,
    norm_eps: float = 1e-6,
    eps: float = _EPS,
    sr: bool = False,
    interpret: bool = False,
    with_col_amax: bool = False,
    scale: Array | None = None,
):
    """quantize_int8(layer_norm(x, g, b), axis) with the norm in-kernel.

    x [M,K]; g, b [1,K]. axis=1: one HBM read (``with_col_amax`` adds
    the col absmax [1,K]); axis=0: two, or one given ``scale``."""
    M, K = x.shape
    bm = _pick_block(M, K, elem_bytes=x.dtype.itemsize)
    if bm is None:
        raise ValueError(f"no row blocks for shape {x.shape}")
    return _producer_quant_call(
        lambda refs: _ln_block(refs[0], refs[1], refs[2], norm_eps),
        (x, g, b), M, K, bm, _as_seed(seed),
        eps=eps, sr=sr, axis=axis, interpret=interpret, salt=17,
        with_col_amax=with_col_amax, scale=scale,
    )


@functools.partial(
    jax.jit,
    static_argnames=("axis", "eps", "sr", "interpret", "with_col_amax")
)
def gelu_quant(
    a: Array,
    seed: Array | None = None,
    *,
    axis: int = 1,
    eps: float = _EPS,
    sr: bool = False,
    interpret: bool = False,
    with_col_amax: bool = False,
    scale: Array | None = None,
):
    """quantize_int8(gelu(a), axis) with the activation in-kernel."""
    M, K = a.shape
    bm = _pick_block(M, K, elem_bytes=a.dtype.itemsize)
    if bm is None:
        raise ValueError(f"no row blocks for shape {a.shape}")
    return _producer_quant_call(
        lambda refs: _gelu_block(refs[0]),
        (a,), M, K, bm, _as_seed(seed),
        eps=eps, sr=sr, axis=axis, interpret=interpret, salt=19,
        with_col_amax=with_col_amax, scale=scale,
    )
