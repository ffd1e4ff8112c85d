"""INT8 flash attention (beyond the reference: quantized training attention).

Motivation: after the linear layers go INT8, attention is the largest
unquantized block of the mixed-precision train step (~200 ms of a ~1.05 s
step at llama2-1b bs8 on v5e). This kernel runs the score and PV matmuls
on the int8 MXU datapath:

  - q, k are quantized OUTSIDE per token over head_dim (rowwise absmax —
    scales stay off the contraction dim of Q K^T)
  - v is quantized per kv ROW (causal-safe: a per-block column scale
    would let FUTURE v values perturb past outputs through the shared
    absmax); the PV contraction still works because the v row scales are
    folded into p's columns before p is quantized — (p * v_s) @ (v / v_s)
    = p @ v, so the scales cancel exactly
  - p' = p * v_s is quantized IN-KERNEL with a per-q-row absmax (a cheap
    VMEM reduce; future columns are exactly zero so no leak)
  - the online softmax statistics (m, l) stay fp32, exactly like the bf16
    flash kernels; l is accumulated from the UNQUANTIZED fp32 p

Layout is splash-native grouped GQA: per (batch, kv_head) instance the
kernel sees q [G, S, hd] and shared k/v [S, hd]; causality is skipped at
block granularity and masked on the diagonal.

Numerics: scores carry q-row x k-row int8 error (~0.4% rms each), p
carries a per-row int8 grid — ~2% mean relative output error vs the bf16
oracle (tests/test_int8_attention.py), fully causal by construction.

STATUS — measured and shelved: on v5e at B8 KV4 G8 S2048 hd64 this
forward runs 7.5 ms/layer vs the bf16 splash kernel's 5.0 ms. An int8
QK^T contracting hd=64 gains nothing on the MXU (the contraction is too
shallow to hit the int8 rate), so quantized attention does NOT pay on
this chip geometry and the kernel is not wired into the model. Kept as
the measured answer to "why not quantize attention?" — revisit on parts
with a deeper-contraction attention (hd >= 128) or native int4 MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e30


def _fwd_kernel(
    qi_ref, qs_ref, ki_ref, ks_ref, vi_ref, vs_ref,
    out_ref, lse_ref,
    acc_ref, m_ref, l_ref,
    *, bq: int, bkv: int, causal: bool,
):
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # skip kv blocks that lie entirely in the future of this q block
    run = (j * bkv < (i + 1) * bq) if causal else (j >= 0)

    @pl.when(run)
    def _():
        # scores: int8 MXU dot contracting hd, rank-1 rescale
        s32 = jax.lax.dot_general(
            qi_ref[0], ki_ref[:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [bq, bkv]
        s = s32.astype(jnp.float32) * qs_ref[0] * ks_ref[:]

        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0) + i * bq
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1) + j * bkv
            s = jnp.where(col <= row, s, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # fp32, <= 1
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = m_new

        # fold the per-row v scales into p's columns (they cancel against
        # v_i8 = v / v_s in the dot), then quantize p' per q-row
        ps = p * vs_ref[:]
        pmax = jnp.max(ps, axis=1, keepdims=True)
        pscale = pmax * (1.0 / 127.0)
        p_i8 = jnp.round(ps * (1.0 / jnp.maximum(pscale, 1e-30))).astype(jnp.int8)
        pv = jax.lax.dot_general(
            p_i8, vi_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [bq, hd]
        acc_ref[:] = acc_ref[:] * alpha + pv.astype(jnp.float32) * pscale

    last_j = ((i + 1) * bq - 1) // bkv if causal else pl.num_programs(2) - 1

    @pl.when(j == last_j)
    def _():
        l = jnp.maximum(l_ref[:], 1e-20)
        out_ref[0] = (acc_ref[:] / l).astype(out_ref.dtype)
        lse_ref[0] = m_ref[:] + jnp.log(l)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_kv", "interpret"),
)
def int8_flash_fwd(
    q_i8: Array,   # [G, S, hd] int8
    q_s: Array,    # [G, S, 1] f32 (per-row scales)
    k_i8: Array,   # [S, hd] int8
    k_s: Array,    # [S] f32
    v_i8: Array,   # [S, hd] int8
    v_s: Array,    # [S] f32 (per kv-row scales, folded into p in-kernel)
    *,
    causal: bool = True,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: bool = False,
):
    """Returns (out [G, S, hd] bf16, lse [G, S, 1] f32)."""
    G, S, hd = q_i8.shape
    bq, bkv = min(block_q, S), min(block_kv, S)
    assert S % bq == 0 and S % bkv == 0

    qs2 = q_s.astype(jnp.float32).reshape(G, S, 1)
    ks2 = k_s.astype(jnp.float32).reshape(1, S)
    vs2 = v_s.astype(jnp.float32).reshape(1, S)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, bq=bq, bkv=bkv, causal=causal),
        grid=(G, S // bq, S // bkv),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda g, i, j: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda g, i, j: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bkv, hd), lambda g, i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv), lambda g, i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bkv, hd), lambda g, i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv), lambda g, i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, hd), lambda g, i, j: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda g, i, j: (g, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, S, hd), jnp.bfloat16),
            jax.ShapeDtypeStruct((G, S, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, hd), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_i8, qs2, k_i8, ks2, v_i8, vs2)
    return out, lse


def quantize_qkv(q: Array, k: Array, v: Array, block_kv: int | None = None):
    """Quantize grouped attention inputs for :func:`int8_flash_fwd`.

    q [G, S, hd], k/v [S, hd] (bf16) ->
    (q_i8, q_s [G,S,1], k_i8, k_s [S], v_i8, v_s [S]).
    Rowwise absmax everywhere: q/k scales lie off the QK contraction;
    v row scales are folded into p inside the kernel (see module doc).
    The softmax temperature hd**-0.5 (models.llama pre-scales q the same
    way before splash) is folded into q_s — the kernel's rank-1 score
    rescale applies it for free.
    """
    def row_q(x):
        a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        s = a / 127.0
        i8 = jnp.round(
            x.astype(jnp.float32) / jnp.clip(s, min=1e-12)
        ).astype(jnp.int8)
        return i8, s

    q_i8, q_s = row_q(q)          # q_s [G, S, 1]
    k_i8, k_s = row_q(k)          # k_s [S, 1]
    v_i8, v_s = row_q(v)
    q_s = q_s * (q.shape[-1] ** -0.5)
    return q_i8, q_s, k_i8, k_s[..., 0], v_i8, v_s[..., 0]


def attention_ref(q, k, v, causal=True):
    """bf16/fp32 oracle (same math as models.llama xla attention incl.
    the hd**-0.5 softmax temperature, MQA 1-group)."""
    G, S, hd = q.shape
    scores = jnp.einsum(
        "gsd,td->gst", q, k, preferred_element_type=jnp.float32
    ) * (hd ** -0.5)
    if causal:
        mask = jnp.tril(jnp.ones((S, S), bool))
        scores = jnp.where(mask, scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("gst,td->gsd", p.astype(q.dtype), v)
