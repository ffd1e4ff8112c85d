"""Producer-fused quantized linears (VERDICT r3 item 1c).

``norm_linear_multi`` fuses RMSNorm into the input quantize of the
shared-input multi-linear (qkv and gate/up sites); ``silu_mul_linear``
fuses silu(gate)*up into the down-projection's input quantize. In both
cases the bf16 producer output — re-materialized and re-read around every
quantize custom call in the forward, the remat recompute, AND the
backward's colwise pass — never touches HBM: the producer runs inside the
quantize kernel (ops/pallas_fused.py).

These are ``jax.custom_vjp`` ops whose backward re-derives the colwise-
quantized input directly from the producer's inputs, so the semantics
match the unfused path (rms_norm -> linear_shared / silu*mul -> linear)
with identical quantization numerics: same absmax/127 scales of the same
producer values, same round-half-even, same scaled int8 matmuls
(reference: subclasses/mixed_precision.py:100-134 per-matmul dynamic
re-quantization — here the re-quantize is fused, not skipped).

Dispatch: the fused path engages for int8 configs with output AND
grad_input quantized (see _fusable_cfg for the measured reasoning) on
TPU with kernel-admissible shapes, for both dynamic MixedPrecisionWeight
and per-step PreQuantMPWeight weights; everything else falls back to the
exact unfused composite. ``QT_FUSED=0`` (env) or
``set_impl('off')`` restores the unfused path for A/B;
``set_impl('interpret')`` runs the fused kernels in interpret mode so CPU
tests can exercise the full custom_vjp.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import _dispatch
from ..ops import pallas_fused as pf
from ..ops.scaled_mm import scaled_mm_general
from . import mixed_precision as _mp
from .core import quantize_int8, quantize_int8_both
from .mixed_precision import (
    MixedPrecisionWeight,
    PreQuantMPWeight,
    _pad_tokens,
)

# Weight types the fused producers accept. PreQuantMPWeight (per-step
# pre-quantized views, QT_PREQUANT) rides the same custom_vjps with its
# row/col int8 views passed alongside the bf16 master; a 0-sized view
# (dynamic MixedPrecisionWeight, or a mode-restricted prequant) selects
# the in-op dynamic quantize — a static shape branch, the
# _mp_linear_pq pattern. Measured at llama2-1b 4x4 eff-16 (r5): fused
# producers save ~35 ms/step and prequantized weights ~46 ms/step on
# DISJOINT HBM passes, so they compose.
_FUSED_WEIGHT_TYPES = (MixedPrecisionWeight, PreQuantMPWeight)


def _w_views(w):
    """MixedPrecision/PreQuant weight -> (orig, row_q, row_s, col_q,
    col_s) with 0-sized placeholders where no precomputed view exists."""
    if isinstance(w, PreQuantMPWeight):
        return w.orig, w.row_q, w.row_s, w.col_q, w.col_s
    z, s = _mp._placeholder(w.data)
    return w.data, z, s, z, s


def _row_view(w, rq, rs, sr, key):
    """Forward (rowwise) int8 view of w: precomputed or dynamic."""
    if rq.size:
        return rq, rs
    return quantize_int8(w, axis=1, stochastic_rounding=sr, key=key)


def _col_view(w, cq, cs, sr, key):
    """grad_input (colwise) int8 view of w: precomputed or dynamic."""
    if cq.size:
        return cq, cs
    return quantize_int8(w, axis=0, stochastic_rounding=sr, key=key)


def _fusable_cfg(config) -> bool:
    """Configs the producer-fused ops cover (VERDICT r4 item 3: the fused
    path was gated on all-INT8, leaving the ladder's fwd-only and fwd+gi
    rungs on the unfused composite — where the int8 grad_input matmul's
    flat [M,N] output forces XLA to materialize the silu/norm backward
    chains in f32 with a ~25 ms/step transposing layout copy, making the
    gi rung SLOWER than fwd-only for three rounds).

    Requires the forward matmul AND grad_input int8: the fusion pays when
    the backward consumes quantized cotangents (the in-kernel silu-bwd
    quantize is what kills the f32 layout copies). Measured on v5e at
    llama2-1b bs8 (r5): fwd-only config unfused 15,520 vs fused 15,277
    tok/s — for an all-BF16 backward XLA's own epilogue fusion of the
    dgrad into the producer backward beats the custom_vjp split, so
    fwd-only (and grad_weight-without-grad_input) fall back. With gi
    int8 the fused path turned the three-rounds-negative gi rung
    positive: 15,415 vs fwd-only's 15,520 baseline (was 15,076 unfused
    in r4)."""
    return (
        config.dtype == "int8" and config.output and config.grad_input
    )

Array = jax.Array

# checkpoint_name tag on the forwarded column-absmax outputs of the fused
# producer kernels. Why: the camaxes are custom_vjp RESIDUALS, and a
# multi-output custom call cannot be partially DCE'd — so under remat the
# replay re-runs the whole producing kernel (and everything downstream of
# its other outputs: the down-projection GEMM consumes the replayed act_q,
# the o-projection GEMM the replayed attention-out quantize) just to
# rebuild a [1, K] f32 vector. Saving the camaxes across the layer
# checkpoint (models/llama.py adds this name to the remat policy) lets the
# replay DCE the silu-row quantize, the down GEMM, the attn-out quantize
# and the o GEMM — none of their outputs are residuals. The bf16 config
# has no such coupling (XLA DCEs plain dots in the replay on its own), so
# this is a pure int8-side saving. Cost: ~a few hundred KB of saved f32
# vectors per layer.
QUANT_AMAX_RESIDUAL = "quant_amax_residuals"


def _name_amax(v: Array) -> Array:
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(v, QUANT_AMAX_RESIDUAL)


_IMPL = "auto"  # auto | off | interpret


def set_impl(mode: str) -> None:
    """'auto' (fused on TPU), 'off' (always unfused), 'interpret'
    (fused kernels in interpret mode — CPU test hook)."""
    assert mode in ("auto", "off", "interpret"), mode
    global _IMPL
    _IMPL = mode


def _interpret() -> bool:
    return _IMPL == "interpret"


def _fused_ok(M: int, K: int, dtype, n_inputs: int = 1) -> bool:
    if _IMPL == "off" or os.environ.get("QT_FUSED", "1") == "0":
        return False
    if _dispatch.raw_backend() == "xla":
        return False  # explicit XLA A/B opt-out disables fused producers too
    if not pf.supported(M, K, dtype, n_inputs):
        return False
    if _IMPL == "interpret":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _kseed(key: Array) -> Array:
    """key -> int32 seed for the in-kernel TPU PRNG (quant/core.py:90-97)."""
    return jax.lax.bitcast_convert_type(
        jax.random.bits(key, (1,), jnp.uint32), jnp.int32
    )


def _sub(key: Array, i: int) -> Array:
    return jax.random.fold_in(key, i)


# ---------------------------------------------------------------------------
# rmsnorm backward (closed form, fp32 math)
# ---------------------------------------------------------------------------


def _rmsnorm_bwd_math(x2d: Array, gamma: Array, dy: Array, eps: float):
    xf = x2d.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    gf = gamma.astype(jnp.float32)
    rstd = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    xn = xf * rstd
    dxn = dyf * gf
    dx = (dxn - xn * jnp.mean(dxn * xn, axis=-1, keepdims=True)) * rstd
    dgamma = jnp.sum(dyf * xn, axis=0)
    return dx.astype(x2d.dtype), dgamma.astype(gamma.dtype)


def _rmsnorm_bwd(x2d: Array, gamma: Array, dy: Array, eps: float):
    """Single-pass Pallas rmsnorm backward on TPU (same fp32 formula as
    _rmsnorm_bwd_math; XLA lowers that math ~4x over its bandwidth floor
    in the int8 step), jnp fallback elsewhere."""
    if _fused_ok(x2d.shape[0], x2d.shape[1], x2d.dtype, n_inputs=2):
        dx, dg = pf.rmsnorm_bwd(
            x2d, gamma.reshape(1, -1), dy, norm_eps=eps,
            interpret=_interpret(),
        )
        return dx, dg.reshape(-1).astype(gamma.dtype)
    return _rmsnorm_bwd_math(x2d, gamma, dy, eps)


# ---------------------------------------------------------------------------
# fused norm -> shared-input multi-linear
# ---------------------------------------------------------------------------


def _norm_mm_impl(config, eps, interpret, x2d, gamma, ws, row_qs, row_ss,
                  col_qs, col_ss, key):
    sr = config.stochastic_rounding
    seed = _kseed(_sub(key, 0)) if sr else None
    # with_col_amax (int8 grad_weight only): the rowwise kernel also
    # accumulates the col absmax of the SAME norm values, so the
    # backward's colwise quantize needs only ONE pass over x (scale
    # precomputed) instead of two
    if config.grad_weight:
        y_row, y_row_s, col_amax = pf.rmsnorm_quant_rowwise(
            x2d, gamma.reshape(1, -1), seed, norm_eps=eps, sr=sr,
            interpret=interpret, with_col_amax=True,
        )
        col_amax = _name_amax(col_amax)
    else:
        y_row, y_row_s = pf.rmsnorm_quant_rowwise(
            x2d, gamma.reshape(1, -1), seed, norm_eps=eps, sr=sr,
            interpret=interpret, with_col_amax=False,
        )
        col_amax = None
    y_row_s = y_row_s.astype(x2d.dtype)
    outs = []
    for i, w in enumerate(ws):
        kw = jax.random.fold_in(_sub(key, 1), i) if sr else None
        w_row, w_row_s = _row_view(w, row_qs[i], row_ss[i], sr, kw)
        outs.append(
            scaled_mm_general(
                y_row, w_row, y_row_s, w_row_s, dims=(1, 1),
                out_dtype=x2d.dtype,
            )
        )
    return tuple(outs), col_amax


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _norm_mm(config, eps: float, interpret: bool, x2d, gamma, ws, row_qs,
             row_ss, col_qs, col_ss, key):
    return _norm_mm_impl(
        config, eps, interpret, x2d, gamma, ws, row_qs, row_ss, col_qs,
        col_ss, key,
    )[0]


def _norm_mm_fwd(config, eps, interpret, x2d, gamma, ws, row_qs, row_ss,
                 col_qs, col_ss, key):
    outs, col_amax = _norm_mm_impl(
        config, eps, interpret, x2d, gamma, ws, row_qs, row_ss, col_qs,
        col_ss, key,
    )
    return outs, (x2d, gamma, ws, col_qs, col_ss, key, col_amax)


def _bf16_wgrad(g, h):
    """grad_w = g.T @ h expressed transpose-free: contract BOTH over the
    token dim (axis 0) with g as LHS so the result is [out, in]."""
    return jax.lax.dot_general(
        g, h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(h.dtype)


def _norm_mm_bwd(config, eps, interpret, res, gs):
    x2d, gamma, ws, col_qs, col_ss, key, col_amax = res
    sr = config.stochastic_rounding
    gw8 = config.grad_weight
    if gw8:
        seed = _kseed(_sub(key, 2)) if sr else None
        # colwise-quantized norm output for grad_weight, fused: the bf16
        # norm output is never materialized in the backward either, and
        # the col scale comes from the forward's amax (ONE pass not two)
        y_col, y_col_s = pf.rmsnorm_quant_colwise(
            x2d, gamma.reshape(1, -1), seed, norm_eps=eps, sr=sr,
            interpret=interpret, scale=col_amax * (1.0 / 127.0),
        )
        y_col_s = y_col_s.astype(x2d.dtype)
    else:
        # BF16 grad_weight: recompute the norm output once (unfused
        # composite semantics, shared by every weight's wgrad)
        h = pf.rms_norm_ref(x2d, gamma, eps)
    dy = None
    grad_ws = []
    for i, (w, g) in enumerate(zip(ws, gs)):
        g = g.astype(x2d.dtype)
        kg = kw = None
        if sr:
            kg, kw = jax.random.split(jax.random.fold_in(_sub(key, 3), i))
        # grad_input is int8 in every fused config (_fusable_cfg)
        if gw8:
            g_row, g_row_s, g_col, g_col_s = quantize_int8_both(
                g, stochastic_rounding=sr, key=kg
            )
        else:
            g_row, g_row_s = quantize_int8(
                g, axis=1, stochastic_rounding=sr, key=kg
            )
        w_col, w_col_s = _col_view(w, col_qs[i], col_ss[i], sr, kw)
        gi = scaled_mm_general(
            g_row, w_col, g_row_s, w_col_s, dims=(1, 0), out_dtype=w.dtype
        )
        dy = gi if dy is None else dy + gi
        if gw8:
            grad_ws.append(
                scaled_mm_general(
                    g_col, y_col, g_col_s, y_col_s, dims=(0, 0),
                    out_dtype=w.dtype,
                )
            )
        else:
            grad_ws.append(_bf16_wgrad(g, h))
    dx, dgamma = _rmsnorm_bwd(x2d, gamma, dy, eps)
    n = len(ws)
    return (dx, dgamma, tuple(grad_ws), (None,) * n, (None,) * n,
            (None,) * n, (None,) * n, None)


_norm_mm.defvjp(_norm_mm_fwd, _norm_mm_bwd)


def norm_linear_multi(x, gamma, weights, eps, *, key=None):
    """[y_i = rms_norm(x, gamma) @ w_i.T] with the norm fused into the
    shared input quantize when every weight is all-INT8 mixed-precision.

    Drop-in for ``rms_norm(x, gamma, eps)`` followed by
    ``qlinear_multi(...)`` — which is exactly the fallback path.
    """
    configs = {
        w.config for w in weights if isinstance(w, _FUSED_WEIGHT_TYPES)
    }
    fused = (
        len(configs) == 1
        and all(isinstance(w, _FUSED_WEIGHT_TYPES) for w in weights)
        and _fusable_cfg(next(iter(configs)))
    )
    if fused:
        x2d = x.reshape(-1, x.shape[-1])
        x2d, M = _pad_tokens(x2d)
        fused = _fused_ok(x2d.shape[0], x2d.shape[1], x.dtype)
    if not fused:
        from .api import qlinear_multi

        h = pf.rms_norm_ref(x, gamma, eps)
        return qlinear_multi(h, weights, key=key)

    cfg = next(iter(configs))
    if key is None:
        if cfg.stochastic_rounding:
            raise ValueError("stochastic_rounding requires a PRNG key")
        key = jax.random.PRNGKey(0)
    views = [_w_views(w) for w in weights]
    outs = _norm_mm(
        cfg, float(eps), _interpret(), x2d, gamma,
        tuple(v[0] for v in views), tuple(v[1] for v in views),
        tuple(v[2] for v in views), tuple(v[3] for v in views),
        tuple(v[4] for v in views), key,
    )
    batch_dims = x.shape[:-1]
    return [
        o[:M].reshape(*batch_dims, w.shape[-2])
        for o, w in zip(outs, weights)
    ]


# ---------------------------------------------------------------------------
# fused silu(a)*b -> linear
# ---------------------------------------------------------------------------


def _silu_mm_impl(config, interpret, a2d, b2d, w, rq, rs, cq, cs, key):
    sr = config.stochastic_rounding
    seed = _kseed(_sub(key, 0)) if sr else None
    if config.grad_weight:
        y_row, y_row_s, col_amax = pf.silu_mul_quant_rowwise(
            a2d, b2d, seed, sr=sr, interpret=interpret, with_col_amax=True
        )
        col_amax = _name_amax(col_amax)
    else:
        y_row, y_row_s = pf.silu_mul_quant_rowwise(
            a2d, b2d, seed, sr=sr, interpret=interpret, with_col_amax=False
        )
        col_amax = None
    y_row_s = y_row_s.astype(a2d.dtype)
    kw = _sub(key, 1) if sr else None
    w_row, w_row_s = _row_view(w, rq, rs, sr, kw)
    out = scaled_mm_general(
        y_row, w_row, y_row_s, w_row_s, dims=(1, 1), out_dtype=a2d.dtype
    )
    return out, col_amax


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _silu_mm(config, interpret: bool, a2d, b2d, w, rq, rs, cq, cs, key):
    return _silu_mm_impl(config, interpret, a2d, b2d, w, rq, rs, cq, cs,
                         key)[0]


def _silu_mm_fwd(config, interpret, a2d, b2d, w, rq, rs, cq, cs, key):
    out, col_amax = _silu_mm_impl(
        config, interpret, a2d, b2d, w, rq, rs, cq, cs, key
    )
    return out, (a2d, b2d, w, cq, cs, key, col_amax)


def _silu_mm_bwd(config, interpret, res, g):
    a2d, b2d, w, cq, cs, key, col_amax = res
    g = g.astype(a2d.dtype)
    sr = config.stochastic_rounding
    gw8 = config.grad_weight
    kg = kw = None
    if sr:
        kg, kw = jax.random.split(_sub(key, 3))
    # grad_input is int8 in every fused config (_fusable_cfg)
    if gw8:
        g_row, g_row_s, g_col, g_col_s = quantize_int8_both(
            g, stochastic_rounding=sr, key=kg
        )
    else:
        g_row, g_row_s = quantize_int8(
            g, axis=1, stochastic_rounding=sr, key=kg
        )
    w_col, w_col_s = _col_view(w, cq, cs, sr, kw)
    dy = scaled_mm_general(
        g_row, w_col, g_row_s, w_col_s, dims=(1, 0), out_dtype=w.dtype
    )
    if gw8:
        seed = _kseed(_sub(key, 2)) if sr else None
        # col scale from the forward's amax -> ONE read of (a, b), not two
        y_col, y_col_s = pf.silu_mul_quant_colwise(
            a2d, b2d, seed, sr=sr, interpret=interpret,
            scale=col_amax * (1.0 / 127.0),
        )
        grad_w = scaled_mm_general(
            g_col, y_col, g_col_s, y_col_s.astype(a2d.dtype),
            dims=(0, 0), out_dtype=w.dtype,
        )
    else:
        grad_w = _bf16_wgrad(g, pf.silu_mul_ref(a2d, b2d))
    # producer backward: y = silu_bf16(a) * b
    af = a2d.astype(jnp.float32)
    s = jax.nn.sigmoid(af)
    silu = (af * s).astype(a2d.dtype)
    dyf = dy.astype(jnp.float32)
    db = (dyf * silu.astype(jnp.float32)).astype(b2d.dtype)
    dsilu = s * (1.0 + af * (1.0 - s))
    da = (dyf * b2d.astype(jnp.float32) * dsilu).astype(a2d.dtype)
    return da, db, grad_w, None, None, None, None, None


_silu_mm.defvjp(_silu_mm_fwd, _silu_mm_bwd)


def silu_mul_linear(gate, up, w, *, key=None):
    """(silu(gate) * up) @ w.T with the activation fused into the input
    quantize for all-INT8 mixed-precision weights.

    Drop-in for ``jax.nn.silu(gate) * up`` followed by ``qlinear``."""
    fused = isinstance(w, _FUSED_WEIGHT_TYPES) and _fusable_cfg(w.config)
    if fused:
        a2d = gate.reshape(-1, gate.shape[-1])
        b2d = up.reshape(-1, up.shape[-1])
        a2d, M = _pad_tokens(a2d)
        b2d, _ = _pad_tokens(b2d)
        fused = _fused_ok(
            a2d.shape[0], a2d.shape[1], gate.dtype, n_inputs=2
        )
    if not fused:
        from .api import qlinear

        act = pf.silu_mul_ref(gate, up)
        return qlinear(act, w, key=key)

    if key is None:
        if w.config.stochastic_rounding:
            raise ValueError("stochastic_rounding requires a PRNG key")
        key = jax.random.PRNGKey(0)
    wv = _w_views(w)
    out = _silu_mm(w.config, _interpret(), a2d, b2d, *wv, key)[:M]
    batch_dims = gate.shape[:-1]
    return out.reshape(*batch_dims, w.shape[-2])


# ---------------------------------------------------------------------------
# fused MLP block: norm -> (gate, up) -> silu*mul -> down, one custom_vjp
# ---------------------------------------------------------------------------


def _mlp_mm_impl(config, eps, interpret, x2d, gamma, ws, row_qs, row_ss,
                 col_qs, col_ss, key):
    wg, wu, wd = ws
    sr = config.stochastic_rounding
    gw8 = config.grad_weight
    seed = _kseed(_sub(key, 0)) if sr else None
    if gw8:
        h_q, h_s, h_camax = pf.rmsnorm_quant_rowwise(
            x2d, gamma.reshape(1, -1), seed, norm_eps=eps, sr=sr,
            interpret=interpret, with_col_amax=True,
        )
        h_camax = _name_amax(h_camax)
    else:
        h_q, h_s = pf.rmsnorm_quant_rowwise(
            x2d, gamma.reshape(1, -1), seed, norm_eps=eps, sr=sr,
            interpret=interpret, with_col_amax=False,
        )
        h_camax = None
    h_s = h_s.astype(x2d.dtype)
    outs = []
    for i, w in enumerate((wg, wu)):
        kw = jax.random.fold_in(_sub(key, 1), i) if sr else None
        w_row, w_row_s = _row_view(w, row_qs[i], row_ss[i], sr, kw)
        outs.append(
            scaled_mm_general(
                h_q, w_row, h_s, w_row_s, dims=(1, 1), out_dtype=x2d.dtype
            )
        )
    gate, up = outs
    seed2 = _kseed(_sub(key, 2)) if sr else None
    if gw8:
        act_q, act_s, act_camax = pf.silu_mul_quant_rowwise(
            gate, up, seed2, sr=sr, interpret=interpret, with_col_amax=True
        )
        act_camax = _name_amax(act_camax)
    else:
        act_q, act_s = pf.silu_mul_quant_rowwise(
            gate, up, seed2, sr=sr, interpret=interpret, with_col_amax=False
        )
        act_camax = None
    act_s = act_s.astype(x2d.dtype)
    kw = _sub(key, 3) if sr else None
    wd_row, wd_row_s = _row_view(wd, row_qs[2], row_ss[2], sr, kw)
    out = scaled_mm_general(
        act_q, wd_row, act_s, wd_row_s, dims=(1, 1), out_dtype=x2d.dtype
    )
    return out, (gate, up, h_camax, act_camax)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _mlp_mm(config, eps: float, interpret: bool, x2d, gamma, ws, row_qs,
            row_ss, col_qs, col_ss, key):
    """Whole llama MLP as ONE quantized op: rms_norm -> gate/up -> silu*mul
    -> down, with every producer fused into its input quantize.

    Combining the two ops (norm-multi-linear + silu-linear) into one
    custom_vjp is what lets the BACKWARD fuse across their boundary: the
    (dgate, dup) cotangents — which the two-op composite materializes in
    bf16 (one XLA fusion writing 2x[T,F]) and then re-reads 4x for the
    both-axis quantizes (~55 ms/step at llama2-1b bs8) — are computed
    and quantized along both axes directly from (gate, up, dact) by
    ops/pallas_fused.py::silu_mul_bwd_quant_{rowwise,colwise}, never
    touching HBM in bf16. Quantization semantics are unchanged
    (absmax/127 per matmul, per-matmul re-quantization as in
    subclasses/mixed_precision.py:100-134); like every fused producer
    here the quantize sees unrounded fp32 values (1-LSB policy)."""
    return _mlp_mm_impl(
        config, eps, interpret, x2d, gamma, ws, row_qs, row_ss, col_qs,
        col_ss, key,
    )[0]


def _mlp_mm_fwd(config, eps, interpret, x2d, gamma, ws, row_qs, row_ss,
                col_qs, col_ss, key):
    out, (gate, up, h_camax, act_camax) = _mlp_mm_impl(
        config, eps, interpret, x2d, gamma, ws, row_qs, row_ss, col_qs,
        col_ss, key,
    )
    return out, (
        x2d, gamma, ws, col_qs, col_ss, key, gate, up, h_camax, act_camax
    )


def _mlp_mm_bwd(config, eps, interpret, res, g):
    x2d, gamma, ws, col_qs, col_ss, key, gate, up, h_camax, act_camax = res
    wg, wu, wd = ws
    g = g.astype(x2d.dtype)
    sr = config.stochastic_rounding
    gw8 = config.grad_weight  # grad_input is int8 per _fusable_cfg

    # down-proj backward
    kg = kw = None
    if sr:
        kg, kw = jax.random.split(_sub(key, 4))
    if gw8:
        g_row, g_row_s, g_col, g_col_s = quantize_int8_both(
            g, stochastic_rounding=sr, key=kg
        )
    else:
        g_row, g_row_s = quantize_int8(
            g, axis=1, stochastic_rounding=sr, key=kg
        )
    wd_col, wd_col_s = _col_view(wd, col_qs[2], col_ss[2], sr, kw)
    dact = scaled_mm_general(
        g_row, wd_col, g_row_s, wd_col_s, dims=(1, 0), out_dtype=wd.dtype
    )
    if gw8:
        seed3 = _kseed(_sub(key, 5)) if sr else None
        act_col, act_col_s = pf.silu_mul_quant_colwise(
            gate, up, seed3, sr=sr, interpret=interpret,
            scale=act_camax * (1.0 / 127.0),
        )
        wd_grad = scaled_mm_general(
            g_col, act_col, g_col_s, act_col_s.astype(wd.dtype),
            dims=(0, 0), out_dtype=wd.dtype,
        )
    else:
        wd_grad = _bf16_wgrad(g, pf.silu_mul_ref(gate, up))

    # (dgate, dup): computed (AND quantized, per config) in-kernel
    if gw8:
        seed4 = _kseed(_sub(key, 6)) if sr else None
        da_q, da_s, db_q, db_s, da_camax, db_camax = (
            pf.silu_mul_bwd_quant_rowwise(
                gate, up, dact, seed4, sr=sr, interpret=interpret
            )
        )
        seed5 = _kseed(_sub(key, 7)) if sr else None
        da_qc, db_qc = pf.silu_mul_bwd_quant_colwise(
            gate, up, dact, da_camax * (1.0 / 127.0),
            db_camax * (1.0 / 127.0), seed5, sr=sr, interpret=interpret,
        )
        dgu = ((da_q, da_s), (db_q, db_s))
    else:
        # rowwise-int8 (dgate, dup) for the int8 dgrads AND their bf16
        # twins for the BF16 wgrads — one kernel, one read of
        # (gate, up, dact); without this XLA materializes the silu
        # backward in f32 with a transposing layout copy (the 3-round
        # negative gi rung, VERDICT r4 item 3)
        seed4 = _kseed(_sub(key, 6)) if sr else None
        da_q, da_s, db_q, db_s, da_bf, db_bf = pf.silu_mul_bwd_quant_rowwise(
            gate, up, dact, seed4, sr=sr, interpret=interpret,
            with_amax=False, with_bf16=True,
        )
        dgu = ((da_q, da_s), (db_q, db_s))

    if gw8:
        # gate/up wgrads against the colwise-quantized norm output
        seed6 = _kseed(_sub(key, 8)) if sr else None
        h_col, h_col_s = pf.rmsnorm_quant_colwise(
            x2d, gamma.reshape(1, -1), seed6, norm_eps=eps, sr=sr,
            interpret=interpret, scale=h_camax * (1.0 / 127.0),
        )
        h_col_s = h_col_s.astype(x2d.dtype)
    else:
        h = pf.rms_norm_ref(x2d, gamma, eps)
    dh = None
    grads_w = []
    for i, w in enumerate((wg, wu)):
        v_row, v_row_s = dgu[i]
        kw = jax.random.fold_in(_sub(key, 9), i) if sr else None
        w_col, w_col_s = _col_view(w, col_qs[i], col_ss[i], sr, kw)
        di = scaled_mm_general(
            v_row, w_col, v_row_s.astype(w.dtype), w_col_s,
            dims=(1, 0), out_dtype=w.dtype,
        )
        dh = di if dh is None else dh + di
        if gw8:
            v_col = (da_qc, db_qc)[i]
            v_camax = (da_camax, db_camax)[i]
            grads_w.append(
                scaled_mm_general(
                    v_col, h_col,
                    (v_camax * (1.0 / 127.0)).astype(w.dtype), h_col_s,
                    dims=(0, 0), out_dtype=w.dtype,
                )
            )
        else:
            grads_w.append(_bf16_wgrad((da_bf, db_bf)[i], h))
    dx, dgamma = _rmsnorm_bwd(x2d, gamma, dh, eps)
    return (dx, dgamma, (grads_w[0], grads_w[1], wd_grad),
            (None,) * 3, (None,) * 3, (None,) * 3, (None,) * 3, None)


_mlp_mm.defvjp(_mlp_mm_fwd, _mlp_mm_bwd)


def mlp_linear(x, gamma, wg, wu, wd, eps, *, key=None):
    """Fused llama MLP: (silu(norm(x)@wg.T) * (norm(x)@wu.T)) @ wd.T.

    Drop-in for ``norm_linear_multi`` + ``silu_mul_linear`` when all
    three weights are all-INT8 mixed-precision with one config; falls
    back to exactly that composite otherwise."""
    ws = (wg, wu, wd)
    configs = {w.config for w in ws if isinstance(w, _FUSED_WEIGHT_TYPES)}
    fused = (
        len(configs) == 1
        and all(isinstance(w, _FUSED_WEIGHT_TYPES) for w in ws)
        and _fusable_cfg(next(iter(configs)))
    )
    if fused:
        x2d = x.reshape(-1, x.shape[-1])
        x2d, M = _pad_tokens(x2d)
        F = wg.shape[-2]
        fused = _fused_ok(x2d.shape[0], x2d.shape[1], x.dtype) and _fused_ok(
            x2d.shape[0], F, x.dtype, n_inputs=3
        )
    if not fused:
        if key is None:
            key = jax.random.PRNGKey(0)
        gate, up = norm_linear_multi(
            x, gamma, [wg, wu], eps, key=jax.random.fold_in(key, 0)
        )
        return silu_mul_linear(gate, up, wd, key=jax.random.fold_in(key, 1))
    cfg = next(iter(configs))
    if key is None:
        if cfg.stochastic_rounding:
            raise ValueError("stochastic_rounding requires a PRNG key")
        key = jax.random.PRNGKey(0)
    views = [_w_views(w) for w in ws]
    out = _mlp_mm(
        cfg, float(eps), _interpret(), x2d, gamma,
        tuple(v[0] for v in views), tuple(v[1] for v in views),
        tuple(v[2] for v in views), tuple(v[3] for v in views),
        tuple(v[4] for v in views), key,
    )[:M]
    return out.reshape(*x.shape[:-1], wd.shape[-2])


# ---------------------------------------------------------------------------
# fused grouped-attention-output -> o-proj linear
# ---------------------------------------------------------------------------


def _const_pair_tables(S: int, hd: int):
    c = jnp.ones((S, 2 * hd), jnp.float32)
    return c, jnp.zeros_like(c)


def _group_cotangent(dctx2d: Array, B: int, S: int, kv: int, hd: int,
                     interpret: bool) -> Array:
    """[B*S, H*hd] cotangent -> grouped [B,KV,G,S,hd] (no rotation)."""
    from ..ops import pallas_rope as pr

    x4 = dctx2d.reshape(B, S, -1, hd)
    if interpret or pr._use_kernel(x4):
        c2, s2 = _const_pair_tables(S, hd)
        return pr.rope_group_kernel(x4, c2, s2, kv=kv, interpret=interpret)
    one = jnp.ones((S, hd), x4.dtype)
    return pr.rope_group_ref(x4, one, jnp.zeros_like(one), kv)


def _attn_out_mm_impl(config, interpret, out_g, w, rq, rs, cq, cs, key):
    from ..ops import pallas_rope as pr

    B, KV, G, S, hd = out_g.shape
    sr = config.stochastic_rounding
    seed = _kseed(_sub(key, 0)) if sr else None
    row_amax, col_amax = pr.ungroup_amax(out_g, interpret=interpret)
    x_row = pr.ungroup_quant(
        out_g, row_amax * (1.0 / 127.0), seed, axis=1, sr=sr,
        interpret=interpret,
    ).reshape(B * S, KV * G * hd)
    x_row_s = (row_amax * (1.0 / 127.0)).reshape(B * S, 1).astype(w.dtype)
    kw = _sub(key, 1) if sr else None
    w_row, w_row_s = _row_view(w, rq, rs, sr, kw)
    out = scaled_mm_general(
        x_row, w_row, x_row_s, w_row_s, dims=(1, 1), out_dtype=w.dtype
    )
    # col amax is the backward's colwise scale — int8 grad_weight only
    col_amax = _name_amax(col_amax) if config.grad_weight else None
    return out, col_amax


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _attn_out_mm(config, interpret: bool, out_g, w, rq, rs, cq, cs, key):
    """Grouped attention output [B,KV,G,S,hd] @ w.T -> [B*S, out].

    The ungrouping runs INSIDE the int8 quantize kernels
    (ops/pallas_rope.py ungroup_quant): the bf16 [B*S, H*hd] o-proj
    input never exists — not in the forward, not in the remat replay,
    and the backward's colwise operand reuses the forward's col absmax
    (one read of the grouped output instead of ungroup + 2-pass
    quantize)."""
    return _attn_out_mm_impl(config, interpret, out_g, w, rq, rs, cq, cs,
                             key)[0]


def _attn_out_mm_fwd(config, interpret, out_g, w, rq, rs, cq, cs, key):
    out, col_amax = _attn_out_mm_impl(
        config, interpret, out_g, w, rq, rs, cq, cs, key
    )
    return out, (out_g, w, cq, cs, key, col_amax)


def _ungroup_bf16(out_g, interpret):
    """[B,KV,G,S,hd] -> bf16 [B*S, H*hd] (no rotation) — the BF16
    grad_weight operand when only the forward/grad_input are int8."""
    from ..ops import pallas_rope as pr

    B, KV, G, S, hd = out_g.shape
    if interpret or pr._use_kernel(out_g):
        c2, s2 = _const_pair_tables(S, hd)
        ctx = pr.rope_ungroup_kernel(
            out_g, c2, s2, inverse=True, interpret=interpret
        )
    else:
        one = jnp.ones((S, hd), out_g.dtype)
        ctx = pr.rope_ungroup_ref(
            out_g, one, jnp.zeros_like(one), KV, inverse=True
        )
    return ctx.reshape(B * S, KV * G * hd)


def _attn_out_mm_bwd(config, interpret, res, g):
    from ..ops import pallas_rope as pr

    out_g, w, cq, cs, key, col_amax = res
    B, KV, G, S, hd = out_g.shape
    g = g.astype(w.dtype)
    sr = config.stochastic_rounding
    gw8 = config.grad_weight  # grad_input is int8 per _fusable_cfg
    kg = kw = None
    seed = _kseed(_sub(key, 2)) if sr else None
    if sr:
        kg, kw = jax.random.split(_sub(key, 3))
    if gw8:
        g_row, g_row_s, g_col, g_col_s = quantize_int8_both(
            g, stochastic_rounding=sr, key=kg
        )
    else:
        g_row, g_row_s = quantize_int8(
            g, axis=1, stochastic_rounding=sr, key=kg
        )
    w_col, w_col_s = _col_view(w, cq, cs, sr, kw)
    dctx = scaled_mm_general(
        g_row, w_col, g_row_s, w_col_s, dims=(1, 0), out_dtype=w.dtype
    )
    d_out_g = _group_cotangent(dctx, B, S, KV, hd, interpret)
    if gw8:
        x_col = pr.ungroup_quant(
            out_g, col_amax * (1.0 / 127.0), seed, axis=0, sr=sr,
            interpret=interpret,
        ).reshape(B * S, KV * G * hd)
        x_col_s = (col_amax * (1.0 / 127.0)).astype(w.dtype)
        grad_w = scaled_mm_general(
            g_col, x_col, g_col_s, x_col_s, dims=(0, 0), out_dtype=w.dtype
        )
    else:
        grad_w = _bf16_wgrad(g, _ungroup_bf16(out_g, interpret))
    return d_out_g, grad_w, None, None, None, None, None


_attn_out_mm.defvjp(_attn_out_mm_fwd, _attn_out_mm_bwd)


def attn_out_linear(out_g: Array, w, kv: int, *, key=None) -> Array:
    """Grouped attention output -> o_proj output [B, S, out_features].

    Drop-in for ``ungroup_heads(out_g, kv).reshape(B, S, -1)`` followed
    by ``qlinear(..., w)``; the fused path engages for all-INT8
    mixed-precision weights on TPU."""
    from ..ops.pallas_rope import ungroup_heads

    B, KV, G, S, hd = out_g.shape
    H = KV * G
    from ..ops.pallas_rope import _supported_heads

    fused = (
        isinstance(w, _FUSED_WEIGHT_TYPES)
        and _fusable_cfg(w.config)
        and (H * hd) % 128 == 0
        and (B * S) % 256 == 0
        and _supported_heads(H, G, hd, S)  # hd%64, S%8: kernel tiles
        and _fused_ok(B * S, H * hd, out_g.dtype)
    )
    if not fused:
        from .api import qlinear

        ctx = ungroup_heads(out_g, kv).reshape(B, S, H * hd)
        return qlinear(ctx, w, key=key)
    if key is None:
        if w.config.stochastic_rounding:
            raise ValueError("stochastic_rounding requires a PRNG key")
        key = jax.random.PRNGKey(0)
    out = _attn_out_mm(w.config, _interpret(), out_g, *_w_views(w), key)
    return out.reshape(B, S, w.shape[-2])


# ---------------------------------------------------------------------------
# ViT producers: layernorm -> linear, gelu -> linear (models/vit.py:92-128)
# ---------------------------------------------------------------------------


def _layernorm_bwd_math(x2d, g, b, dy, eps):
    xf = x2d.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    rstd = jax.lax.rsqrt(jnp.mean(xc * xc, axis=-1, keepdims=True) + eps)
    xhat = xc * rstd
    dxhat = dyf * gf
    dx = rstd * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    dg = jnp.sum(dyf * xhat, axis=0)
    db = jnp.sum(dyf, axis=0)
    return dx.astype(x2d.dtype), dg.astype(g.dtype), db.astype(b.dtype)


def _ln_mm_impl(config, eps, interpret, x2d, g, b, w, key):
    sr = config.stochastic_rounding
    seed = _kseed(_sub(key, 0)) if sr else None
    if config.grad_weight:
        y_row, y_row_s, col_amax = pf.layernorm_quant(
            x2d, g.reshape(1, -1), b.reshape(1, -1), seed, axis=1,
            norm_eps=eps, sr=sr, interpret=interpret, with_col_amax=True,
        )
    else:
        y_row, y_row_s = pf.layernorm_quant(
            x2d, g.reshape(1, -1), b.reshape(1, -1), seed, axis=1,
            norm_eps=eps, sr=sr, interpret=interpret, with_col_amax=False,
        )
        col_amax = None
    y_row_s = y_row_s.astype(x2d.dtype)
    kw = _sub(key, 1) if sr else None
    w_row, w_row_s = quantize_int8(w, axis=1, stochastic_rounding=sr, key=kw)
    out = scaled_mm_general(
        y_row, w_row, y_row_s, w_row_s, dims=(1, 1), out_dtype=x2d.dtype
    )
    return out, col_amax


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _ln_mm(config, eps: float, interpret: bool, x2d, g, b, w, key):
    return _ln_mm_impl(config, eps, interpret, x2d, g, b, w, key)[0]


def _ln_mm_fwd(config, eps, interpret, x2d, g, b, w, key):
    out, col_amax = _ln_mm_impl(config, eps, interpret, x2d, g, b, w, key)
    return out, (x2d, g, b, w, key, col_amax)


def _ln_mm_bwd(config, eps, interpret, res, gout):
    x2d, g, b, w, key, col_amax = res
    gout = gout.astype(x2d.dtype)
    sr = config.stochastic_rounding
    gw8 = config.grad_weight  # grad_input is int8 per _fusable_cfg
    kg = kw = None
    if sr:
        kg, kw = jax.random.split(_sub(key, 3))
    if gw8:
        g_row, g_row_s, g_col, g_col_s = quantize_int8_both(
            gout, stochastic_rounding=sr, key=kg
        )
    else:
        g_row, g_row_s = quantize_int8(
            gout, axis=1, stochastic_rounding=sr, key=kg
        )
    w_col, w_col_s = quantize_int8(
        w, axis=0, stochastic_rounding=sr, key=kw
    )
    dy = scaled_mm_general(
        g_row, w_col, g_row_s, w_col_s, dims=(1, 0), out_dtype=w.dtype
    )
    if gw8:
        seed = _kseed(_sub(key, 2)) if sr else None
        y_col, y_col_s = pf.layernorm_quant(
            x2d, g.reshape(1, -1), b.reshape(1, -1), seed, axis=0,
            norm_eps=eps, sr=sr, interpret=interpret,
            scale=col_amax * (1.0 / 127.0),
        )
        grad_w = scaled_mm_general(
            g_col, y_col, g_col_s, y_col_s.astype(x2d.dtype),
            dims=(0, 0), out_dtype=w.dtype,
        )
    else:
        grad_w = _bf16_wgrad(gout, pf.layer_norm_ref(x2d, g, b, eps))
    dx, dg, db = _layernorm_bwd_math(x2d, g, b, dy, eps)
    return dx, dg, db, grad_w, None


_ln_mm.defvjp(_ln_mm_fwd, _ln_mm_bwd)


def layernorm_linear(x, g, b, w, eps, *, bias=None, key=None):
    """layer_norm(x, g, b) @ w.T + bias with the norm fused into the
    input quantize for all-INT8 mixed-precision weights.

    Drop-in for ``models.vit.layer_norm`` followed by ``qlinear``."""
    fused = isinstance(w, MixedPrecisionWeight) and _fusable_cfg(w.config)
    if fused:
        x2d = x.reshape(-1, x.shape[-1])
        x2d, M = _pad_tokens(x2d)
        fused = _fused_ok(x2d.shape[0], x2d.shape[1], x.dtype)
    if not fused:
        from .api import qlinear

        h = pf.layer_norm_ref(x, g, b, eps)
        return qlinear(h, w, bias, key=key)

    if key is None:
        if w.config.stochastic_rounding:
            raise ValueError("stochastic_rounding requires a PRNG key")
        key = jax.random.PRNGKey(0)
    out = _ln_mm(w.config, float(eps), _interpret(), x2d, g, b, w.data, key)
    out = out[:M].reshape(*x.shape[:-1], w.data.shape[0])
    return out if bias is None else out + bias


def _gelu_mm_impl(config, interpret, a2d, w, key):
    sr = config.stochastic_rounding
    seed = _kseed(_sub(key, 0)) if sr else None
    if config.grad_weight:
        y_row, y_row_s, col_amax = pf.gelu_quant(
            a2d, seed, axis=1, sr=sr, interpret=interpret, with_col_amax=True
        )
        col_amax = _name_amax(col_amax)
    else:
        y_row, y_row_s = pf.gelu_quant(
            a2d, seed, axis=1, sr=sr, interpret=interpret,
            with_col_amax=False,
        )
        col_amax = None
    y_row_s = y_row_s.astype(a2d.dtype)
    kw = _sub(key, 1) if sr else None
    w_row, w_row_s = quantize_int8(w, axis=1, stochastic_rounding=sr, key=kw)
    out = scaled_mm_general(
        y_row, w_row, y_row_s, w_row_s, dims=(1, 1), out_dtype=a2d.dtype
    )
    return out, col_amax


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gelu_mm(config, interpret: bool, a2d, w, key):
    return _gelu_mm_impl(config, interpret, a2d, w, key)[0]


def _gelu_mm_fwd(config, interpret, a2d, w, key):
    out, col_amax = _gelu_mm_impl(config, interpret, a2d, w, key)
    return out, (a2d, w, key, col_amax)


def _gelu_mm_bwd(config, interpret, res, gout):
    a2d, w, key, col_amax = res
    gout = gout.astype(a2d.dtype)
    sr = config.stochastic_rounding
    gw8 = config.grad_weight  # grad_input is int8 per _fusable_cfg
    kg = kw = None
    if sr:
        kg, kw = jax.random.split(_sub(key, 3))
    if gw8:
        g_row, g_row_s, g_col, g_col_s = quantize_int8_both(
            gout, stochastic_rounding=sr, key=kg
        )
    else:
        g_row, g_row_s = quantize_int8(
            gout, axis=1, stochastic_rounding=sr, key=kg
        )
    w_col, w_col_s = quantize_int8(
        w, axis=0, stochastic_rounding=sr, key=kw
    )
    dy = scaled_mm_general(
        g_row, w_col, g_row_s, w_col_s, dims=(1, 0), out_dtype=w.dtype
    )
    if gw8:
        seed = _kseed(_sub(key, 2)) if sr else None
        y_col, y_col_s = pf.gelu_quant(
            a2d, seed, axis=0, sr=sr, interpret=interpret,
            scale=col_amax * (1.0 / 127.0),
        )
        grad_w = scaled_mm_general(
            g_col, y_col, g_col_s, y_col_s.astype(a2d.dtype),
            dims=(0, 0), out_dtype=w.dtype,
        )
    else:
        grad_w = _bf16_wgrad(gout, jax.nn.gelu(a2d, approximate=True))
    # producer backward: elementwise gelu' via vjp (recomputed, XLA-fused)
    af = a2d.astype(jnp.float32)
    _, pullback = jax.vjp(lambda t: jax.nn.gelu(t, approximate=True), af)
    (da,) = pullback(dy.astype(jnp.float32))
    return da.astype(a2d.dtype), grad_w, None


_gelu_mm.defvjp(_gelu_mm_fwd, _gelu_mm_bwd)


def gelu_linear(a, w, *, bias=None, key=None):
    """gelu(a) @ w.T + bias with the activation fused into the input
    quantize for all-INT8 mixed-precision weights.

    Drop-in for ``jax.nn.gelu`` followed by ``qlinear``."""
    fused = isinstance(w, MixedPrecisionWeight) and _fusable_cfg(w.config)
    if fused:
        a2d = a.reshape(-1, a.shape[-1])
        a2d, M = _pad_tokens(a2d)
        fused = _fused_ok(a2d.shape[0], a2d.shape[1], a.dtype)
    if not fused:
        from .api import qlinear

        return qlinear(jax.nn.gelu(a), w, bias, key=key)

    if key is None:
        if w.config.stochastic_rounding:
            raise ValueError("stochastic_rounding requires a PRNG key")
        key = jax.random.PRNGKey(0)
    out = _gelu_mm(w.config, _interpret(), a2d, w.data, key)
    out = out[:M].reshape(*a.shape[:-1], w.data.shape[0])
    return out if bias is None else out + bias
