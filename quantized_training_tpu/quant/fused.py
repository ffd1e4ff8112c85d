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

Dispatch: the fused path engages only for all-INT8 MixedPrecisionWeight
configs on TPU with kernel-admissible shapes; everything else falls back
to the exact unfused composite. ``QT_FUSED=0`` (env) or
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
from .mixed_precision import MixedPrecisionWeight, _all_int8, _pad_tokens

Array = jax.Array

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


def _norm_mm_impl(config, eps, interpret, x2d, gamma, ws, key):
    sr = config.stochastic_rounding
    seed = _kseed(_sub(key, 0)) if sr else None
    # with_col_amax: the rowwise kernel also accumulates the col absmax
    # of the SAME norm values, so the backward's colwise quantize needs
    # only ONE pass over x (scale precomputed) instead of two
    y_row, y_row_s, col_amax = pf.rmsnorm_quant_rowwise(
        x2d, gamma.reshape(1, -1), seed, norm_eps=eps, sr=sr,
        interpret=interpret, with_col_amax=True,
    )
    y_row_s = y_row_s.astype(x2d.dtype)
    outs = []
    for i, w in enumerate(ws):
        kw = jax.random.fold_in(_sub(key, 1), i) if sr else None
        w_row, w_row_s = quantize_int8(
            w, axis=1, stochastic_rounding=sr, key=kw
        )
        outs.append(
            scaled_mm_general(
                y_row, w_row, y_row_s, w_row_s, dims=(1, 1),
                out_dtype=x2d.dtype,
            )
        )
    return tuple(outs), col_amax


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _norm_mm(config, eps: float, interpret: bool, x2d, gamma, ws, key):
    return _norm_mm_impl(config, eps, interpret, x2d, gamma, ws, key)[0]


def _norm_mm_fwd(config, eps, interpret, x2d, gamma, ws, key):
    outs, col_amax = _norm_mm_impl(config, eps, interpret, x2d, gamma, ws, key)
    return outs, (x2d, gamma, ws, key, col_amax)


def _norm_mm_bwd(config, eps, interpret, res, gs):
    x2d, gamma, ws, key, col_amax = res
    sr = config.stochastic_rounding
    seed = _kseed(_sub(key, 2)) if sr else None
    # colwise-quantized norm output for grad_weight, fused: the bf16 norm
    # output is never materialized in the backward either, and the col
    # scale comes from the forward's amax (ONE pass instead of two)
    y_col, y_col_s = pf.rmsnorm_quant_colwise(
        x2d, gamma.reshape(1, -1), seed, norm_eps=eps, sr=sr,
        interpret=interpret, scale=col_amax * (1.0 / 127.0),
    )
    y_col_s = y_col_s.astype(x2d.dtype)
    dy = None
    grad_ws = []
    for i, (w, g) in enumerate(zip(ws, gs)):
        g = g.astype(x2d.dtype)
        kg = kw = None
        if sr:
            kg, kw = jax.random.split(jax.random.fold_in(_sub(key, 3), i))
        g_row, g_row_s, g_col, g_col_s = quantize_int8_both(
            g, stochastic_rounding=sr, key=kg
        )
        w_col, w_col_s = quantize_int8(
            w, axis=0, stochastic_rounding=sr, key=kw
        )
        gi = scaled_mm_general(
            g_row, w_col, g_row_s, w_col_s, dims=(1, 0), out_dtype=w.dtype
        )
        dy = gi if dy is None else dy + gi
        grad_ws.append(
            scaled_mm_general(
                g_col, y_col, g_col_s, y_col_s, dims=(0, 0), out_dtype=w.dtype
            )
        )
    dx, dgamma = _rmsnorm_bwd(x2d, gamma, dy, eps)
    return dx, dgamma, tuple(grad_ws), None


_norm_mm.defvjp(_norm_mm_fwd, _norm_mm_bwd)


def norm_linear_multi(x, gamma, weights, eps, *, key=None):
    """[y_i = rms_norm(x, gamma) @ w_i.T] with the norm fused into the
    shared input quantize when every weight is all-INT8 mixed-precision.

    Drop-in for ``rms_norm(x, gamma, eps)`` followed by
    ``qlinear_multi(...)`` — which is exactly the fallback path.
    """
    configs = {
        w.config for w in weights if isinstance(w, MixedPrecisionWeight)
    }
    fused = (
        len(configs) == 1
        and all(isinstance(w, MixedPrecisionWeight) for w in weights)
        and _all_int8(next(iter(configs)))
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
    outs = _norm_mm(
        cfg, float(eps), _interpret(), x2d, gamma,
        tuple(w.data for w in weights), key,
    )
    batch_dims = x.shape[:-1]
    return [
        o[:M].reshape(*batch_dims, w.data.shape[0])
        for o, w in zip(outs, weights)
    ]


# ---------------------------------------------------------------------------
# fused silu(a)*b -> linear
# ---------------------------------------------------------------------------


def _silu_mm_impl(config, interpret, a2d, b2d, w, key):
    sr = config.stochastic_rounding
    seed = _kseed(_sub(key, 0)) if sr else None
    y_row, y_row_s, col_amax = pf.silu_mul_quant_rowwise(
        a2d, b2d, seed, sr=sr, interpret=interpret, with_col_amax=True
    )
    y_row_s = y_row_s.astype(a2d.dtype)
    kw = _sub(key, 1) if sr else None
    w_row, w_row_s = quantize_int8(w, axis=1, stochastic_rounding=sr, key=kw)
    out = scaled_mm_general(
        y_row, w_row, y_row_s, w_row_s, dims=(1, 1), out_dtype=a2d.dtype
    )
    return out, col_amax


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _silu_mm(config, interpret: bool, a2d, b2d, w, key):
    return _silu_mm_impl(config, interpret, a2d, b2d, w, key)[0]


def _silu_mm_fwd(config, interpret, a2d, b2d, w, key):
    out, col_amax = _silu_mm_impl(config, interpret, a2d, b2d, w, key)
    return out, (a2d, b2d, w, key, col_amax)


def _silu_mm_bwd(config, interpret, res, g):
    a2d, b2d, w, key, col_amax = res
    g = g.astype(a2d.dtype)
    sr = config.stochastic_rounding
    seed = _kseed(_sub(key, 2)) if sr else None
    # col scale from the forward's amax -> ONE read of (a, b), not two
    y_col, y_col_s = pf.silu_mul_quant_colwise(
        a2d, b2d, seed, sr=sr, interpret=interpret,
        scale=col_amax * (1.0 / 127.0),
    )
    y_col_s = y_col_s.astype(a2d.dtype)
    kg = kw = None
    if sr:
        kg, kw = jax.random.split(_sub(key, 3))
    g_row, g_row_s, g_col, g_col_s = quantize_int8_both(
        g, stochastic_rounding=sr, key=kg
    )
    w_col, w_col_s = quantize_int8(w, axis=0, stochastic_rounding=sr, key=kw)
    dy = scaled_mm_general(
        g_row, w_col, g_row_s, w_col_s, dims=(1, 0), out_dtype=w.dtype
    )
    grad_w = scaled_mm_general(
        g_col, y_col, g_col_s, y_col_s, dims=(0, 0), out_dtype=w.dtype
    )
    # producer backward: y = silu_bf16(a) * b
    af = a2d.astype(jnp.float32)
    s = jax.nn.sigmoid(af)
    silu = (af * s).astype(a2d.dtype)
    dyf = dy.astype(jnp.float32)
    db = (dyf * silu.astype(jnp.float32)).astype(b2d.dtype)
    dsilu = s * (1.0 + af * (1.0 - s))
    da = (dyf * b2d.astype(jnp.float32) * dsilu).astype(a2d.dtype)
    return da, db, grad_w, None


_silu_mm.defvjp(_silu_mm_fwd, _silu_mm_bwd)


def silu_mul_linear(gate, up, w, *, key=None):
    """(silu(gate) * up) @ w.T with the activation fused into the input
    quantize for all-INT8 mixed-precision weights.

    Drop-in for ``jax.nn.silu(gate) * up`` followed by ``qlinear``."""
    fused = isinstance(w, MixedPrecisionWeight) and _all_int8(w.config)
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
    out = _silu_mm(w.config, _interpret(), a2d, b2d, w.data, key)[:M]
    batch_dims = gate.shape[:-1]
    return out.reshape(*batch_dims, w.data.shape[0])


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
    y_row, y_row_s, col_amax = pf.layernorm_quant(
        x2d, g.reshape(1, -1), b.reshape(1, -1), seed, axis=1,
        norm_eps=eps, sr=sr, interpret=interpret, with_col_amax=True,
    )
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
    seed = _kseed(_sub(key, 2)) if sr else None
    y_col, y_col_s = pf.layernorm_quant(
        x2d, g.reshape(1, -1), b.reshape(1, -1), seed, axis=0,
        norm_eps=eps, sr=sr, interpret=interpret,
        scale=col_amax * (1.0 / 127.0),
    )
    y_col_s = y_col_s.astype(x2d.dtype)
    kg = kw = None
    if sr:
        kg, kw = jax.random.split(_sub(key, 3))
    g_row, g_row_s, g_col, g_col_s = quantize_int8_both(
        gout, stochastic_rounding=sr, key=kg
    )
    w_col, w_col_s = quantize_int8(w, axis=0, stochastic_rounding=sr, key=kw)
    dy = scaled_mm_general(
        g_row, w_col, g_row_s, w_col_s, dims=(1, 0), out_dtype=w.dtype
    )
    grad_w = scaled_mm_general(
        g_col, y_col, g_col_s, y_col_s, dims=(0, 0), out_dtype=w.dtype
    )
    dx, dg, db = _layernorm_bwd_math(x2d, g, b, dy, eps)
    return dx, dg, db, grad_w, None


_ln_mm.defvjp(_ln_mm_fwd, _ln_mm_bwd)


def layernorm_linear(x, g, b, w, eps, *, bias=None, key=None):
    """layer_norm(x, g, b) @ w.T + bias with the norm fused into the
    input quantize for all-INT8 mixed-precision weights.

    Drop-in for ``models.vit.layer_norm`` followed by ``qlinear``."""
    fused = isinstance(w, MixedPrecisionWeight) and _all_int8(w.config)
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
    y_row, y_row_s, col_amax = pf.gelu_quant(
        a2d, seed, axis=1, sr=sr, interpret=interpret, with_col_amax=True
    )
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
    seed = _kseed(_sub(key, 2)) if sr else None
    y_col, y_col_s = pf.gelu_quant(
        a2d, seed, axis=0, sr=sr, interpret=interpret,
        scale=col_amax * (1.0 / 127.0),
    )
    y_col_s = y_col_s.astype(a2d.dtype)
    kg = kw = None
    if sr:
        kg, kw = jax.random.split(_sub(key, 3))
    g_row, g_row_s, g_col, g_col_s = quantize_int8_both(
        gout, stochastic_rounding=sr, key=kg
    )
    w_col, w_col_s = quantize_int8(w, axis=0, stochastic_rounding=sr, key=kw)
    dy = scaled_mm_general(
        g_row, w_col, g_row_s, w_col_s, dims=(1, 0), out_dtype=w.dtype
    )
    grad_w = scaled_mm_general(
        g_col, y_col, g_col_s, y_col_s, dims=(0, 0), out_dtype=w.dtype
    )
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
    fused = isinstance(w, MixedPrecisionWeight) and _all_int8(w.config)
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
