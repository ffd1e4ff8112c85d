"""INT4 weight-only quantized training.

Behavioral parity with subclasses/int4.py:
  - weight stored as asymmetric group-wise uint4 (2/byte, default group 32)
    with per-group scale and zero_point (int4.py:42-64)
  - forward dequantizes and runs a bf16 matmul (int4.py:147-153)
  - backward is plain bf16 (int4.py:155-161), grad_weight routed to the
    differentiable master
  - optimizer updates the dequantized master and re-quantizes with
    stochastic rounding (int4.py:114-127) — via quant/api.py store_params.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from .core import dequantize_int4_groupwise, quantize_int4_groupwise

Array = jax.Array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["packed", "scale", "zero_point", "master"],
    meta_fields=["mat_shape", "group_size"],
)
@dataclass
class Int4Weight:
    """Group-wise asymmetric uint4 weight storage.

    For a weight of shape ``lead + (O, I)`` (lead = optional stacked-layer
    dims for scan), storage shapes are:
      packed:     lead + (O*I // group_size, group_size // 2)  uint8
      scale/zp:   lead + (O*I // group_size,)
    so the leading scan axis is preserved for ``lax.scan`` slicing.
    """

    packed: Array
    scale: Array
    zero_point: Array
    master: Array | None = None
    mat_shape: tuple = ()  # (O, I)
    group_size: int = 32

    @classmethod
    def from_float(cls, w: Array, group_size: int = 32):
        packed, scale, zp = _quantize(w, group_size, sr=False, key=None)
        return cls(packed, scale, zp, None, tuple(w.shape[-2:]), group_size)

    def dequantize(self) -> Array:
        lead = self.packed.shape[:-2]
        p2 = self.packed.reshape(-1, self.packed.shape[-1])
        s2 = self.scale.reshape(-1)
        z2 = self.zero_point.reshape(-1)
        full = lead + self.mat_shape
        return dequantize_int4_groupwise(p2, s2, z2, full)

    @property
    def dtype(self):
        return self.scale.dtype

    @property
    def shape(self):
        return self.packed.shape[:-2] + self.mat_shape


def _quantize(w: Array, group_size: int, sr: bool, key):
    lead = w.shape[:-2]
    n_groups = w.shape[-2] * w.shape[-1] // group_size
    packed, scale, zp = quantize_int4_groupwise(
        w, group_size, stochastic_rounding=sr, key=key
    )
    packed = packed.reshape(*lead, n_groups, group_size // 2)
    scale = scale.reshape(*lead, n_groups)
    zp = zp.reshape(*lead, n_groups)
    return packed, scale, zp


def requantize(w_new: Array, old: Int4Weight, key: Array) -> Int4Weight:
    """Re-quantize an updated master with SR (int4.py:114-127 semantics)."""
    packed, scale, zp = _quantize(w_new, old.group_size, sr=True, key=key)
    return Int4Weight(packed, scale, zp, None, old.mat_shape, old.group_size)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _int4_wo_linear(mat_shape, x2d, master, packed, scale, zero_point):
    del master
    return x2d @ _deq(packed, scale, zero_point, mat_shape).T


def _deq(packed, scale, zp, mat_shape):
    lead = packed.shape[:-2]
    return dequantize_int4_groupwise(
        packed.reshape(-1, packed.shape[-1]),
        scale.reshape(-1),
        zp.reshape(-1),
        lead + mat_shape,
    ).astype(scale.dtype)


def _int4_wo_linear_fwd(mat_shape, x2d, master, packed, scale, zero_point):
    return _int4_wo_linear(mat_shape, x2d, master, packed, scale, zero_point), (
        x2d,
        packed,
        scale,
        zero_point,
    )


def _int4_wo_linear_bwd(mat_shape, res, g):
    x2d, packed, scale, zero_point = res
    g = g.astype(scale.dtype)
    # re-dequantize instead of saving the bf16 weight, like int4.py:158
    w_deq = _deq(packed, scale, zero_point, mat_shape)
    grad_input = g @ w_deq
    grad_master = g.T @ x2d
    return (
        grad_input,
        grad_master,
        None,
        jnp.zeros_like(scale),
        jnp.zeros_like(zero_point),
    )


_int4_wo_linear.defvjp(_int4_wo_linear_fwd, _int4_wo_linear_bwd)


def linear(x: Array, w: Int4Weight, bias: Array | None = None, *, key=None) -> Array:
    del key
    batch_dims = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    master = w.master if w.master is not None else w.dequantize()
    out = _int4_wo_linear(w.mat_shape, x2d, master, w.packed, w.scale, w.zero_point)
    out = out.reshape(*batch_dims, w.mat_shape[0])
    if bias is not None:
        out = out + bias
    return out
