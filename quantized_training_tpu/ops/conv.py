"""INT8 conv2d ops (triton_conv2d.py analog).

Contracts (kernels/gn_kernels/triton_conv2d.py:150-214, :385-396):
  - ``int8_conv2d(X, W, stride, padding)``: int8 x int8 -> int32
  - ``scaled_int8_conv2d(X, W, channel_scale, stride, padding)``: fused
    per-output-channel fp scale epilogue -> bf16
  - ``conv2d``: generic (bf16/fp32) with fp32 accumulation

Layout: NHWC activations and HWIO weights — the TPU-native "channels-last"
(the reference demands channels_last for the same reason,
triton_conv2d.py:209-213). XLA lowers ``lax.conv_general_dilated`` with
int8 operands + int32 accumulation onto the MXU as an implicit GEMM; the
scale epilogue fuses into it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_DN = ("NHWC", "HWIO", "NHWC")


def _norm2(v) -> tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def conv2d(
    x: Array,
    w: Array,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
) -> Array:
    """Generic conv: int8 inputs accumulate in int32, floats in fp32."""
    stride, padding = _norm2(stride), _norm2(padding)
    acc = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=_DN,
        preferred_element_type=acc,
    )
    return out if x.dtype == jnp.int8 else out.astype(x.dtype)


def int8_conv2d(
    x: Array,
    w: Array,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
) -> Array:
    """x [B,H,W,C] int8, w [kh,kw,C,O] int8 -> int32 [B,OH,OW,O]."""
    assert x.dtype == jnp.int8 and w.dtype == jnp.int8
    return conv2d(x, w, stride, padding)


def scaled_int8_conv2d(
    x: Array,
    w: Array,
    channel_scale: Array,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
    *,
    out_dtype=jnp.bfloat16,
) -> Array:
    """INT8 conv with a fused per-output-channel scale epilogue
    (triton_conv2d.py:316-319)."""
    assert x.dtype == jnp.int8 and w.dtype == jnp.int8
    acc = conv2d(x, w, stride, padding)
    return (
        acc.astype(jnp.float32) * channel_scale.astype(jnp.float32).reshape(1, 1, 1, -1)
    ).astype(out_dtype)
