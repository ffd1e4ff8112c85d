"""Pallas fused quantize kernels vs the jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_training_tpu.ops import pallas_quant
from quantized_training_tpu.quant.core import quantize_int8


@pytest.mark.parametrize("shape", [(64, 128), (256, 384), (96, 256)])
@pytest.mark.parametrize("axis", [1, 0])
@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_matches_jnp_reference(shape, axis, dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype) * 3.0
    assert pallas_quant.supported(x, axis)
    if axis == 1:
        q, s = pallas_quant.quantize_int8_rowwise(x, interpret=True)
    else:
        q, s = pallas_quant.quantize_int8_colwise(x, interpret=True)
    q_ref, s_ref = quantize_int8(x, axis=axis)
    np.testing.assert_allclose(
        np.asarray(s, np.float32).ravel(),
        np.asarray(s_ref, np.float32).ravel(),
        rtol=1e-2,
    )
    # rounding ties can differ by 1 ulp through bf16 scale casting
    diff = np.abs(np.asarray(q, np.int32) - np.asarray(q_ref, np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


def test_roundtrip_accuracy():
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 256), jnp.float32)
    q, s = pallas_quant.quantize_int8_rowwise(x, interpret=True)
    recon = np.asarray(q, np.float32) * np.asarray(s, np.float32)
    err = np.abs(recon - np.asarray(x))
    assert err.max() <= np.abs(np.asarray(x)).max() / 127.0 + 1e-6


def test_supported_gates():
    x = jnp.zeros((64, 100), jnp.bfloat16)  # lane dim not /128
    assert not pallas_quant.supported(x, 1)
    x3 = jnp.zeros((2, 64, 128), jnp.bfloat16)
    assert not pallas_quant.supported(x3, 1)
    assert not pallas_quant.supported(jnp.zeros((64, 128), jnp.int8), 1)
