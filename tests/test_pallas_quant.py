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


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="in-kernel stochastic rounding uses the TPU PRNG "
    "(pltpu.prng_random_bits); run on a chip to exercise",
)
@pytest.mark.parametrize("axis", [1, 0])
def test_sr_unbiased_and_deterministic_tpu(axis):
    from quantized_training_tpu.quant.core import quantize_int8 as core_q

    x = jnp.full((256, 256), 0.3, jnp.float32)
    x = x.at[:, 0].set(1.0) if axis == 1 else x.at[0, :].set(1.0)
    k = jax.random.PRNGKey(7)
    q1, _ = core_q(x, axis=axis, stochastic_rounding=True, key=k)
    q2, _ = core_q(x, axis=axis, stochastic_rounding=True, key=k)
    assert bool(jnp.all(q1 == q2)), "same key must reproduce"

    acc = jnp.zeros_like(x)
    n = 100
    for i in range(n):
        q, s = core_q(x, axis=axis, stochastic_rounding=True, key=jax.random.PRNGKey(i))
        acc = acc + q.astype(jnp.float32) * s.astype(jnp.float32)
    interior = acc[:, 1:] / n if axis == 1 else acc[1:, :] / n
    assert abs(float(jnp.mean(interior)) - 0.3) < 2e-3, "SR must be unbiased"


def test_supported_gates():
    x = jnp.zeros((64, 100), jnp.bfloat16)  # lane dim not /128
    assert not pallas_quant.supported(x, 1)
    x3 = jnp.zeros((2, 64, 128), jnp.bfloat16)
    assert not pallas_quant.supported(x3, 1)
    assert not pallas_quant.supported(jnp.zeros((64, 128), jnp.int8), 1)


def test_rowwise_two_pass_wide_k():
    """Wide-K inputs must fall to the K-blocked two-pass kernels instead of
    compiling an over-budget single tile."""
    from quantized_training_tpu.ops.pallas_quant import _pick_block

    x = jax.random.normal(jax.random.PRNGKey(0), (32, 20480), jnp.float32) * 2
    assert _pick_block(32, 20480, elem_bytes=4) is None  # single-pass rejected
    assert pallas_quant.supported(x, 1)
    q, s = pallas_quant.quantize_int8_rowwise(x, interpret=True)
    q_ref, s_ref = quantize_int8(x, axis=1)
    np.testing.assert_allclose(
        np.asarray(s, np.float32).ravel(), np.asarray(s_ref, np.float32).ravel(), rtol=1e-5
    )
    assert np.abs(np.asarray(q, np.int32) - np.asarray(q_ref, np.int32)).max() <= 1


@pytest.mark.parametrize("shape", [(64, 128), (256, 384)])
def test_both_axis_matches_separate_kernels(shape):
    """quantize_int8_both == (rowwise, colwise) bit-exactly (non-SR)."""
    x = jax.random.normal(jax.random.PRNGKey(3), shape, jnp.bfloat16) * 2.0
    assert pallas_quant.both_supported(x)
    qr, sr_, qc, sc = pallas_quant.quantize_int8_both(x, interpret=True)
    qr_ref, sr_ref = pallas_quant.quantize_int8_rowwise(x, interpret=True)
    qc_ref, sc_ref = pallas_quant.quantize_int8_colwise(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(qr), np.asarray(qr_ref))
    np.testing.assert_array_equal(np.asarray(qc), np.asarray(qc_ref))
    np.testing.assert_array_equal(np.asarray(sr_), np.asarray(sr_ref))
    np.testing.assert_array_equal(np.asarray(sc), np.asarray(sc_ref))


def test_both_axis_core_fallback_matches():
    """CPU fallback path of core.quantize_int8_both == separate calls."""
    from quantized_training_tpu.quant.core import quantize_int8_both

    x = jax.random.normal(jax.random.PRNGKey(4), (64, 256), jnp.bfloat16)
    qr, sr_, qc, sc = quantize_int8_both(x)
    qr_ref, sr_ref = quantize_int8(x, axis=1)
    qc_ref, sc_ref = quantize_int8(x, axis=0)
    np.testing.assert_array_equal(np.asarray(qr), np.asarray(qr_ref))
    np.testing.assert_array_equal(np.asarray(qc), np.asarray(qc_ref))
    np.testing.assert_array_equal(
        np.asarray(sr_, np.float32), np.asarray(sr_ref, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(sc, np.float32), np.asarray(sc_ref, np.float32)
    )
