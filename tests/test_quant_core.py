"""Tests for core quantization numerics (quant/core.py) against
hand-computed references and round-trip/statistical properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_training_tpu.quant import core


class TestQuantizeInt8:
    def test_roundtrip_error_bound(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
        q, s = core.quantize_int8(x, axis=-1)
        assert q.dtype == jnp.int8 and s.shape == (64, 1)
        deq = core.dequantize_int8(q, s)
        # max error <= scale/2 per row
        err = jnp.abs(deq - x)
        assert jnp.all(err <= s / 2 + 1e-7)

    def test_absmax_maps_to_127(self):
        x = jnp.array([[1.0, -2.0, 4.0, -8.0]])
        q, s = core.quantize_int8(x)
        np.testing.assert_allclose(s, 8.0 / 127)
        np.testing.assert_array_equal(np.asarray(q)[0, 3], -127)

    def test_axis0(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (16, 32))
        q, s = core.quantize_int8(x, axis=0)
        assert s.shape == (1, 32)

    def test_scale_dtype_follows_input(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (8, 8), jnp.bfloat16)
        q, s = core.quantize_int8(x)
        assert s.dtype == jnp.bfloat16

    def test_stochastic_rounding_unbiased(self):
        # a value exactly between grid points rounds up ~50% of the time
        x = jnp.full((1, 10000), 0.5 * 4.0 / 127)  # q = 0.5 on the grid
        x = x.at[0, 0].set(4.0)  # pin the scale
        keys = jax.random.split(jax.random.PRNGKey(3), 20)
        means = []
        for k in keys:
            q, s = core.quantize_int8(x, stochastic_rounding=True, key=k)
            means.append(np.asarray(q[0, 1:], np.float64).mean())
        m = np.mean(means)
        assert 0.45 < m < 0.55, m

    def test_sr_requires_key(self):
        with pytest.raises(ValueError):
            core.quantize_int8(jnp.ones((2, 2)), stochastic_rounding=True)


class TestInt4Groupwise:
    def test_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 64), jnp.float32)
        packed, scale, zp = core.quantize_int4_groupwise(x, group_size=32)
        assert packed.shape == (16, 16) and packed.dtype == jnp.uint8
        deq = core.dequantize_int4_groupwise(packed, scale, zp, (8, 64))
        err = jnp.abs(deq - x)
        assert jnp.all(err <= jnp.repeat(scale, 32).reshape(8, 64) / 2 + 1e-6)

    def test_extremes_hit_grid_ends(self):
        x = jnp.arange(32, dtype=jnp.float32)[None, :]
        packed, scale, zp = core.quantize_int4_groupwise(x, group_size=32)
        hi = np.asarray(packed >> 4)
        lo = np.asarray(packed & 0xF)
        u4 = np.stack([hi, lo], -1).reshape(-1)
        assert u4.min() == 0 and u4.max() == 15
        np.testing.assert_allclose(np.asarray(zp), [0.0])
        np.testing.assert_allclose(np.asarray(scale), [31.0 / 15])


class TestInt4Rowwise:
    def test_pack_unpack_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 64), jnp.float32) * 3
        packed, scale = core.quantize_int4_rowwise_absmax(x)
        assert packed.dtype == jnp.int8 and packed.shape == (4, 32)
        vals = core.unpack_int4_rowwise(packed)
        assert vals.shape == (4, 64)
        assert vals.min() >= -8 and vals.max() <= 7
        deq = vals.astype(jnp.float32) * scale[:, None]
        assert jnp.max(jnp.abs(deq - x)) <= jnp.max(scale) / 2 + 1e-6

    def test_asymmetric_range(self):
        # row with max negative magnitude uses -8
        x = jnp.array([[-8.0, 7.0, 1.0, -1.0]])
        packed, scale = core.quantize_int4_rowwise_absmax(x)
        np.testing.assert_allclose(np.asarray(scale), [1.0])
        vals = np.asarray(core.unpack_int4_rowwise(packed))
        np.testing.assert_array_equal(vals, [[-8, 7, 1, -1]])


class TestBitNet:
    def test_ternary(self):
        w = jnp.array([[0.5, -0.5, 0.05, 2.0]], jnp.float32)
        scale = core.get_bitnet_scale(w)
        np.testing.assert_allclose(float(scale), (0.5 + 0.5 + 0.05 + 2.0) / 4)
        q = core.quantize_bitnet_weight(w, scale)
        np.testing.assert_array_equal(np.asarray(q), [[1, -1, 0, 1]])

    def test_pack_unpack_i2(self):
        x = jnp.array([[-1, 0, 1, -1, 1, 1, 0, 0]], jnp.int8)
        packed = core.pack_i2_in_i8(x)
        assert packed.shape == (1, 2)
        out = core.unpack_i2_in_i8(packed)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_pack_unpack_random(self):
        x = jax.random.randint(jax.random.PRNGKey(0), (16, 256), -1, 2, jnp.int8)
        out = core.unpack_i2_in_i8(core.pack_i2_in_i8(x))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


class TestBF16SR:
    def test_exact_bf16_passthrough(self):
        x = jnp.array([1.0, -2.5, 0.15625], jnp.float32)  # bf16-exact values
        out = core.bf16_stochastic_round(x, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(x, np.float32)
        )

    def test_unbiased(self):
        # midpoint between two bf16 grid points
        lo = jnp.float32(1.0)
        hi = jnp.asarray(jnp.nextafter(jnp.bfloat16(1.0), jnp.bfloat16(2.0)), jnp.float32)
        mid = jnp.full((20000,), (lo + hi) / 2, jnp.float32)
        out = core.bf16_stochastic_round(mid, jax.random.PRNGKey(1))
        frac_hi = float(jnp.mean((out.astype(jnp.float32) > lo).astype(jnp.float32)))
        assert 0.45 < frac_hi < 0.55, frac_hi
