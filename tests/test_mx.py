"""MX / NVFP4 block quantization tests (ops/mx.py vs hand-computed
references and round-trip properties)."""

import jax
import jax.numpy as jnp
import numpy as np

from quantized_training_tpu.ops import mx


class TestFP4E2M1:
    def test_exact_grid_values(self):
        vals = jnp.asarray(
            [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0, -0.5, -6.0], jnp.float32
        )
        codes = mx.fp32_to_fp4e2m1(vals)
        decoded = mx.FP4E2M1_LUT[codes]
        np.testing.assert_array_equal(np.asarray(decoded), np.asarray(vals))

    def test_rounding_thresholds(self):
        # 0.25 -> 0 (<=0.25), 0.26 -> 0.5; 1.25 -> 1.0 (<=1.25), 1.26 -> 1.5
        vals = jnp.asarray([0.25, 0.26, 1.25, 1.26, 5.0, 5.01], jnp.float32)
        decoded = mx.FP4E2M1_LUT[mx.fp32_to_fp4e2m1(vals)]
        np.testing.assert_array_equal(
            np.asarray(decoded), [0.0, 0.5, 1.0, 1.5, 4.0, 6.0]
        )

    def test_pack_unpack(self):
        codes = jax.random.randint(jax.random.PRNGKey(0), (4, 64), 0, 16)
        packed = mx.pack_fp4(codes)
        assert packed.shape == (4, 32) and packed.dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(mx.unpack_fp4(packed)), np.asarray(codes))


class TestMXScales:
    def test_ocp_pow2_floor(self):
        # absmax 6.0 with fp4 amax-pow2 4.0 -> scale exp of 1.0 = 127
        absmax = jnp.asarray([4.0, 6.0, 8.0, 2.0], jnp.float32)
        bits = mx.absmax_to_mx_scales_ocp(absmax, "fp4")
        scale = np.asarray(
            jax.lax.bitcast_convert_type(bits << 23, jnp.float32)
        )
        np.testing.assert_array_equal(scale, [1.0, 1.0, 2.0, 0.5])

    def test_nv_round_up(self):
        # nv: scale = absmax/amax rounded UP to next pow2 when inexact
        absmax = jnp.asarray([6.0, 12.0, 5.9, 3.0], jnp.float32)
        bits = mx.absmax_to_mx_scales_nv(absmax, "fp4")
        scale = np.asarray(
            jax.lax.bitcast_convert_type(bits << 23, jnp.float32)
        )
        np.testing.assert_array_equal(scale, [1.0, 2.0, 1.0, 0.5])


class TestQuantizeMX:
    def test_mxfp4_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 128), jnp.float32)
        xq, scales = mx.quantize_mx(x, "fp4", "ocp")
        assert xq.shape == (8, 64) and scales.shape == (8, 4)
        assert scales.dtype == jnp.float8_e8m0fnu
        deq = mx.dequantize_mxfp4(xq, scales)
        rel = float(jnp.abs(deq - x).mean() / jnp.abs(x).mean())
        assert rel < 0.15, rel

    def test_mxfp8_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 128), jnp.float32) * 10
        xq, scales = mx.quantize_mx(x, jnp.float8_e4m3fn, "ocp")
        assert xq.dtype == jnp.float8_e4m3fn and xq.shape == x.shape
        scale_f32 = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(scales, jnp.uint8).astype(jnp.int32) << 23,
            jnp.float32,
        )
        deq = xq.astype(jnp.float32).reshape(8, -1, 32) * scale_f32[..., None]
        rel = float(jnp.abs(deq.reshape(x.shape) - x).mean() / jnp.abs(x).mean())
        assert rel < 0.05, rel

    def test_nv_method_also_valid(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 64), jnp.float32)
        xq, scales = mx.quantize_mx(x, "fp4", "nv")
        deq = mx.dequantize_mxfp4(xq, scales)
        rel = float(jnp.abs(deq - x).mean() / jnp.abs(x).mean())
        assert rel < 0.2, rel


class TestNVFP4:
    def test_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (16, 128), jnp.float32) * 3
        xq, scales, ts = mx.quantize_nvfp4(x)
        assert xq.shape == (16, 64) and scales.shape == (16, 8)
        assert scales.dtype == jnp.float8_e4m3fn
        deq = mx.dequantize_nvfp4(xq, scales, ts)
        rel = float(jnp.abs(deq - x).mean() / jnp.abs(x).mean())
        assert rel < 0.12, rel

    def test_provided_tensor_scale(self):
        x = jnp.ones((2, 32), jnp.float32)
        ts_in = jnp.float32(1.0 / 6.0)
        xq, scales, ts = mx.quantize_nvfp4(x, ts_in)
        assert float(ts) == float(ts_in)
        deq = mx.dequantize_nvfp4(xq, scales, ts)
        np.testing.assert_allclose(np.asarray(deq), np.asarray(x), rtol=0.2)

    def test_pack_block_scales_nv_shape(self):
        s = jnp.arange(128 * 8, dtype=jnp.float32).reshape(128, 8)
        packed = mx.pack_block_scales_nv(s)
        assert packed.shape == (128 * 8,)
        # first 16 entries: rows 0..3 of the first 4-col group interleaved
        np.testing.assert_array_equal(
            np.asarray(packed[:4]), np.asarray(s[0, :4])
        )


class TestFP4Matmuls:
    """mxfp4_mm / nvfp4_mm vs the dequantize-then-fp32-matmul oracle
    (the scaled_mm_ref methodology of benchmark_mm.py:46-50)."""

    def test_mxfp4_mm_matches_dequant_oracle(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        a = jax.random.normal(k1, (16, 64), jnp.float32)
        b_t = jax.random.normal(k2, (8, 64), jnp.float32)
        aq, sa = mx.quantize_mx(a, "fp4")
        bq, sb = mx.quantize_mx(b_t, "fp4")
        out = mx.mxfp4_mm(aq, bq, sa, sb, out_dtype=jnp.float32)
        ref = mx.dequantize_mxfp4(aq, sa) @ mx.dequantize_mxfp4(bq, sb).T
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=1e-2)

    def test_mxfp4_mm_bias(self):
        a = jnp.ones((4, 32), jnp.float32)
        b_t = jnp.ones((6, 32), jnp.float32)
        aq, sa = mx.quantize_mx(a, "fp4")
        bq, sb = mx.quantize_mx(b_t, "fp4")
        bias = jnp.arange(6, dtype=jnp.float32)
        out = mx.mxfp4_mm(aq, bq, sa, sb, bias, out_dtype=jnp.float32)
        out0 = mx.mxfp4_mm(aq, bq, sa, sb, out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out - out0), np.tile(np.arange(6), (4, 1)), atol=1e-4)

    def test_nvfp4_mm_matches_dequant_oracle(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        a = jax.random.normal(k1, (16, 64), jnp.float32)
        b_t = jax.random.normal(k2, (8, 64), jnp.float32)
        aq, sa, tsa = mx.quantize_nvfp4(a)
        bq, sb, tsb = mx.quantize_nvfp4(b_t)
        out_scale = tsa * tsb
        out = mx.nvfp4_mm(aq, bq, sa, sb, out_scale, out_dtype=jnp.float32)
        ref = mx.dequantize_nvfp4(aq, sa, tsa) @ mx.dequantize_nvfp4(bq, sb, tsb).T
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=1e-2)
