"""Pallas kernel correctness vs the fp32 oracle, run in interpreter mode on
CPU (the real-TPU path is exercised by benchmark_mm.py on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_training_tpu.ops import pallas_mm, scaled_mm_ref

KW = dict(interpret=True, block_m=128, block_n=128)


def _ri8(key, shape):
    return jax.random.randint(key, shape, -128, 128, dtype=jnp.int8)


class TestPallasScaledMM:
    @pytest.mark.parametrize("m,k,n", [(128, 256, 128), (200, 384, 160)])
    def test_int8_row_col(self, m, k, n):
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        a, b = _ri8(ks[0], (m, k)), _ri8(ks[1], (k, n))
        sa = jax.random.uniform(ks[2], (m, 1)) * 0.1
        sb = jax.random.uniform(ks[3], (1, n)) * 0.1
        out = pallas_mm.scaled_mm(a, b, sa, sb, out_dtype=jnp.float32, block_k=128, **KW)
        ref = scaled_mm_ref(a, b, sa, sb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)

    def test_scalar_col_scale_bitnet_mode(self):
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        a, b = _ri8(ks[0], (128, 256)), _ri8(ks[1], (256, 128))
        sa = jax.random.uniform(ks[2], (128, 1))
        sb = jnp.float32(0.042)
        out = pallas_mm.scaled_mm(a, b, sa, sb, out_dtype=jnp.float32, block_k=128, **KW)
        ref = scaled_mm_ref(a, b, sa, sb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)

    def test_bf16_inputs(self):
        ks = jax.random.split(jax.random.PRNGKey(2), 2)
        a = jax.random.normal(ks[0], (128, 256), jnp.bfloat16)
        b = jax.random.normal(ks[1], (256, 128), jnp.bfloat16)
        out = pallas_mm.scaled_mm(
            a, b, jnp.ones((128, 1)), jnp.ones((1, 128)),
            out_dtype=jnp.float32, block_k=128, **KW,
        )
        ref = (a.astype(jnp.float32) @ b.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


class TestPallasTileScaledMM:
    def test_int8_tile(self):
        M, K, N = 256, 512, 256
        ks = jax.random.split(jax.random.PRNGKey(3), 4)
        a, b = _ri8(ks[0], (M, K)), _ri8(ks[1], (K, N))
        sa = jax.random.uniform(ks[2], (M // 128, K // 128)) * 0.1
        sb = jax.random.uniform(ks[3], (K // 128, N // 128)) * 0.1
        out = pallas_mm.tile_scaled_mm(a, b, sa, sb, out_dtype=jnp.float32, **KW)
        ref = scaled_mm_ref(a, b, sa, sb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)

    def test_int8_tile_deep_k_3d_scale_layout(self):
        """n_qk > 32 routes to the 3D-scale-layout kernel (the natural
        2D layout's (bm, n_q) scale block violates Mosaic's lane rule
        when n_q < n_qk — the r4 4096^3 cliff)."""
        M, K, N = 64, 128 * 40, 128  # n_qk = 40 -> n_q = 8, 5 K-steps
        ks = jax.random.split(jax.random.PRNGKey(5), 4)
        a, b = _ri8(ks[0], (M, K)), _ri8(ks[1], (K, N))
        sa = jax.random.uniform(ks[2], (M // 64, K // 128)) * 0.1
        sb = jax.random.uniform(ks[3], (K // 128, N // 128)) * 0.1
        out = pallas_mm.tile_scaled_mm(a, b, sa, sb, out_dtype=jnp.float32, **KW)
        ref = scaled_mm_ref(a, b, sa, sb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)


class TestPallasMatmul:
    def test_int8_exact(self):
        ks = jax.random.split(jax.random.PRNGKey(4), 2)
        a, b = _ri8(ks[0], (256, 512)), _ri8(ks[1], (512, 256))
        out = pallas_mm.matmul(a, b, block_k=256, **KW)
        ref = np.asarray(a, np.int64) @ np.asarray(b, np.int64)
        assert out.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(out, np.int64), ref)

    def test_backend_dispatch_uses_pallas(self):
        from quantized_training_tpu import ops

        ks = jax.random.split(jax.random.PRNGKey(5), 2)
        a, b = _ri8(ks[0], (128, 128)), _ri8(ks[1], (128, 128))
        sa, sb = jnp.ones((128, 1)), jnp.ones((1, 128))
        with ops.use_backend("xla"):
            ref = ops.scaled_mm(a, b, sa, sb, out_dtype=jnp.float32)
        # pallas backend on CPU runs compiled pallas lowering when possible;
        # here just check dispatch plumbing via explicit interpret call
        out = pallas_mm.scaled_mm(a, b, sa, sb, out_dtype=jnp.float32, block_k=128, **KW)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4)


class TestPallasInt4MM:
    def test_in_kernel_unpack_exact(self):
        """Pallas scaled_int4_mm (in-kernel unpack, even/odd split
        contraction) == the unpack-in-graph XLA path, exactly."""
        from quantized_training_tpu.ops import int4_mm as _  # noqa
        from quantized_training_tpu.ops.int4_mm import scaled_int4_mm as ref_fn
        from quantized_training_tpu.quant.core import quantize_int4_rowwise_absmax

        kx, kw = jax.random.split(jax.random.PRNGKey(7))
        x = jax.random.normal(kx, (64, 256), jnp.float32)
        w = jax.random.normal(kw, (128, 256), jnp.float32) * 0.5
        a_packed, rs = quantize_int4_rowwise_absmax(x)
        b_packed, cs = quantize_int4_rowwise_absmax(w)

        ref = ref_fn(a_packed, b_packed, rs, cs, out_dtype=jnp.float32)
        out = pallas_mm.scaled_int4_mm(
            a_packed, b_packed, rs, cs, out_dtype=jnp.float32,
            block_m=64, block_n=128, block_k=128, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_int4_backend_dispatch(self):
        from quantized_training_tpu import ops
        from quantized_training_tpu.ops import int4_mm as _  # noqa
        from quantized_training_tpu.ops.int4_mm import scaled_int4_mm as ref_fn
        from quantized_training_tpu.quant.core import quantize_int4_rowwise_absmax

        kx, kw = jax.random.split(jax.random.PRNGKey(8))
        a_packed, rs = quantize_int4_rowwise_absmax(
            jax.random.normal(kx, (32, 128), jnp.float32))
        b_packed, cs = quantize_int4_rowwise_absmax(
            jax.random.normal(kw, (128, 128), jnp.float32))
        ref = ref_fn(a_packed, b_packed, rs, cs, out_dtype=jnp.float32)
        with ops.use_backend("pallas"):
            out = ref_fn(a_packed, b_packed, rs, cs, out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


class TestScaledMmDims:
    """scaled_mm_dims: the stored-layout contraction forms of the backward
    pass (dims=(0,0) grad_weight, dims=(1,1) fwd) are bit-exact vs the
    scaled_mm_general XLA composite."""

    def test_dims_forms_exact(self):
        import numpy as np
        from quantized_training_tpu.ops.pallas_mm import scaled_mm_dims
        from quantized_training_tpu.ops.scaled_mm import scaled_mm_general

        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        cases = [((0, 0), (384, 256), (384, 128)),
                 ((1, 1), (256, 384), (128, 384)),
                 ((1, 0), (256, 384), (384, 128))]
        for dims, ash, bsh in cases:
            a = jax.random.randint(k1, ash, -128, 128, jnp.int8)
            b = jax.random.randint(k2, bsh, -128, 128, jnp.int8)
            M, N = a.shape[1 - dims[0]], b.shape[1 - dims[1]]
            sa = jax.random.uniform(k1, (M,), jnp.float32, 0.01, 0.1)
            sb = jax.random.uniform(k2, (N,), jnp.float32, 0.01, 0.1)
            ref = scaled_mm_general(a, b, sa, sb, dims=dims,
                                    out_dtype=jnp.float32)
            out = scaled_mm_dims(a, b, sa, sb, dims=dims,
                                 out_dtype=jnp.float32, block_m=128,
                                 block_n=128, block_k=128, interpret=True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-6)

    def test_non_multiple_shapes_padded(self):
        import numpy as np
        from quantized_training_tpu.ops.pallas_mm import scaled_mm_dims
        from quantized_training_tpu.ops.scaled_mm import scaled_mm_general

        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        a = jax.random.randint(k1, (320, 160), -128, 128, jnp.int8)  # [K,M]
        b = jax.random.randint(k2, (320, 224), -128, 128, jnp.int8)  # [K,N]
        sa = jax.random.uniform(k1, (160,), jnp.float32, 0.01, 0.1)
        sb = jax.random.uniform(k2, (224,), jnp.float32, 0.01, 0.1)
        ref = scaled_mm_general(a, b, sa, sb, dims=(0, 0),
                                out_dtype=jnp.float32)
        out = scaled_mm_dims(a, b, sa, sb, dims=(0, 0),
                             out_dtype=jnp.float32, block_m=128,
                             block_n=128, block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
