"""scaled_mm / int4_mm op tests vs the fp32 oracle (benchmark_mm.py:46-50
pattern: assert against scaled_mm_ref before anything else)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_training_tpu import ops
from quantized_training_tpu.quant import core


def _rand_int8(key, shape):
    return jax.random.randint(key, shape, -128, 128, dtype=jnp.int8)


class TestScaledMM:
    @pytest.mark.parametrize("m,n,k", [(64, 48, 32), (128, 128, 128)])
    def test_row_col_scale(self, m, n, k):
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
        a = _rand_int8(k1, (m, k))
        b = _rand_int8(k2, (k, n))
        sa = jax.random.uniform(k3, (m, 1)) * 0.1
        sb = jax.random.uniform(k4, (1, n)) * 0.1
        out = ops.scaled_mm(a, b, sa, sb, out_dtype=jnp.float32)
        ref = ops.scaled_mm_ref(a, b, sa, sb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)

    def test_scalar_col_scale(self):
        # the BitNet COL_SCALE_SCALAR path (triton_mm.py:211-215)
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
        a = _rand_int8(k1, (32, 64))
        b = _rand_int8(k2, (64, 16))
        sa = jax.random.uniform(k3, (32, 1))
        sb = jnp.float32(0.037)
        out = ops.scaled_mm(a, b, sa, sb, out_dtype=jnp.float32)
        ref = ops.scaled_mm_ref(a, b, sa, sb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)

    def test_tile_scale(self):
        # DeepSeek-style tile scales (triton_mm.py:223-342)
        M, K, N = 64, 128, 96
        QM, QK, QN = 32, 32, 32
        keys = jax.random.split(jax.random.PRNGKey(2), 4)
        a = _rand_int8(keys[0], (M, K))
        b = _rand_int8(keys[1], (K, N))
        sa = jax.random.uniform(keys[2], (M // QM, K // QK)) * 0.1
        sb = jax.random.uniform(keys[3], (K // QK, N // QN)) * 0.1
        out = ops.scaled_mm(a, b, sa, sb, out_dtype=jnp.float32)
        ref = ops.scaled_mm_ref(a, b, sa, sb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)

    def test_int8_mm(self):
        a = _rand_int8(jax.random.PRNGKey(3), (16, 32))
        b = _rand_int8(jax.random.PRNGKey(4), (32, 8))
        out = ops.int8_mm(a, b)
        ref = np.asarray(a, np.int64) @ np.asarray(b, np.int64)
        assert out.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(out, np.int64), ref)

    def test_bf16_out_dtype(self):
        a = _rand_int8(jax.random.PRNGKey(5), (8, 16))
        b = _rand_int8(jax.random.PRNGKey(6), (16, 8))
        out = ops.scaled_mm(a, b, jnp.ones((8, 1)), jnp.ones((1, 8)))
        assert out.dtype == jnp.bfloat16


class TestInt4MM:
    def test_int4_mm_vs_unpacked(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (32, 64)) * 2
        y = jax.random.normal(jax.random.PRNGKey(1), (16, 64)) * 2
        xq, _ = core.quantize_int4_rowwise_absmax(x)
        yq, _ = core.quantize_int4_rowwise_absmax(y)
        out = ops.int4_mm(xq, yq)
        ref = np.asarray(ops.unpack_int4(xq), np.int64) @ np.asarray(
            ops.unpack_int4(yq), np.int64
        ).T
        np.testing.assert_array_equal(np.asarray(out, np.int64), ref)

    def test_scaled_int4_mm(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (32, 64)) * 2
        y = jax.random.normal(jax.random.PRNGKey(1), (16, 64)) * 2
        xq, xs = core.quantize_int4_rowwise_absmax(x)
        yq, ys = core.quantize_int4_rowwise_absmax(y)
        out = ops.scaled_int4_mm(xq, yq, xs, ys, out_dtype=jnp.float32)
        ref = ops.scaled_mm_ref(
            ops.unpack_int4(xq),
            ops.unpack_int4(yq).T,
            xs.reshape(-1, 1),
            ys.reshape(1, -1),
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)
        # and it approximates the fp matmul
        approx = np.asarray(out)
        exact = np.asarray(x @ y.T)
        rel = np.abs(approx - exact).mean() / np.abs(exact).mean()
        assert rel < 0.2, rel


class TestScaledMmGeneralBackend:
    def test_pallas_opt_in_matches_xla(self):
        from quantized_training_tpu import ops
        from quantized_training_tpu.ops.scaled_mm import scaled_mm_general

        k = jax.random.PRNGKey(0)
        a = jax.random.randint(k, (64, 128), -127, 128, jnp.int8)
        b = jax.random.randint(jax.random.fold_in(k, 1), (32, 128), -127, 128, jnp.int8)
        sa = jnp.abs(jax.random.normal(jax.random.fold_in(k, 2), (64, 1))) * 0.01
        sb = jnp.abs(jax.random.normal(jax.random.fold_in(k, 3), (1, 32))) * 0.01
        ref = scaled_mm_general(a, b, sa, sb, dims=(1, 1), out_dtype=jnp.float32)
        # the pallas backend on CPU would need interpret mode; exercise the
        # dispatch routing via a monkeypatched kernel that records the call
        import quantized_training_tpu.ops.pallas_mm as pallas_mm

        calls = {}
        orig = pallas_mm.scaled_mm

        def spy(a2, b2, sa2, sb2, **kw):
            calls["shapes"] = (a2.shape, b2.shape)
            return orig(a2, b2, sa2, sb2, interpret=True, **kw)

        try:
            pallas_mm.scaled_mm = spy
            with ops.use_backend("pallas"):
                out = scaled_mm_general(a, b, sa, sb, dims=(1, 1), out_dtype=jnp.float32)
        finally:
            pallas_mm.scaled_mm = orig
        assert calls["shapes"] == ((64, 128), (128, 32))  # b transposed to standard
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_tuned_lookup_respects_vmem_budget():
    """Every block config the dispatch layer can return — cached, nearest-M,
    or default — must fit the autotune VMEM working-set budget (a stale
    cache entry at (2048,256,2048) measured 16.37M scoped VMEM in-program
    and failed the whole train-step compile)."""
    import json

    import jax.numpy as jnp

    from quantized_training_tpu.ops import autotune as at

    for path in at.TUNED_DIR.glob("*.json"):
        cache = json.loads(path.read_text())
        for key in cache:
            kernel, dt, shape = key.split(":")
            M, K, N = (int(t) for t in shape.split("x"))
            elem = jnp.dtype(dt).itemsize
            bm, bn, bk = at._cap_blocks(tuple(cache[key]["blocks"]), elem)
            assert at._working_set(bm, bn, bk, elem) <= at._VMEM_BUDGET, key
    for kernel, blocks in at._DEFAULTS.items():
        bm, bn, bk = blocks
        if bk:
            assert at._working_set(bm, bn, bk, 1) <= at._VMEM_BUDGET, kernel
