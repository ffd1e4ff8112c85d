"""FP8 op tests (quantize + matmul contracts)."""

import jax
import jax.numpy as jnp
import numpy as np

from quantized_training_tpu import ops


class TestFP8:
    def test_quantize_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (32, 64), jnp.float32) * 5
        q, s = ops.quantize_fp8(x)
        assert q.dtype == jnp.float8_e4m3fn and s.shape == (32, 1)
        deq = q.astype(jnp.float32) * s
        rel = float(jnp.abs(deq - x).mean() / jnp.abs(x).mean())
        assert rel < 0.05, rel

    def test_e5m2_variant(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 16)) * 100
        q, s = ops.quantize_fp8(x, dtype=jnp.float8_e5m2)
        assert q.dtype == jnp.float8_e5m2

    def test_fp8_mm_matches_dequant_mm(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        a = (jax.random.normal(k1, (32, 64)) * 2).astype(jnp.float8_e4m3fn)
        b = (jax.random.normal(k2, (64, 16)) * 2).astype(jnp.float8_e4m3fn)
        out = ops.fp8_mm(a, b, out_dtype=jnp.float32)
        ref = a.astype(jnp.float32) @ b.astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=1e-2)

    def test_scaled_fp8_mm(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        x = jax.random.normal(k1, (32, 64), jnp.float32) * 3
        w = jax.random.normal(k2, (16, 64), jnp.float32) * 3
        xq, xs = ops.quantize_fp8(x, axis=1)
        wq, ws = ops.quantize_fp8(w, axis=1)
        out = ops.scaled_fp8_mm(xq, wq.T, xs, ws.T, out_dtype=jnp.float32)
        ref = x @ w.T
        rel = float(jnp.abs(out - ref).mean() / jnp.abs(ref).mean())
        assert rel < 0.05, rel
