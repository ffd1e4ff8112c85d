"""INT8 KV-cache inference tests: cached decode vs full forward, generation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_training_tpu import quant
from quantized_training_tpu.models import llama, llama_infer

TINY = llama.LlamaConfig(
    vocab_size=256,
    hidden_size=128,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=64,
)


def _params(cfg=TINY, dtype=jnp.float32):
    return llama.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)


class TestKVCache:
    def test_prefill_matches_full_forward(self):
        params = _params()
        tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 256, dtype=jnp.int32)
        ref = llama.forward(params, tokens, TINY).astype(jnp.float32)
        cache = llama_infer.KVCache.zeros(TINY, 2, 32, dtype=jnp.float32)
        out, _ = llama_infer.forward_with_cache(params, tokens, cache, 0, TINY)
        # int8 KV quantization introduces small error
        rel = float(jnp.abs(out.astype(jnp.float32) - ref).mean() / jnp.abs(ref).mean())
        assert rel < 0.05, rel

    def test_decode_matches_prefill(self):
        """Feeding tokens one at a time must equal feeding them at once."""
        params = _params()
        tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, 256, dtype=jnp.int32)

        cache_a = llama_infer.KVCache.zeros(TINY, 1, 16, dtype=jnp.float32)
        all_logits, _ = llama_infer.forward_with_cache(params, tokens, cache_a, 0, TINY)

        cache_b = llama_infer.KVCache.zeros(TINY, 1, 16, dtype=jnp.float32)
        step_logits = []
        for t in range(8):
            lo, cache_b = llama_infer.forward_with_cache(
                params, tokens[:, t : t + 1], cache_b, t, TINY
            )
            step_logits.append(lo[:, 0])
        step_logits = jnp.stack(step_logits, axis=1)
        np.testing.assert_allclose(
            np.asarray(step_logits, np.float32),
            np.asarray(all_logits, np.float32),
            rtol=1e-2,
            atol=1e-2,
        )

    def test_cache_is_int8(self):
        cache = llama_infer.KVCache.zeros(TINY, 2, 32)
        assert cache.k.dtype == jnp.int8 and cache.v.dtype == jnp.int8


class TestGenerate:
    def test_greedy_deterministic_and_jittable(self):
        params = _params()
        prompt = jax.random.randint(jax.random.PRNGKey(3), (2, 5), 0, 256, dtype=jnp.int32)
        gen = jax.jit(
            lambda p, pr: llama_infer.generate(p, pr, TINY, max_new_tokens=6)
        )
        out1 = gen(params, prompt)
        out2 = gen(params, prompt)
        assert out1.shape == (2, 11)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        np.testing.assert_array_equal(np.asarray(out1[:, :5]), np.asarray(prompt))

    def test_sampled_generation_varies_with_key(self):
        params = _params()
        prompt = jnp.zeros((1, 3), jnp.int32)
        o1 = llama_infer.generate(
            params, prompt, TINY, 8, temperature=1.0, key=jax.random.PRNGKey(0)
        )
        o2 = llama_infer.generate(
            params, prompt, TINY, 8, temperature=1.0, key=jax.random.PRNGKey(1)
        )
        assert not np.array_equal(np.asarray(o1), np.asarray(o2))

    @pytest.mark.parametrize("scheme", ["int8_quantized_training", "int4_weight_only"])
    def test_generate_with_quantized_weights(self, scheme):
        params = _params()
        qparams = quant.quantize_params(params, scheme)
        prompt = jnp.zeros((1, 4), jnp.int32)
        out = llama_infer.generate(qparams, prompt, TINY, 4)
        assert out.shape == (1, 8)

    def test_generate_with_bitnet_packed(self):
        """Inference with the 2-bit packed weight container (bitnet.py:206+)."""
        cfg = dataclasses.replace(TINY, bitnet=True)
        params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        qparams = quant.quantize_params(params, "bitnet")

        # pack every BitNetWeight for inference
        def pack(leaf):
            if isinstance(leaf, quant.BitNetWeight):
                return quant.BitNetPackedWeight.from_weight(leaf.data)
            return leaf

        packed = jax.tree.map(pack, qparams, is_leaf=quant.is_quant_weight)
        out = llama_infer.generate(packed, jnp.zeros((1, 4), jnp.int32), cfg, 4)
        assert out.shape == (1, 8)
