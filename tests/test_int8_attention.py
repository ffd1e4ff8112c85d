"""INT8 flash attention kernel vs the bf16/fp32 oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_training_tpu.ops.int8_attention import (
    attention_ref,
    int8_flash_fwd,
    quantize_qkv,
)


@pytest.mark.parametrize("G,S,hd,bq,bkv", [
    (4, 256, 64, 128, 128),
    (2, 256, 64, 256, 128),
    (1, 128, 128, 128, 128),
])
def test_fwd_matches_oracle(G, S, hd, bq, bkv):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (G, S, hd), jnp.bfloat16) * 0.5
    k = jax.random.normal(kk, (S, hd), jnp.bfloat16) * 0.5
    v = jax.random.normal(kv, (S, hd), jnp.bfloat16)

    qi, qs, ki, ks, vi, vs = quantize_qkv(q, k, v, block_kv=bkv)
    out, lse = int8_flash_fwd(
        qi, qs, ki, ks, vi, vs, block_q=bq, block_kv=bkv, interpret=True
    )
    ref = attention_ref(q, k, v)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    rel = err.mean() / np.abs(np.asarray(ref, np.float32)).mean()
    # int8 quantization noise: ~2% mean relative at unit-scale inputs
    assert rel < 0.05, rel

    # lse matches the explicit logsumexp of the (quantized-score) attention
    s = jnp.einsum(
        "gsd,td->gst",
        (qi.astype(jnp.float32) * qs),
        (ki.astype(jnp.float32) * ks[:, None]),
    )
    mask = jnp.tril(jnp.ones((S, S), bool))
    s = jnp.where(mask, s, -jnp.inf)
    lse_ref = jax.nn.logsumexp(s, axis=-1)
    np.testing.assert_allclose(
        np.asarray(lse[..., 0]), np.asarray(lse_ref), rtol=1e-4, atol=1e-4
    )


def test_causality():
    """Changing future tokens must not change earlier outputs."""
    G, S, hd = 2, 256, 64
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq, (G, S, hd), jnp.bfloat16)
    k = jax.random.normal(kk, (S, hd), jnp.bfloat16)
    v = jax.random.normal(kv, (S, hd), jnp.bfloat16)

    def run(k, v):
        qi, qs, ki, ks, vi, vs = quantize_qkv(q, k, v, block_kv=128)
        out, _ = int8_flash_fwd(
            qi, qs, ki, ks, vi, vs, block_q=128, block_kv=128, interpret=True
        )
        return np.asarray(out, np.float32)

    base = run(k, v)
    k2 = k.at[200:].set(jax.random.normal(jax.random.PRNGKey(9), (56, hd), jnp.bfloat16))
    v2 = v.at[200:].set(jax.random.normal(jax.random.PRNGKey(10), (56, hd), jnp.bfloat16))
    pert = run(k2, v2)
    np.testing.assert_array_equal(base[:, :200], pert[:, :200])
