"""Fused rope+grouping kernels: oracle equivalence + VJP correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_training_tpu.ops.pallas_rope import (
    group_heads,
    pair_tables,
    rope_group,
    rope_group_kernel,
    rope_group_ref,
    rope_ungroup_kernel,
    rope_ungroup_ref,
    ungroup_amax,
    ungroup_heads,
    ungroup_quant,
)

B, S, H, KV, hd = 2, 256, 8, 2, 64
G = H // KV


def _tables(scale=1.0, dtype=jnp.float32):
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, hd, 2, jnp.float32) / hd))
    t = jnp.arange(S, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return (jnp.cos(emb) * scale).astype(dtype), (jnp.sin(emb) * scale).astype(dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("kv", [KV, H])  # G=4 (paired g) and G=1 (paired kv)
def test_group_kernel_matches_ref(dtype, kv):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, hd), dtype)
    cos, sin = _tables(scale=0.5)
    c2, s2 = pair_tables(cos, sin)
    out = rope_group_kernel(x, c2, s2, kv=kv, interpret=True)
    ref = rope_group_ref(x, cos, sin, kv)
    assert out.shape == (B, kv, H // kv, S, hd)
    np.testing.assert_allclose(
        out.astype(jnp.float32), ref.astype(jnp.float32),
        atol=2e-2 if dtype == jnp.bfloat16 else 1e-6,
    )


@pytest.mark.parametrize("inverse", [True, False])
@pytest.mark.parametrize("kv", [KV, H])
def test_ungroup_kernel_matches_ref(inverse, kv):
    y = jax.random.normal(
        jax.random.PRNGKey(1), (B, kv, H // kv, S, hd), jnp.float32
    )
    cos, sin = _tables()
    c2, s2 = pair_tables(cos, sin)
    out = rope_ungroup_kernel(y, c2, s2, inverse=inverse, interpret=True)
    ref = rope_ungroup_ref(y, cos, sin, kv, inverse=inverse)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_group_ungroup_roundtrip():
    """ungroup(group(x)) with matched rotations is the identity."""
    x = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, hd), jnp.float32)
    cos, sin = _tables()
    c2, s2 = pair_tables(cos, sin)
    y = rope_group_kernel(x, c2, s2, kv=KV, interpret=True)
    back = rope_ungroup_kernel(y, c2, s2, inverse=True, interpret=True)
    np.testing.assert_allclose(back, x.reshape(B, S, H, hd), atol=1e-5)


def test_rope_group_vjp_matches_autodiff():
    """custom_vjp grad == autodiff through the jnp composite."""
    x = jax.random.normal(jax.random.PRNGKey(3), (B, S, H, hd), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (B, KV, G, S, hd), jnp.float32)
    cos, sin = _tables(scale=hd**-0.5)

    g_fused = jax.grad(lambda x: jnp.sum(rope_group(x, cos, sin, KV) * w))(x)
    g_ref = jax.grad(lambda x: jnp.sum(rope_group_ref(x, cos, sin, KV) * w))(x)
    np.testing.assert_allclose(g_fused, g_ref, atol=1e-5)


def test_group_ungroup_heads_vjp():
    x = jax.random.normal(jax.random.PRNGKey(5), (B, S, H, hd), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(6), (B, KV, G, S, hd), jnp.float32)
    g_fused = jax.grad(lambda x: jnp.sum(group_heads(x, KV) * w))(x)
    g_ref = jax.grad(
        lambda x: jnp.sum(x.transpose(0, 2, 1, 3).reshape(B, KV, G, S, hd) * w)
    )(x)
    np.testing.assert_allclose(g_fused, g_ref, atol=1e-6)

    y = jax.random.normal(jax.random.PRNGKey(7), (B, KV, G, S, hd), jnp.float32)
    wu = jax.random.normal(jax.random.PRNGKey(8), (B, S, H, hd), jnp.float32)
    gu_fused = jax.grad(lambda y: jnp.sum(ungroup_heads(y, KV) * wu))(y)
    gu_ref = jax.grad(
        lambda y: jnp.sum(
            y.reshape(B, H, S, hd).transpose(0, 2, 1, 3) * wu
        )
    )(y)
    np.testing.assert_allclose(gu_fused, gu_ref, atol=1e-6)


@pytest.mark.parametrize("kv", [KV, H])
def test_ungroup_quant_matches_oracle(kv):
    from quantized_training_tpu.quant.core import quantize_int8

    y = jax.random.normal(
        jax.random.PRNGKey(9), (B, kv, H // kv, S, hd), jnp.bfloat16
    )
    x2d = (
        y.reshape(B, kv * (H // kv), S, hd)
        .transpose(0, 2, 1, 3)
        .reshape(B * S, H * hd)
    )
    row, col = ungroup_amax(y, interpret=True)
    np.testing.assert_allclose(
        row.reshape(-1),
        jnp.max(jnp.abs(x2d.astype(jnp.float32)), axis=1),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        col.reshape(-1),
        jnp.max(jnp.abs(x2d.astype(jnp.float32)), axis=0),
        rtol=1e-6,
    )
    q_row = ungroup_quant(y, row * (1 / 127.0), axis=1, interpret=True)
    ref_q, _ = quantize_int8(x2d, axis=1)
    np.testing.assert_array_equal(
        np.asarray(q_row.reshape(B * S, H * hd)), np.asarray(ref_q)
    )
    q_col = ungroup_quant(y, col * (1 / 127.0), axis=0, interpret=True)
    ref_qc, _ = quantize_int8(x2d, axis=0)
    np.testing.assert_array_equal(
        np.asarray(q_col.reshape(B * S, H * hd)), np.asarray(ref_qc)
    )


def test_supported_heads_gates():
    """ADVICE r4: odd S would silently drop the sequence tail (grid S//bs)
    and hd values that are multiples of 8 but not 64 fail Mosaic's
    128-lane last-dim rule — both must be routed to the jnp path."""
    from quantized_training_tpu.ops.pallas_rope import (
        _pick_bs,
        _supported_heads,
    )

    assert _supported_heads(32, 8, 64, 2048)
    assert not _supported_heads(32, 8, 64, 100)  # S % 8 != 0
    assert not _supported_heads(32, 8, 48, 2048)  # hd % 64 != 0
    assert not _supported_heads(32, 8, 8, 2048)  # hd=8 passed the old gate
    with pytest.raises(ValueError):
        _pick_bs(100)

    # gated wrappers fall back to the oracle (and agree with it) on odd S
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 100, 8, 64), jnp.float32)
    cos = jnp.cos(jnp.arange(100 * 64, dtype=jnp.float32).reshape(100, 64))
    sin = jnp.sin(jnp.arange(100 * 64, dtype=jnp.float32).reshape(100, 64))
    got = rope_group(x, cos, sin, 4)
    ref = rope_group_ref(x, cos, sin, 4)
    np.testing.assert_allclose(got, ref, atol=1e-6)
