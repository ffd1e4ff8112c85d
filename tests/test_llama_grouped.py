"""Grouped (fused-rope) attention pipeline == the original pipeline.

On TPU the grouped path runs the pallas rope/grouping kernels + splash;
on CPU QT_FUSED_ROPE=force exercises the same model wiring with the jnp
rope oracles and the grouped einsum attention, against the default
ungrouped einsum path — outputs and parameter gradients must agree.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_training_tpu.models import llama

CFG = dataclasses.replace(
    llama.LLAMA2_470M,
    hidden_size=256,
    intermediate_size=512,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    vocab_size=512,
    max_position_embeddings=128,
)


@pytest.fixture
def toy():
    params = llama.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (2, 128), 0, CFG.vocab_size, jnp.int32
    )
    labels = jnp.roll(tokens, -1, -1)
    return params, tokens, labels


def _loss_and_grad(params, tokens, labels):
    return jax.value_and_grad(
        lambda p: llama.loss_fn(p, tokens, labels, CFG)
    )(params)


def test_grouped_pipeline_matches_default(toy, monkeypatch):
    params, tokens, labels = toy
    monkeypatch.setenv("QT_FUSED_ROPE", "0")
    l0, g0 = _loss_and_grad(params, tokens, labels)
    monkeypatch.setenv("QT_FUSED_ROPE", "force")
    assert llama._use_grouped_rope(CFG, 128)
    l1, g1 = _loss_and_grad(params, tokens, labels)
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    for (p0, a), (p1, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        assert p0 == p1
        np.testing.assert_allclose(a, b, atol=2e-4, err_msg=str(p0))


def test_grouped_pipeline_under_remat_and_scan(toy, monkeypatch):
    params, tokens, labels = toy
    cfg_r = dataclasses.replace(CFG, remat=True)
    monkeypatch.setenv("QT_FUSED_ROPE", "force")
    l, g = jax.value_and_grad(
        lambda p: llama.loss_fn(p, tokens, labels, cfg_r)
    )(params)
    monkeypatch.setenv("QT_FUSED_ROPE", "0")
    l0, g0 = jax.value_and_grad(
        lambda p: llama.loss_fn(p, tokens, labels, cfg_r)
    )(params)
    np.testing.assert_allclose(l, l0, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g0)):
        np.testing.assert_allclose(a, b, atol=2e-4)
