"""Multi-device tests on the 8-virtual-CPU-device mesh: DP/FSDP sharded
training, the quantized BitNet FSDP all-gather, and collective benches."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from quantized_training_tpu import optim, quant
from quantized_training_tpu.models import llama
from quantized_training_tpu.parallel import (
    benchmark_collectives,
    bitnet_fsdp_linear,
    bitnet_fsdp_params,
    make_mesh,
    param_spec,
    shard_batch,
    shard_state,
)
from quantized_training_tpu.train import init_train_state, make_train_step

TINY = llama.LlamaConfig(
    vocab_size=256,
    hidden_size=128,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=4,
    max_position_embeddings=64,
)


def _batch(key, bs=8, seq=32, vocab=256):
    toks = jax.random.randint(key, (bs, seq + 1), 0, vocab, dtype=jnp.int32)
    return toks[:, :-1], toks[:, 1:]


def _run_steps(state, step, mesh, n=3, bs=8):
    for i in range(n):
        tokens, labels = _batch(jax.random.PRNGKey(100 + i), bs=bs)
        if mesh is not None:
            tokens, labels = shard_batch((tokens, labels), mesh)
        state, metrics = step(state, tokens, labels, 1e-3, jax.random.PRNGKey(i))
    return state, float(metrics["loss"])


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh({"data": 2, "fsdp": 4})
        assert dict(mesh.shape) == {"data": 2, "fsdp": 4, "model": 1}

    def test_too_many_devices(self):
        with pytest.raises(ValueError):
            make_mesh({"data": 64})

    def test_param_spec_rules(self):
        mesh = make_mesh({"fsdp": 4})
        assert param_spec(jnp.zeros((2, 128, 64)), mesh) == P(None, "fsdp")
        assert param_spec(jnp.zeros((2, 65, 64)), mesh) == P(None, None, "fsdp")
        assert param_spec(jnp.zeros((256, 64)), mesh) == P("fsdp")
        assert param_spec(jnp.zeros(()), mesh) == P()


class TestShardedTraining:
    @pytest.mark.parametrize("mesh_axes", [{"data": 8}, {"fsdp": 8}, {"data": 2, "fsdp": 4}])
    @pytest.mark.slow
    def test_sharded_matches_single_device(self, mesh_axes):
        params = llama.init_params(jax.random.PRNGKey(0), TINY)
        qparams = quant.quantize_params(params, "mixed_precision")
        opt = optim.adamw_bf16_sr(bf16_stochastic_rounding=False)
        step = make_train_step(TINY, opt, donate=False)

        s_ref = init_train_state(qparams, opt)
        s_ref, loss_ref = _run_steps(s_ref, step, None)

        mesh = make_mesh(mesh_axes)
        s_sh = shard_state(init_train_state(qparams, opt), mesh)
        s_sh, loss_sh = _run_steps(s_sh, step, mesh)

        assert abs(loss_ref - loss_sh) < 0.05, (loss_ref, loss_sh)
        # params stay sharded after the step
        w = s_sh.params["layers"]["q"]["w"].data
        assert not w.sharding.is_fully_replicated or mesh_axes == {"data": 8}

    def test_int8_qt_sharded(self):
        params = llama.init_params(jax.random.PRNGKey(0), TINY)
        qparams = quant.quantize_params(params, "int8_quantized_training")
        opt = optim.adamw_bf16_sr(bf16_stochastic_rounding=False)
        step = make_train_step(TINY, opt, donate=False)
        mesh = make_mesh({"fsdp": 8})
        s = shard_state(init_train_state(qparams, opt), mesh)
        s, loss = _run_steps(s, step, mesh)
        assert np.isfinite(loss)


class TestBitNetFSDP:
    def test_quantized_all_gather_matches_unsharded(self):
        mesh = make_mesh({"data": 2, "fsdp": 4})
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, (16, 64), jnp.float32)
        w = jax.random.normal(k2, (32, 64), jnp.float32) * 0.05

        out_ref = quant.qlinear(x, quant.BitNetWeight(w))
        out_sh = bitnet_fsdp_linear(x, w, mesh)
        np.testing.assert_allclose(
            np.asarray(out_sh), np.asarray(out_ref), rtol=1e-3, atol=1e-3
        )

    @pytest.mark.slow
    def test_quantized_all_gather_grads_match(self):
        mesh = make_mesh({"data": 2, "fsdp": 4})
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        x = jax.random.normal(k1, (16, 64), jnp.float32)
        w = jax.random.normal(k2, (32, 64), jnp.float32) * 0.05

        def loss_sh(x, w):
            return (bitnet_fsdp_linear(x, w, mesh).astype(jnp.float32) ** 2).sum()

        def loss_ref(x, w):
            return (
                quant.qlinear(x, quant.BitNetWeight(w)).astype(jnp.float32) ** 2
            ).sum()

        gx_s, gw_s = jax.grad(loss_sh, argnums=(0, 1))(x, w)
        gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(gw_s), np.asarray(gw_r), rtol=1e-4, atol=1e-5
        )

    def test_bitnet_e2e_training_with_quantized_gather(self):
        cfg = dataclasses.replace(TINY, bitnet=True)
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        qparams = quant.quantize_params(params, "bitnet")
        opt = optim.adamw_bf16_sr(bf16_stochastic_rounding=False)
        step = make_train_step(cfg, opt, donate=False)
        mesh = make_mesh({"data": 2, "fsdp": 4})
        qparams = bitnet_fsdp_params(qparams, mesh)
        s = shard_state(init_train_state(qparams, opt), mesh)
        s, loss = _run_steps(s, step, mesh)
        assert np.isfinite(loss)


class TestCollectives:
    def test_benchmark_runs(self):
        mesh = make_mesh({"data": 8})
        res = benchmark_collectives(mesh, axis="data", size_mb=4, n_iters=3)
        assert set(res) == {"psum_GiBps", "all_gather_GiBps", "psum_scatter_GiBps"}
        assert all(v > 0 for v in res.values()), res


class TestTensorParallelInference:
    """TP-sharded generation over the 'model' axis matches single-device
    output exactly (greedy decoding; same math, XLA-placed psums)."""

    def test_tp_generate_matches_single_device(self):
        from quantized_training_tpu.models import llama_infer
        from quantized_training_tpu.parallel import (
            make_mesh, shard_params_tp, tp_param_spec,
        )
        from jax.sharding import PartitionSpec as P

        cfg = llama.LlamaConfig(
            vocab_size=256, hidden_size=128, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
            max_position_embeddings=48,
        )
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 256, jnp.int32)

        def prefill_logits(p, t):
            cache = llama_infer.KVCache.zeros(cfg, t.shape[0], 32)
            logits, _ = llama_infer.forward_with_cache(p, t, cache, 0, cfg)
            return logits.astype(jnp.float32)

        ref = jax.jit(prefill_logits)(params, prompt)

        mesh = make_mesh({"model": 4})
        p_tp = shard_params_tp(params, mesh)
        out = jax.jit(prefill_logits)(p_tp, prompt)
        # psum changes the bf16 summation order -> tolerance, not equality
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0.05, atol=0.05
        )
        # and generation runs end-to-end under TP with a sharded KV cache
        toks = jax.jit(
            lambda p, t: llama_infer.generate(p, t, cfg, 8, mesh=mesh)
        )(p_tp, prompt)
        assert toks.shape == (2, 24)

    def test_tp_spec_rules(self):
        from quantized_training_tpu.parallel import make_mesh, tp_param_spec
        from jax.sharding import PartitionSpec as P

        mesh = make_mesh({"model": 4})
        cfg = llama.LlamaConfig(
            vocab_size=256, hidden_size=128, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        )
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        flat, _ = jax.tree_util.tree_flatten_with_path(params)
        specs = {jax.tree_util.keystr(path): tp_param_spec(path, leaf, mesh)
                 for path, leaf in flat}
        assert specs["['layers']['q']['w']"] == P(None, "model", None)
        assert specs["['layers']['o']['w']"] == P(None, None, "model")
        assert specs["['layers']['down']['w']"] == P(None, None, "model")
        assert specs["['lm_head']['w']"] == P("model")
        assert specs["['final_norm']['g']"] == P()


class TestShardedCheckpoint:
    """Multi-host-safe save/restore: the per-shard representation saved by
    a multi-host FSDP job (shard_arrays=True forces it on one host) is
    reassembled shard-by-shard against the restoring job's shardings —
    no host gather of any array (utils/checkpoint.py)."""

    @pytest.mark.slow
    def test_sharded_roundtrip_bitexact(self, tmp_path):
        from quantized_training_tpu.parallel import state_shardings
        from quantized_training_tpu.utils import (
            load_checkpoint,
            restore_sharded,
            save_checkpoint,
        )

        params = llama.init_params(jax.random.PRNGKey(0), TINY)
        qparams = quant.quantize_params(params, "mixed_precision")
        opt = optim.adamw_bf16_sr(bf16_stochastic_rounding=False)
        step = make_train_step(TINY, opt, donate=False)
        mesh = make_mesh({"fsdp": 8})
        state = shard_state(init_train_state(qparams, opt), mesh)
        state, _ = _run_steps(state, step, mesh)  # non-trivial opt state

        path = tmp_path / "ckpt_0.pkl"
        save_checkpoint(
            path, {"state": state, "meta": {"step": 2}}, shard_arrays=True
        )
        ckpt = load_checkpoint(path)
        # every array leaf must be the sharded representation
        from quantized_training_tpu.utils.checkpoint import ShardedLeaf

        leaves = jax.tree.leaves(
            ckpt["state"], is_leaf=lambda x: isinstance(x, ShardedLeaf)
        )
        assert any(isinstance(l, ShardedLeaf) for l in leaves)

        restored = restore_sharded(ckpt["state"], state_shardings(state, mesh))
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # shardings survive the round trip
        w0 = state.params["layers"]["q"]["w"].data
        w1 = restored.params["layers"]["q"]["w"].data
        assert w1.sharding.is_equivalent_to(w0.sharding, w1.ndim)

        # and training continues from the restored state
        restored, loss = _run_steps(restored, step, mesh)
        assert np.isfinite(loss)

    def test_bitnet_fsdp_checkpoint_roundtrip(self, tmp_path):
        # Regression (ADVICE r2, high): BitNetWeight carried the live
        # Mesh into the pickle — jax Device objects are unpicklable, so
        # any bitnet + fsdp>1 run crashed at the first checkpoint save.
        # BitNetWeight now serializes with mesh=None and resume
        # re-threads the live mesh via bitnet_fsdp_params.
        from quantized_training_tpu.parallel import state_shardings
        from quantized_training_tpu.utils import (
            load_checkpoint,
            restore_sharded,
            save_checkpoint,
        )

        cfg = dataclasses.replace(TINY, bitnet=True)
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        qparams = quant.quantize_params(params, "bitnet")
        opt = optim.adamw_bf16_sr(bf16_stochastic_rounding=False)
        step = make_train_step(cfg, opt, donate=False)
        mesh = make_mesh({"data": 2, "fsdp": 4})
        qparams = bitnet_fsdp_params(qparams, mesh)
        state = shard_state(init_train_state(qparams, opt), mesh)
        state, _ = _run_steps(state, step, mesh)

        path = tmp_path / "ckpt_0.pkl"
        save_checkpoint(
            path, {"state": state, "meta": {"step": 3}}, shard_arrays=True
        )
        ckpt = load_checkpoint(path)
        # serialized wrappers have mesh=None; re-thread the live mesh so
        # the loaded treedef matches state_shardings' treedef
        loaded = bitnet_fsdp_params(ckpt["state"], mesh)
        restored = restore_sharded(loaded, state_shardings(state, mesh))
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        restored, loss = _run_steps(restored, step, mesh)
        assert np.isfinite(loss)

    def test_materialize_full_coverage(self, tmp_path):
        from quantized_training_tpu.utils import (
            load_checkpoint,
            materialize,
            save_checkpoint,
        )

        mesh = make_mesh({"fsdp": 8})
        x = jax.device_put(
            jnp.arange(64, dtype=jnp.float32).reshape(8, 8),
            jax.NamedSharding(mesh, P("fsdp")),
        )
        save_checkpoint(tmp_path / "c.pkl", {"x": x}, shard_arrays=True)
        out = materialize(load_checkpoint(tmp_path / "c.pkl"))["x"]
        np.testing.assert_array_equal(out, np.asarray(x))


class TestTPQuantizedServing:
    """Tensor-parallel generation with QUANTIZED weights (VERDICT item 5):
    the wrapper pytrees shard leaf-wise through shard_params_tp, and
    TP-generate matches the single-device quantized output."""

    CFG = llama.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=48,
    )

    def _prefill_logits(self, p, t):
        from quantized_training_tpu.models import llama_infer

        cache = llama_infer.KVCache.zeros(self.CFG, t.shape[0], 32)
        logits, _ = llama_infer.forward_with_cache(p, t, cache, 0, self.CFG)
        return logits.astype(jnp.float32)

    @pytest.mark.parametrize("scheme", ["int8_quantized_training", "bitnet"])
    def test_tp_generate_quantized_weights(self, scheme):
        from quantized_training_tpu.models import llama_infer
        from quantized_training_tpu.parallel import make_mesh, shard_params_tp

        params = llama.init_params(jax.random.PRNGKey(0), self.CFG)
        qparams = quant.quantize_params(params, scheme)
        if scheme == "bitnet":
            # serving packs ternary weights 2-bit (the deploy format)
            qparams = jax.tree.map(
                lambda x: quant.BitNetPackedWeight.from_weight(x.data)
                if isinstance(x, quant.BitNetWeight) else x,
                qparams, is_leaf=quant.is_quant_weight,
            )
        prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 256, jnp.int32)

        ref_logits = jax.jit(self._prefill_logits)(qparams, prompt)
        ref_toks = jax.jit(
            lambda p, t: llama_infer.generate(p, t, self.CFG, 8)
        )(qparams, prompt)

        mesh = make_mesh({"model": 4})
        qp_tp = shard_params_tp(qparams, mesh)
        # quantized leaves really are model-axis sharded
        flat, _ = jax.tree_util.tree_flatten_with_path(qp_tp)
        sharded = [
            l for p, l in flat
            if hasattr(l, "sharding") and "model" in str(l.sharding.spec)
        ]
        assert sharded, "no TP-sharded quantized leaves"

        out_logits = jax.jit(self._prefill_logits)(qp_tp, prompt)
        np.testing.assert_allclose(
            np.asarray(out_logits), np.asarray(ref_logits), rtol=0.05, atol=0.05
        )
        toks = jax.jit(
            lambda p, t: llama_infer.generate(p, t, self.CFG, 8, mesh=mesh)
        )(qp_tp, prompt)
        assert toks.shape == ref_toks.shape
        # greedy decode should agree except at rare argmax ties
        agree = (np.asarray(toks) == np.asarray(ref_toks)).mean()
        assert agree > 0.9, f"TP/single-device token agreement only {agree:.2%}"
