"""Worker process for the 2-process ``jax.distributed`` CPU validation
(tests/test_multiprocess.py). Run as:

  python multiproc_worker.py <port> <process_id> <phase> <workdir>

Phases:
  full    — 5 FSDP train steps from scratch, dump the final state digest
  train   — 3 steps, save a per-process sharded checkpoint
  resume  — restore from the per-process checkpoint, 2 more steps, dump
            the digest (must be BIT-EXACT equal to ``full``'s)

Each process feeds its OWN half of every batch (the loaders'
process_index sharding contract) and writes/reads only its own
checkpoint file (utils/checkpoint.py file-per-process contract).
"""

import hashlib
import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port, pid, phase, workdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, len(jax.devices())

    import jax.numpy as jnp

    from quantized_training_tpu import optim, quant
    from quantized_training_tpu.models import llama
    from quantized_training_tpu.parallel import (
        make_mesh, shard_batch, shard_state, state_shardings,
    )
    from quantized_training_tpu.train import init_train_state, make_train_step
    from quantized_training_tpu.utils import (
        load_checkpoint, restore_sharded, save_checkpoint,
    )
    from quantized_training_tpu.utils.checkpoint import checkpoint_name

    cfg = llama.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    mesh = make_mesh({"fsdp": 8})
    opt = optim.adamw_bf16_sr(bf16_stochastic_rounding=False)
    step_fn = make_train_step(cfg, opt, donate=False, mesh=mesh)

    def global_batch(i):
        toks = np.asarray(
            jax.random.randint(
                jax.random.PRNGKey(1000 + i), (8, 33), 0, 256, jnp.int32
            )
        )
        return toks[:, :-1], toks[:, 1:]

    def local_batch(i):
        # each process owns its contiguous half of the global batch rows
        tok, lab = global_batch(i)
        lo, hi = pid * 4, pid * 4 + 4
        return tok[lo:hi], lab[lo:hi]

    def run_steps(state, start, n):
        for i in range(start, start + n):
            tokens, labels = shard_batch(local_batch(i), mesh)
            state, metrics = step_fn(
                state, tokens, labels, 1e-3, jax.random.PRNGKey(i)
            )
        return state, metrics

    def fresh_state():
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        qparams = quant.quantize_params(params, "mixed_precision")
        return shard_state(init_train_state(qparams, opt), mesh)

    def digest(state):
        """SHA over this process's local shards (deterministic order)."""
        h = hashlib.sha256()
        for leaf in jax.tree.leaves(state):
            if not isinstance(leaf, jax.Array):
                continue
            for s in sorted(
                leaf.addressable_shards, key=lambda s: str(s.index)
            ):
                if s.replica_id == 0:
                    h.update(np.asarray(s.data).tobytes())
        return h.hexdigest()

    out = {"pid": pid}
    if phase == "full":
        state = fresh_state()
        state, metrics = run_steps(state, 0, 5)
        out["digest"] = digest(state)
        out["loss"] = float(metrics["loss"])
    elif phase == "train":
        state = fresh_state()
        state, _ = run_steps(state, 0, 3)
        save_checkpoint(
            checkpoint_name(workdir),
            {"state": state, "meta": {"step": 3}},
            shard_arrays=True,
        )
        out["saved"] = str(checkpoint_name(workdir))
    elif phase == "resume":
        # template state (same init path) provides treedef + shardings
        state = fresh_state()
        ckpt = load_checkpoint(checkpoint_name(workdir))
        assert ckpt["meta"]["step"] == 3
        state = restore_sharded(ckpt["state"], state_shardings(state, mesh))
        state, metrics = run_steps(state, 3, 2)
        out["digest"] = digest(state)
        out["loss"] = float(metrics["loss"])
    else:
        raise ValueError(phase)

    with open(os.path.join(workdir, f"out_{phase}_{pid}.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
