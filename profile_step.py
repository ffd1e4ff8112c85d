"""Capture + parse a device trace of one train step (op-level breakdown).

The TPU equivalent of the reference's ``--profile`` torch.profiler flow
(llm_pretrain.py:186-188, :262-264), plus an inline analysis pass: traces
two steps with ``jax.profiler.trace``, then aggregates per-op durations
from the xplane and prints the top offenders — no TensorBoard needed.

Usage:
  python profile_step.py [--quantize mixed_precision] [--model llama2-1b]
                         [--bs 8] [--seq 2048] [--top 30] [--out DIR]
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import sys
from collections import defaultdict

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quantize", default=None)
    parser.add_argument("--model", default="llama2-1b")
    parser.add_argument("--bs", type=int, default=8)
    parser.add_argument("--seq", type=int, default=2048)
    parser.add_argument("--top", type=int, default=30)
    parser.add_argument("--out", default=None, help="trace dir (kept for TensorBoard)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from quantized_training_tpu import optim, quant
    from quantized_training_tpu.models import llama
    from quantized_training_tpu.train import init_train_state, make_train_step

    cfg = {"llama2-1b": llama.LLAMA2_1B, "llama2-470m": llama.LLAMA2_470M}[args.model]
    cfg = dataclasses.replace(cfg, max_position_embeddings=args.seq, remat=True)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_params(params, args.quantize)
    optimizer = optim.adamw_bf16_sr(bf16_stochastic_rounding=False)
    state = init_train_state(qparams, optimizer)
    step_fn = make_train_step(cfg, optimizer)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (args.bs, args.seq), 0, cfg.vocab_size, jnp.int32
    )
    labels = jnp.roll(tokens, -1, axis=-1)
    key = jax.random.PRNGKey(2)

    def sync(m):
        np.asarray(jax.device_get(m["loss"]))

    state, m = step_fn(state, tokens, labels, 1e-4, key)
    sync(m)
    print("compiled; tracing 2 steps...", file=sys.stderr, flush=True)

    outdir = args.out or f"/tmp/trace_{args.quantize or 'bf16'}"
    with jax.profiler.trace(outdir):
        for i in range(2):
            state, m = step_fn(state, tokens, labels, 1e-4, jax.random.fold_in(key, i))
        sync(m)

    traces = sorted(glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True))
    if not traces:
        raise SystemExit(
            f"no .xplane.pb produced under {outdir} — device-side profiling "
            "may be unsupported in this environment"
        )
    path = traces[-1]
    pd = jax.profiler.ProfileData.from_serialized_xspace(open(path, "rb").read())
    agg: dict[str, float] = defaultdict(float)
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                agg[ev.name] += ev.duration_ns / 1e6
    print(f"trace: {path}")
    print(f"{'ms/step':>9}  op")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{ms / 2:9.1f}  {name[:140]}")


if __name__ == "__main__":
    main()
