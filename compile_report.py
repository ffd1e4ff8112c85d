"""Compile-time breakdown for the train step (VERDICT r3 item 7).

Round 2 measured compile+warm 167 s for the int8 mixed-precision train
step vs 10 s for bf16 — a 17x blowup. This tool splits the wall time
into the host-side phase (trace + StableHLO lowering) and the backend
phase (XLA + Mosaic, through this environment's remote compile helper),
and counts the custom calls in the lowered module by target, so the
blowup can be attributed (many DISTINCT Pallas kernel instantiations
each cost a separate Mosaic compile on the remote helper).

Usage:
  python compile_report.py [--model llama2-1b] [--bs 8] [--seq 2048]
      [--schemes bf16 int8_mp]

Prints one JSON line per scheme:
  {"scheme": ..., "trace_lower_s": ..., "backend_compile_s": ...,
   "n_custom_calls": ..., "custom_call_targets": {...},
   "hlo_bytes": ...}
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import json
import re
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


SCHEMES = {
    "bf16": None,
    "int8_fwd": dict(output=True, grad_input=False, grad_weight=False),
    "int8_mp": dict(output=True, grad_input=True, grad_weight=True),
    "int8_mp_sr": dict(
        output=True, grad_input=True, grad_weight=True, stochastic_rounding=True
    ),
}


def report(cfg, scheme_name, scheme_kwargs, bs, seq):
    import jax
    import jax.numpy as jnp

    from quantized_training_tpu import optim, quant
    from quantized_training_tpu.models import llama
    from quantized_training_tpu.train import init_train_state, make_train_step

    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    scheme = None if scheme_kwargs is None else "mixed_precision"
    qparams = quant.quantize_params(params, scheme, **(scheme_kwargs or {}))
    optimizer = optim.adamw_bf16_sr(bf16_stochastic_rounding=False)
    state = init_train_state(qparams, optimizer)
    step_fn = make_train_step(cfg, optimizer)

    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (bs, seq), 0, cfg.vocab_size, jnp.int32
    )
    labels = jnp.roll(tokens, -1, axis=-1)

    t0 = time.perf_counter()
    lowered = step_fn.lower(state, tokens, labels, 1e-4, jax.random.PRNGKey(2))
    t_lower = time.perf_counter() - t0

    hlo = lowered.as_text()
    targets = collections.Counter(
        m.group(1)
        for m in re.finditer(r'custom_call[^\n]*?call_target_name\s*=\s*"([^"]+)"', hlo)
    )
    # stablehlo spells it @targetname or call_target_name depending on dialect
    if not targets:
        targets = collections.Counter(
            m.group(1)
            for m in re.finditer(r'stablehlo\.custom_call @(\w+)', hlo)
        )

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0

    out = {
        "scheme": scheme_name,
        "trace_lower_s": round(t_lower, 1),
        "backend_compile_s": round(t_compile, 1),
        "n_custom_calls": int(sum(targets.values())),
        "custom_call_targets": dict(targets.most_common()),
        "hlo_bytes": len(hlo),
    }
    del compiled, state, qparams, params
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="llama2-1b")
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--seq", type=int, default=2048)
    p.add_argument("--schemes", nargs="+", default=["bf16", "int8_mp"],
                   choices=list(SCHEMES))
    p.add_argument("--cpu", action="store_true")
    p.add_argument(
        "--cache_dir",
        help="enable JAX's persistent compilation cache at this path: the "
        "second run of the same program skips the backend compile "
        "entirely, which amortizes the int8 config's one-time compile "
        "cost across jobs (run twice with the same --cache_dir to "
        "measure the cached-compile time)",
    )
    args = p.parse_args()

    import jax

    if args.cache_dir:
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from quantized_training_tpu.models import llama

    cfg = {"llama2-1b": llama.LLAMA2_1B, "llama2-470m": llama.LLAMA2_470M}[
        args.model
    ]
    cfg = dataclasses.replace(
        cfg, max_position_embeddings=args.seq, remat=True
    )

    for name in args.schemes:
        log(f"compiling {name} ...")
        print(json.dumps(report(cfg, name, SCHEMES[name], args.bs, args.seq)),
              flush=True)


if __name__ == "__main__":
    main()
