"""Continuous-batching serving throughput: windowed vs full-cache decode.

The Server dispatches each decode step to a kernel compiled for the
smallest power-of-two attention window covering the deepest active slot
(models/serving.py). This benchmark drains an identical request mix
through (a) the windowed server and (b) a server pinned to the single
full-``max_len`` window, and reports generated tokens/sec for both.

The reference has no serving layer (BASELINE.json north-star item); the
comparison here is our own full-window decode, i.e. the cost of attending
over ``max_len`` regardless of fill.

Usage: python benchmark_serving.py [--model llama2-1b] [--n_slots 8]
       [--max_len 2048] [--prompt_len 64] [--new_tokens 448]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import jax
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def drain(srv, prompts, new_tokens):
    for p in prompts:
        srv.add_request(p, max_new_tokens=new_tokens)
    n = 0
    while srv.pending():
        n += len(srv.step())
    return n


def measure(params, cfg, args, window_buckets):
    from quantized_training_tpu.models.serving import Server

    srv = Server(params, cfg, n_slots=args.n_slots, max_len=args.max_len,
                 window_buckets=window_buckets)
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(1, cfg.vocab_size, size=args.prompt_len).tolist()
        for _ in range(args.n_slots)
    ]
    # warmup = identical drain on the SAME server (jitted fns live on the
    # instance), so the prefill bucket AND every window the timed run
    # reaches are compiled before timing; the drain leaves all slots free
    drain(srv, prompts, args.new_tokens)
    t0 = time.perf_counter()
    n = drain(srv, prompts, args.new_tokens)
    dt = time.perf_counter() - t0
    return n / dt, sorted(getattr(srv, "_decode_fns", {}))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="llama2-1b")
    p.add_argument("--n_slots", type=int, default=8)
    p.add_argument("--max_len", type=int, default=2048)
    p.add_argument("--prompt_len", type=int, default=64)
    p.add_argument("--new_tokens", type=int, default=448)
    p.add_argument("--quantize", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from quantized_training_tpu import quant
    from quantized_training_tpu.models import llama

    tiny = llama.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=args.max_len,
    )  # CPU smoke-test config
    cfg = {"llama2-1b": llama.LLAMA2_1B, "llama2-470m": llama.LLAMA2_470M,
           "tiny": tiny}[args.model]
    cfg = dataclasses.replace(cfg, max_position_embeddings=args.max_len)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    params = quant.quantize_params(params, args.quantize)

    tok_w, wins = measure(params, cfg, args, None)
    log(f"windowed decode: {tok_w:.1f} tok/s (windows compiled: {wins})")
    tok_f, _ = measure(params, cfg, args, (args.max_len,))
    log(f"full-window decode: {tok_f:.1f} tok/s")
    log(f"windowed / full = {tok_w / tok_f:.3f}x")


if __name__ == "__main__":
    main()
