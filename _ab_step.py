"""Quick on-chip A/B of train-step variants via env toggles.

Usage: python _ab_step.py [--scheme mixed_precision|bf16] [--steps 6]
Prints the chained per-step ms for the CURRENT env configuration.
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scheme", default="mixed_precision")
    p.add_argument("--model", default="llama2-1b")
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--seq", type=int, default=2048)
    p.add_argument("--steps", type=int, default=6)
    args = p.parse_args()
    scheme = None if args.scheme == "bf16" else args.scheme

    from bench import build_step

    t0 = time.perf_counter()
    state, step_fn, tokens, labels = build_step(
        args.model, args.bs, args.seq, scheme
    )
    key = jax.random.PRNGKey(2)
    for i in range(2):
        state, m = step_fn(state, tokens, labels, 1e-4, jax.random.fold_in(key, i))
        l0 = float(m["loss"])
    print(
        f"compile+warm {time.perf_counter() - t0:.0f}s loss={l0:.4f}",
        file=sys.stderr, flush=True,
    )
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, m = step_fn(
                state, tokens, labels, 1e-4, jax.random.fold_in(key, 100 + i)
            )
        l1 = float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / args.steps)
    assert jnp.isfinite(l1), l1
    print(f"chained per-step: {best * 1e3:.1f} ms  loss={l1:.4f}")


if __name__ == "__main__":
    main()
