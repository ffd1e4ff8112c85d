"""Component-level timing of the train step on the real chip.

Brackets where the time goes: raw MXU matmuls at step shapes,
quantize_int8 bandwidth, and the full train step per variant (bf16 with
and without remat; int8 mixed-precision on each ops backend).
Device-side repeat loops (lax.fori_loop chaining) keep host/tunnel
dispatch out of the numbers; use profile_step.py for the per-op
fwd/bwd attribution inside the step.

Usage: python benchmark_step_components.py [--model llama2-1b] [--bs 8]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(out):
    """Force real completion: the remote tunnel acks block_until_ready
    early, so read one element back to the host."""
    import numpy as np

    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def timed(fn, *args, iters=4):
    """Median-of-iters wall time of a jitted fn (compile excluded)."""
    _sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def bench_matmul(M, K, N, dtype):
    """Raw dot_general TFLOPS via benchmark_mm's differential device-loop
    harness (single timing methodology for all published numbers)."""
    from benchmark_mm import device_loop_tflops

    acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32
    if dtype == jnp.int8:
        a = jax.random.randint(jax.random.PRNGKey(0), (M, K), -127, 128, jnp.int8)
        b = jax.random.randint(jax.random.PRNGKey(1), (K, N), -127, 128, jnp.int8)
    else:
        a = (jax.random.normal(jax.random.PRNGKey(0), (M, K)) * 0.1).astype(dtype)
        b = (jax.random.normal(jax.random.PRNGKey(1), (K, N)) * 0.1).astype(dtype)

    return device_loop_tflops(
        lambda a_, b_: jax.lax.dot_general(
            a_, b_, (((1,), (0,)), ((), ())), preferred_element_type=acc_t
        ),
        (a, b),
        2.0 * M * K * N,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="llama2-1b")
    parser.add_argument("--bs", type=int, default=8)
    parser.add_argument("--seq", type=int, default=2048)
    parser.add_argument("--no_remat", action="store_true")
    parser.add_argument("--only_model", action="store_true",
                        help="skip the raw matmul/quantize microbenches")
    args = parser.parse_args()

    from quantized_training_tpu import optim, quant
    from quantized_training_tpu.models import llama
    from quantized_training_tpu.quant.core import quantize_int8
    from quantized_training_tpu.train import init_train_state, make_train_step

    log(f"device: {jax.devices()[0].device_kind}")

    # --- raw GEMM speed-of-light at step shapes --------------------------
    T = args.bs * args.seq
    if not args.only_model:
        for dt_ in (jnp.bfloat16, jnp.int8):
            for shape in [(T, 2048, 2048), (T, 2048, 5632), (4096, 4096, 4096)]:
                tf = bench_matmul(*shape, dt_)
                log(f"matmul {shape} {dt_.__name__}: {tf:,.1f} TFLOPS")

    # --- quantize_int8 bandwidth (differential chained loop) -------------
    if args.only_model:
        x = None
    else:
        x = jax.random.normal(jax.random.PRNGKey(0), (T, 2048), jnp.bfloat16)

    def make_q(iters):
        @jax.jit
        def f(x):
            def body(i, x):
                xq, s = quantize_int8(x, axis=1)
                return x + xq.astype(jnp.bfloat16) * (s * 1e-9).astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, iters, body, x)

        return f

    if x is not None:
        t_lo, t_hi = timed(make_q(8), x), timed(make_q(72), x)
        dtq = (t_hi - t_lo) / 64
        log(f"quantize_int8 [{T},2048]: {dtq * 1e3:.3f} ms/call "
            f"({x.size * 3 / dtq / 2**30:.0f} GiB/s effective)")

    # --- model-level -----------------------------------------------------
    cfg = {"llama2-1b": llama.LLAMA2_1B, "llama2-470m": llama.LLAMA2_470M}[args.model]
    cfg = dataclasses.replace(
        cfg, max_position_embeddings=args.seq, remat=not args.no_remat
    )
    # keep the master copy on HOST — a resident device copy costs 2.2 GB of
    # the 16 GB HBM and OOMs the 1B model variants
    params = jax.device_get(llama.init_params(jax.random.PRNGKey(0), cfg))
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (args.bs, args.seq), 0, cfg.vocab_size, jnp.int32
    )
    labels = jnp.roll(tokens, -1, axis=-1)
    n = llama.num_params(params)
    step_flops = 6 * n * T  # fwd+bwd dense estimate, no attn quadratic term
    log(f"model {args.model}: {n/1e9:.2f}B params, {step_flops/1e12:.1f} TFLOP/step")

    from quantized_training_tpu import ops

    variants = [
        # (tag, scheme, cfg override, ops backend)
        ("bf16", None, {}, None),
        ("bf16/no-remat", None, {"remat": False}, None),
        ("int8mp/pallas", "mixed_precision", {}, "pallas"),
        ("int8mp/xla", "mixed_precision", {}, "xla"),
    ]
    for tag, scheme, over, backend in variants:
        try:
            _run_variant(
                tag, scheme, over, backend, cfg, params, tokens, labels, T,
                step_flops,
            )
        except Exception as e:
            log(f"[{tag}] FAILED {type(e).__name__}: {str(e)[:160]}")
            ops.set_backend("auto")


def _run_variant(tag, scheme, over, backend, cfg, params, tokens, labels, T,
                 step_flops):
    from quantized_training_tpu import ops, optim, quant
    from quantized_training_tpu.models import llama
    from quantized_training_tpu.train import init_train_state, make_train_step

    vcfg = dataclasses.replace(cfg, **over)
    if backend:
        ops.set_backend(backend)
    # params arrive as host numpy; fresh device buffers per variant
    # (the train step donates its state)
    qparams = quant.quantize_params(jax.tree.map(jnp.asarray, params), scheme)

    optimizer = optim.adamw_bf16_sr(bf16_stochastic_rounding=False)
    state = init_train_state(qparams, optimizer)
    step_fn = make_train_step(vcfg, optimizer)
    key = jax.random.PRNGKey(2)
    state, m = step_fn(state, tokens, labels, 1e-4, key)  # compile
    _sync(m)
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        state, m = step_fn(state, tokens, labels, 1e-4, jax.random.fold_in(key, i))
        _sync(m)
        ts.append(time.perf_counter() - t0)
    t_step = sorted(ts)[len(ts) // 2]
    ops.set_backend("auto")

    log(
        f"[{tag}] full step {t_step*1e3:,.0f} ms -> {T/t_step:,.0f} tok/s, "
        f"{step_flops/t_step/1e12:,.0f} TFLOPS-equiv"
    )


if __name__ == "__main__":
    main()
