"""GEMM benchmark + correctness harness (benchmark_mm.py analog).

Methodology parity with the reference: every kernel is asserted against the
fp32 oracle BEFORE timing (benchmark_mm.py:98-107), shapes swept over
1k/2k/4k squares (:209+), results reported as TFLOPS alongside the
device's theoretical peak (v5e MXU: 197 bf16 TFLOPS, 394 int8 TOPS).

TPU-specific: the timing loop runs device-side (fori_loop chaining the
output into the next iteration) because host-side timing is unreliable
through remote-execution tunnels; each timed program is called twice
(compile+warm, then timed with a forced readback).

Usage: python benchmark_mm.py [--sizes 1024 2048 4096] [--quick]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from quantized_training_tpu import ops
from quantized_training_tpu.ops import pallas_mm
from quantized_training_tpu.quant import core

PEAKS = {"bf16": 197.0, "int8": 394.0}  # TPU v5e


def _sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def device_loop_tflops(
    fn, args, flops_per_iter: float, it_lo: int | None = None,
    it_hi: int | None = None,
) -> float:
    """Differential device-side timing of fn(*args) -> TFLOPS.

    Anti-DCE/anti-hoist chaining: ALL of the output folds back into the
    next iteration's first operand (so the op can be neither eliminated,
    narrowed, nor hoisted out of the loop), and timing two iteration
    counts cancels both the fixed dispatch latency (~25-40 ms through the
    remote tunnel) and the per-iteration fold pass. (An earlier version
    reduced the output to a scalar each iteration — that full reduce cost
    a pass over [M,N] per iteration and under-reported small-matmul rates
    by ~2x.)
    """
    if it_lo is None:
        # size the differential to ~0.1 s of work at MXU peak, so small
        # matmuls (sub-0.1 ms each) are not lost in run-to-run noise
        d = min(20000, max(64, int(4e13 / flops_per_iter)))
        it_lo = max(8, d // 4)
    if it_hi is None:
        it_hi = it_lo * 5

    x0 = args[0]
    M = x0.shape[0]

    def make(iters):
        @jax.jit
        def many(x0, *rest):
            def body(i, x):
                out = fn(x, *rest)
                N = out.shape[1]
                K = x.shape[1]
                # consume EVERY output column in K-wide slices (so the dot
                # cannot be narrowed) with a single read of `out` — a
                # pad+reshape here costs ~3 extra passes over [M, N] and
                # under-reports wide-N matmuls
                folded = out[:, :K].astype(jnp.float32)
                if folded.shape[1] < K:  # N < K
                    folded = jnp.pad(folded, ((0, 0), (0, K - folded.shape[1])))
                for s in range(K, N, K):
                    chunk = out[:, s : s + K].astype(jnp.float32)
                    if chunk.shape[1] < K:
                        chunk = jnp.pad(chunk, ((0, 0), (0, K - chunk.shape[1])))
                    folded = folded + chunk
                if x.dtype == jnp.int8:
                    return (x ^ folded.astype(jnp.int8)) | jnp.int8(1)
                return x + (folded * 1e-9).astype(x.dtype)

            return jax.lax.fori_loop(0, iters, body, x0)

        return many

    f_lo, f_hi = make(it_lo), make(it_hi)
    _sync(f_lo(*args))
    _sync(f_hi(*args))

    def t(f):
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            _sync(f(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = (t(f_hi) - t(f_lo)) / (it_hi - it_lo)
    return flops_per_iter / dt / 1e12


def check(name, actual, ref, atol, rtol):
    np.testing.assert_allclose(
        np.asarray(actual, np.float32), np.asarray(ref, np.float32),
        atol=atol, rtol=rtol, err_msg=name,
    )


def bench_size(n: int, quick: bool) -> dict[str, float]:
    """Square matmuls A[n,n] @ B[n,n] like the reference tables."""
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    a_bf = jax.random.normal(ks[0], (n, n), jnp.bfloat16)
    b_bf = jax.random.normal(ks[1], (n, n), jnp.bfloat16)
    a_i8, sa = core.quantize_int8(a_bf.astype(jnp.float32), axis=1)
    b_i8, sb = core.quantize_int8(b_bf.astype(jnp.float32), axis=0)
    sa32, sb32 = sa.astype(jnp.float32), sb.astype(jnp.float32)
    flops = 2.0 * n * n * n
    res = {}

    # --- correctness gates (reference: assert before timing) ---
    # exact oracle: int8 MXU accumulation is exact in int32, so the scale
    # epilogue applied to the exact int32 product is the ground truth
    # (fp32 'highest' matmuls are unsupported/crashy on this backend)
    acc_exact = jax.lax.dot_general(
        a_i8, b_i8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    oracle = acc_exact * sa32 * sb32
    with ops.use_backend("xla"):
        check("xla scaled_mm", ops.scaled_mm(a_i8, b_i8, sa32, sb32, out_dtype=jnp.float32), oracle, 0.5, 1e-2)
    check(
        "pallas scaled_mm",
        pallas_mm.scaled_mm(a_i8, b_i8, sa32, sb32, out_dtype=jnp.float32),
        oracle, 0.5, 1e-2,
    )
    sa_t = jax.random.uniform(ks[2], (n // 128, n // 128), jnp.float32) * 0.01
    sb_t = jax.random.uniform(ks[3], (n // 128, n // 128), jnp.float32) * 0.01
    qblk = n // 128
    # exact tile oracle: blockwise-exact int32 partials x expanded scales
    a3 = a_i8.reshape(n, qblk, 128).transpose(1, 0, 2)
    b3 = b_i8.reshape(qblk, 128, n)
    part = jax.lax.dot_general(
        a3, b3, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    tile_oracle = jnp.einsum(
        "kmn,km,kn->mn",
        part,
        jnp.repeat(sa_t, 128, 0).T,
        jnp.repeat(sb_t, 128, 1),
    )
    check(
        "pallas tile_scaled_mm",
        pallas_mm.tile_scaled_mm(a_i8, b_i8, sa_t, sb_t, out_dtype=jnp.float32),
        tile_oracle, 0.5, 1e-2,
    )

    # --- timing (device-side loops) ---
    res["xla_bf16"] = device_loop_tflops(
        lambda a, b: jax.lax.dot(a, b, precision=None, preferred_element_type=jnp.bfloat16),
        (a_bf, b_bf), flops,
    )
    res["xla_int8"] = device_loop_tflops(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ),
        (a_i8, b_i8), flops,
    )

    def xla_scaled(a, sa_, sb_, b):
        acc = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * sa_ * sb_

    res["xla_scaled_int8"] = device_loop_tflops(xla_scaled, (a_i8, sa32, sb32, b_i8), flops)
    res["pallas_scaled_int8"] = device_loop_tflops(
        lambda a, sa_, sb_, b: pallas_mm.scaled_mm(a, b, sa_, sb_, out_dtype=jnp.float32),
        (a_i8, sa32, sb32, b_i8), flops,
    )
    res["pallas_tile_scaled_int8"] = device_loop_tflops(
        lambda a, sa_, sb_, b: pallas_mm.tile_scaled_mm(a, b, sa_, sb_, out_dtype=jnp.float32),
        (a_i8, sa_t, sb_t, b_i8), flops,
    )
    if not quick:
        res["pallas_bf16"] = device_loop_tflops(
            lambda a, b: pallas_mm.matmul(a, b, acc_dtype=jnp.float32, out_dtype=jnp.bfloat16),
            (a_bf, b_bf), flops,
        )
        # dynamic-quant int8 including quantization cost (the training path)
        def dyn(a, b):
            ai, sa_ = core.quantize_int8(a, axis=1)
            bi, sb_ = core.quantize_int8(b, axis=0)
            return ops.scaled_mm(ai, bi, sa_, sb_, out_dtype=jnp.bfloat16)

        with ops.use_backend("xla"):
            res["xla_dynamic_int8"] = device_loop_tflops(dyn, (a_bf, b_bf), flops)
    return res


def bench_train_shapes():
    """Time the actual training matmuls of Llama at bs8/seq2048: the
    dynamic-quant INT8 linear (fwd shape M=B*S) vs plain bf16, including
    quantization overhead — the fwd hot path of mixed_precision."""
    from quantized_training_tpu.quant.mixed_precision import _dynamic_int8_mm

    shapes = [
        ("attn_qkvo 1b", 16384, 2048, 2048),
        ("mlp_up 1b", 16384, 2048, 5632),
        ("mlp_down 1b", 16384, 5632, 2048),
        ("attn 470m", 16384, 1024, 1024),
        ("mlp_up 470m", 16384, 1024, 4096),
    ]
    print("--- training shapes: x[M,K] @ w.T[K,N] (fwd) ---")
    for name, M, K, N in shapes:
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        x = jax.random.normal(ks[0], (M, K), jnp.bfloat16)
        w = jax.random.normal(ks[1], (N, K), jnp.bfloat16)
        flops = 2.0 * M * K * N

        bf16 = device_loop_tflops(
            lambda x_, w_: x_ @ w_.T, (x, w), flops,
        )
        with ops.use_backend("xla"):
            # dims=(1,1): the transpose-free form _mp_linear actually uses
            # (w stays [N, K], quantized row-wise along its contraction axis)
            dyn = device_loop_tflops(
                lambda x_, w_: _dynamic_int8_mm(x_, w_, False, None, (1, 1)),
                (x, w), flops,
            )
        print(
            f"  {name:16s} M={M} K={K} N={N}: bf16 {bf16:6.1f}  dyn_int8 {dyn:6.1f} "
            f" ({dyn / bf16:.2f}x)", flush=True,
        )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=[1024, 2048, 4096])
    p.add_argument("--quick", action="store_true")
    p.add_argument("--train-shapes", action="store_true")
    args = p.parse_args()

    if args.train_shapes:
        print(f"device: {jax.devices()[0].device_kind}")
        bench_train_shapes()
        return

    print(f"device: {jax.devices()[0].device_kind}; peaks bf16={PEAKS['bf16']} int8={PEAKS['int8']} TFLOPS")
    rows = {}
    for n in args.sizes:
        print(f"--- {n}x{n}x{n} ---", flush=True)
        rows[n] = bench_size(n, args.quick)
        for k, v in rows[n].items():
            peak = PEAKS["int8"] if "int8" in k else PEAKS["bf16"]
            print(f"  {k:26s} {v:8.1f} TFLOPS  ({100*v/peak:5.1f}% of peak)", flush=True)

    hdr = ["kernel"] + [str(n) for n in rows]
    keys = list(next(iter(rows.values())))
    print("\n| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for k in keys:
        print("| " + k + " | " + " | ".join(f"{rows[n].get(k, float('nan')):.1f}" for n in rows) + " |")


if __name__ == "__main__":
    main()
