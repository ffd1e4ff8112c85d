"""Producer->quantize chain benchmark: fused kernels vs unfused composite.

Measures the exact chains the all-INT8 train step runs at llama2-1b bs8
seq2048 shapes (M=16384 tokens):

  norm+row   rms_norm -> rowwise int8 quantize      (qkv / gate-up input)
  norm+col   rms_norm -> colwise int8 quantize      (grad_weight operand)
  silu+row   silu(a)*b -> rowwise int8 quantize     (down-proj input)
  silu+col   silu(a)*b -> colwise int8 quantize

For each chain: the unfused composite (XLA producer materializes bf16,
then the ops/pallas_quant kernel re-reads it) vs the fused
ops/pallas_fused kernel. Timing is differential device-side fori_loop
(same methodology as benchmark_mm.py): every iteration folds the int8
output back into the bf16 input so nothing can be DCE'd or hoisted, and
two iteration counts cancel dispatch latency and the fold pass (the fold
is IDENTICAL for both variants, so the fused-vs-unfused delta is clean).

Reports ms/call and the effective HBM GB/s of the minimum traffic the
chain must move (fused traffic model), so "fraction of ~819 GB/s" reads
directly as kernel quality.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def device_loop_ms(fn, args, it_lo=32, it_hi=160) -> float:
    """Differential device-loop ms/call of fn(x, *rest) -> (q, s).

    Folds q (int8) back into x so the chain cannot be eliminated."""

    def make(iters):
        @jax.jit
        def many(x0, *rest):
            def body(i, x):
                q, _ = fn(x, *rest)
                return x + q.astype(x.dtype) * jnp.asarray(1e-9, x.dtype)

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

    return (t(f_hi) - t(f_lo)) / (it_hi - it_lo) * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--M", type=int, default=16384)
    p.add_argument("--K", type=int, default=2048)
    p.add_argument("--F", type=int, default=5632)
    args = p.parse_args()

    from quantized_training_tpu.ops import pallas_fused as pf
    from quantized_training_tpu.ops import pallas_quant as pq

    M, K, F = args.M, args.K, args.F
    EPS = 1e-5
    x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.float32).astype(
        jnp.bfloat16
    )
    g = (
        1 + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (1, K), jnp.float32)
    ).astype(jnp.bfloat16)
    a = jax.random.normal(jax.random.PRNGKey(2), (M, F), jnp.float32).astype(
        jnp.bfloat16
    )
    b = jax.random.normal(jax.random.PRNGKey(3), (M, F), jnp.float32).astype(
        jnp.bfloat16
    )

    def unfused_norm(axis):
        quant = (
            pq.quantize_int8_rowwise if axis == 1 else pq.quantize_int8_colwise
        )

        def f(x, g):
            y = pf.rms_norm_ref(x, g[0], EPS)
            return quant(y)

        return f

    def unfused_silu(axis):
        quant = (
            pq.quantize_int8_rowwise if axis == 1 else pq.quantize_int8_colwise
        )

        def f(a, b):
            return quant(pf.silu_mul_ref(a, b))

        return f

    # minimum-traffic model for the FUSED chain (bytes): row = 1 read of
    # each input + q write; col = 2 reads + q write
    def gbs(name, ms, n_inputs, width, passes):
        bytes_moved = (n_inputs * passes * 2 + 1) * M * width
        return bytes_moved / (ms * 1e-3) / 1e9

    rows = []
    cases = [
        ("norm+row", unfused_norm(1),
         functools.partial(pf.rmsnorm_quant_rowwise, norm_eps=EPS),
         (x, g), 1, K, 1),
        ("norm+col", unfused_norm(0),
         functools.partial(pf.rmsnorm_quant_colwise, norm_eps=EPS),
         (x, g), 1, K, 2),
        ("silu+row", unfused_silu(1), pf.silu_mul_quant_rowwise,
         (a, b), 2, F, 1),
        ("silu+col", unfused_silu(0), pf.silu_mul_quant_colwise,
         (a, b), 2, F, 2),
    ]
    for name, uf, ff, ar, n_in, width, passes in cases:
        ms_u = device_loop_ms(uf, ar)
        ms_f = device_loop_ms(ff, ar)
        rows.append((name, ms_u, ms_f, gbs(name, ms_f, n_in, width, passes)))
        log(f"{name}: unfused {ms_u:.3f} ms, fused {ms_f:.3f} ms "
            f"({ms_u / ms_f:.2f}x), fused {rows[-1][3]:.0f} GB/s")

    print("| chain | unfused ms | fused ms | speedup | fused GB/s |")
    print("|---|---|---|---|---|")
    for name, ms_u, ms_f, bw in rows:
        print(f"| {name} | {ms_u:.3f} | {ms_f:.3f} | {ms_u / ms_f:.2f}x "
              f"| {bw:.0f} |")

    round4_chains(M, K, F)


def device_loop_ms_gen(fn, args, it_lo=32, it_hi=160) -> float:
    """Differential device-loop ms/call; fn(x, *rest) returns any pytree
    whose FIRST leaf folds back into x (broadcast-add, anti-DCE)."""

    def make(iters):
        @jax.jit
        def many(x0, *rest):
            def body(i, x):
                out = jax.tree.leaves(fn(x, *rest))[0]
                out = out.astype(x.dtype).reshape(x.shape)
                return x + out * jnp.asarray(1e-9, x.dtype)

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

    return (t(f_hi) - t(f_lo)) / (it_hi - it_lo) * 1e3


def round4_chains(M, K, F):
    """Round-4 fused chains: silu backward both-quantize, rope+grouping,
    attention-output ungroup+quantize (see ops/pallas_rope.py)."""
    from quantized_training_tpu.ops import pallas_fused as pf
    from quantized_training_tpu.ops import pallas_rope as pr
    from quantized_training_tpu.quant.core import quantize_int8_both

    B, S, H, KV, hd = 8, M // 8, 32, 4, 64
    a = jax.random.normal(jax.random.PRNGKey(2), (M, F), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(3), (M, F), jnp.bfloat16)
    dy = jax.random.normal(jax.random.PRNGKey(4), (M, F), jnp.bfloat16)
    xq = jax.random.normal(jax.random.PRNGKey(5), (B, S, H, hd), jnp.bfloat16)
    yg = jax.random.normal(
        jax.random.PRNGKey(6), (B, KV, H // KV, S, hd), jnp.bfloat16
    )
    inv = 1.0 / (10000.0 ** (jnp.arange(0, hd, 2, jnp.float32) / hd))
    emb = jnp.concatenate(
        [jnp.outer(jnp.arange(S, dtype=jnp.float32), inv)] * 2, -1
    )
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    c2, s2 = pr.pair_tables(cos, sin)

    def unfused_silu_bwd(a, b, dy):
        da, db = pf.silu_mul_bwd_f32(a, b, dy)
        da = da.astype(a.dtype)
        db = db.astype(a.dtype)
        return quantize_int8_both(da) + quantize_int8_both(db)

    def fused_silu_bwd(a, b, dy):
        row = pf.silu_mul_bwd_quant_rowwise(a, b, dy)
        col = pf.silu_mul_bwd_quant_colwise(
            a, b, dy, row[4] * (1 / 127.0), row[5] * (1 / 127.0)
        )
        return row + col

    def unfused_rope_group(x):
        return pr.rope_group_ref(x, cos, sin, KV)

    def fused_rope_group(x):
        return pr.rope_group_kernel(x, c2, s2, kv=KV)

    def unfused_ungroup(y):
        return pr.rope_ungroup_ref(y, cos, sin, KV, inverse=True)

    def fused_ungroup(y):
        return pr.rope_ungroup_kernel(y, c2, s2, inverse=True)

    def unfused_out_quant(y):
        x2d = pr.rope_ungroup_ref(
            y, jnp.ones_like(cos), jnp.zeros_like(sin), KV
        ).reshape(B * S, H * hd)
        from quantized_training_tpu.ops.pallas_quant import (
            quantize_int8_rowwise,
        )

        return quantize_int8_rowwise(x2d)

    def fused_out_quant(y):
        row, col = pr.ungroup_amax(y)
        return pr.ungroup_quant(y, row * (1 / 127.0), axis=1), row, col

    gb_silu = 3 * M * F * 2 / 1e9  # one read of (a, b, dy)
    gb_rope = 2 * B * S * H * hd * 2 / 1e9  # read + write bf16
    cases = [
        ("silu-bwd both-q", unfused_silu_bwd, fused_silu_bwd, (a, b, dy),
         2 * gb_silu + 4 * M * F / 1e9),
        ("rope+group (q)", unfused_rope_group, fused_rope_group, (xq,),
         gb_rope),
        ("ungroup+rope (dq)", unfused_ungroup, fused_ungroup, (yg,), gb_rope),
        ("attn-out -> int8 row", unfused_out_quant, fused_out_quant, (yg,),
         gb_rope + B * S * H * hd / 1e9),
    ]
    print("| round-4 chain | unfused ms | fused ms | speedup | fused GB/s |")
    print("|---|---|---|---|---|")
    for name, uf, ff, ar, vol in cases:
        ms_u = device_loop_ms_gen(uf, ar)
        ms_f = device_loop_ms_gen(ff, ar)
        log(f"{name}: unfused {ms_u:.3f} ms, fused {ms_f:.3f} ms")
        print(f"| {name} | {ms_u:.3f} | {ms_f:.3f} | {ms_u / ms_f:.2f}x "
              f"| {vol / (ms_f * 1e-3):.0f} |")


if __name__ == "__main__":
    main()
