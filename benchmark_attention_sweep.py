"""On-chip splash-attention block-size sweep (fwd+bwd at train shapes).

The per-op step profile (profile_step.py) shows the splash kernels at
~30% MXU utilization with the round-2 blocks (1024/1024 fused bwd):
fwd 3.45 ms/layer, fused dkv 5.9 ms/layer at B8 H32 KV4 S2048 hd64.
This sweep times the COMPOSED fwd+bwd (value_and_grad through the same
vmap-of-vmap dispatch the model uses, models/llama.py::attention) for
each block config, differential device-loop methodology (two iteration
counts cancel dispatch latency; the grad folds back into q so nothing
is DCE'd or hoisted).

Usage: python benchmark_attention_sweep.py [--bs 8] [--seq 2048]
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


def make_attn(B, S, H, KV, hd, bq, bkv, bkvc, bq_dkv, bkv_dkv, bkv_dkvc, fused):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sak,
        splash_attention_mask as sam,
    )

    bs = sak.BlockSizes(
        block_q=bq, block_kv=bkv, block_kv_compute=bkvc,
        block_q_dkv=bq_dkv, block_kv_dkv=bkv_dkv,
        block_kv_dkv_compute=bkv_dkvc,
        use_fused_bwd_kernel=fused,
        # non-fused bwd needs the dq kernel's own blocks
        **({} if fused else dict(block_q_dq=bq_dkv, block_kv_dq=bkv_dkv)),
    )
    G = H // KV
    mask = sam.MultiHeadMask([sam.CausalMask((S, S)) for _ in range(G)])
    kern = sak.make_splash_mqa_single_device(mask, block_sizes=bs)

    def attn(q, k, v):
        # q [B,S,H,hd] -> grouped [B,KV,G,S,hd]; k/v [B,S,KV,hd]
        qs = q * jnp.asarray(hd**-0.5, q.dtype)
        qg = qs.transpose(0, 2, 1, 3).reshape(B, KV, G, S, hd)
        kg = k.transpose(0, 2, 1, 3)
        vg = v.transpose(0, 2, 1, 3)
        out = jax.vmap(jax.vmap(kern))(qg, kg, vg)
        return out.reshape(B, H, S, hd).transpose(0, 2, 1, 3)

    def loss(q, k, v, g):
        return jnp.sum(attn(q, k, v).astype(jnp.float32) * g)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def step(q, k, v, g):
        dq, dk, dv = grad(q, k, v, g)
        # fold grads back in (anti-DCE chain)
        return (
            q + 1e-6 * dq.astype(q.dtype),
            k + 1e-6 * dk.astype(k.dtype),
            v + 1e-6 * dv.astype(v.dtype),
        )

    return step


def time_config(step, q, k, v, g, iters_lo=4, iters_hi=12):
    # ONE compile per config: the trip count is a runtime argument (the
    # fori_loop lowers to a while), so the lo/hi differential reuses the
    # same executable — compile time through the remote tunnel dominates
    # a two-program version.
    @jax.jit
    def many(iters, q, k, v):
        def body(i, qkv):
            return step(*qkv, g)

        return jax.lax.fori_loop(0, iters, body, (q, k, v))

    def run(iters):
        out = many(iters, q, k, v)
        np.asarray(jax.device_get(out[0].ravel()[0]))

    run(jnp.int32(iters_lo))  # compile + warm
    t_lo = t_hi = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        run(jnp.int32(iters_lo))
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(jnp.int32(iters_hi))
        t_hi = min(t_hi, time.perf_counter() - t0)
    return (t_hi - t_lo) / (iters_hi - iters_lo)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--seq", type=int, default=2048)
    p.add_argument("--heads", type=int, default=32)
    p.add_argument("--kv_heads", type=int, default=4)
    p.add_argument("--head_dim", type=int, default=64)
    args = p.parse_args()

    B, S, H, KV, hd = args.bs, args.seq, args.heads, args.kv_heads, args.head_dim
    key = jax.random.PRNGKey(0)
    kq, kk, kv_, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, S, H, hd), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, KV, hd), jnp.bfloat16)
    v = jax.random.normal(kv_, (B, S, KV, hd), jnp.bfloat16)
    g = jax.random.normal(kg, (B, S, H, hd), jnp.bfloat16) * 0.01

    # (bq, bkv, bkvc, bq_dkv, bkv_dkv, bkv_dkvc, fused)
    cur = (1024, 1024, 512, 1024, 1024, 512, True)  # round-4 adopted
    configs = [
        cur,
        (1024, 1024, 256, 1024, 1024, 256, True),
        (1024, 1024, 512, 512, 1024, 512, True),
        (512, 1024, 512, 1024, 1024, 512, True),
        (1024, 1024, 256, 1024, 1024, 512, True),
        (1024, 2048, 512, 1024, 1024, 512, True),
    ]
    results = []
    for cfg in configs:
        bq, bkv, bkvc, bqd, bkvd, bkvdc, fused = cfg
        if max(bq, bkv, bqd, bkvd) > S:
            continue
        tag = f"q{bq}/kv{bkv}/c{bkvc} dkv q{bqd}/kv{bkvd}/c{bkvdc} {'fused' if fused else 'split'}"
        try:
            step = make_attn(B, S, H, KV, hd, *cfg)
            dt = time_config(step, q, k, v, g)
            results.append((dt, tag))
            log(f"{dt * 1e3:8.2f} ms  {tag}" + ("   <- current" if cfg == cur else ""))
        except Exception as e:
            log(f"    FAIL  {tag}: {type(e).__name__}: {str(e)[:120]}")
    results.sort()
    log("\nbest:")
    for dt, tag in results[:3]:
        log(f"{dt * 1e3:8.2f} ms  {tag}")


if __name__ == "__main__":
    main()
