"""ViT-Giant (K=1536/6144, the reference's timm finetune-scale target)
bf16 vs int8-MP train throughput, device-resident data (VERDICT r3 item 8)."""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from quantized_training_tpu import optim, quant
from quantized_training_tpu.models import vit


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(scheme, min_k, bs=24, n=6):
    import dataclasses
    cfg = dataclasses.replace(vit.VIT_GIANT, remat=True)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    filter_fn = None
    if min_k:
        from quantized_training_tpu.quant.api import _default_filter

        def filter_fn(path, leaf):
            return _default_filter(path, leaf) and leaf.shape[-1] >= min_k

    qparams = quant.quantize_params(params, scheme, filter_fn=filter_fn)
    # bf16 optimizer states: fp32 AdamW m+v alone are ~14 GB at Giant's
    # 1.8B params (the whole chip); bf16-SR states are the reference's
    # own answer at this scale (optimizers/adamw_bf16.py)
    optimizer = optim.adamw_bf16_sr(bf16_stochastic_rounding=False)
    opt_state = optimizer.init(quant.virtual_params(qparams))
    images = jax.random.normal(
        jax.random.PRNGKey(1), (bs, cfg.image_size, cfg.image_size, 3), jnp.bfloat16
    )
    labels = jax.random.randint(jax.random.PRNGKey(2), (bs,), 0, cfg.num_classes, jnp.int32)

    # donate params+opt state: without aliasing, XLA holds input AND
    # output copies of ~6.6 GB of state in flight — at Giant scale that
    # alone OOMs the 16 GB chip
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(qparams, opt_state, skey):
        v = quant.virtual_params(qparams)

        def loss(v):
            merged = quant.merge_masters(v, qparams)
            return vit.loss_fn(merged, images, labels, cfg, key=skey)

        l, g = jax.value_and_grad(loss)(v)
        v2, opt_state2 = optimizer.step(g, opt_state, v, 1e-4, jax.random.fold_in(skey, 1))
        return quant.commit_params(v2, qparams, jax.random.fold_in(skey, 2)), opt_state2, l

    key = jax.random.PRNGKey(3)
    t0 = time.perf_counter()
    qparams, opt_state, l = step(qparams, opt_state, key)
    np.asarray(jax.device_get(l))
    log(f"  compile+warm {time.perf_counter()-t0:.0f}s loss={float(l):.3f}")
    # synced
    t0 = time.perf_counter()
    for i in range(n):
        qparams, opt_state, l = step(qparams, opt_state, jax.random.fold_in(key, i))
        np.asarray(jax.device_get(l))
    dt_s = (time.perf_counter() - t0) / n
    # chained
    t0 = time.perf_counter()
    for i in range(n):
        qparams, opt_state, l = step(qparams, opt_state, jax.random.fold_in(key, 100 + i))
    np.asarray(jax.device_get(l))
    dt_c = (time.perf_counter() - t0) / n
    log(f"  synced {dt_s*1e3:.1f} ms, chained {dt_c*1e3:.1f} ms")
    return bs / min(dt_s, dt_c)


def main():
    # bs fallback: Giant (1.8B params) + AdamW states + bs24 activations
    # exceed 16 GB HBM on one v5e chip — step down until a batch fits,
    # using the SAME bs for every scheme so the comparison stays fair
    chosen_bs = None
    for name, scheme, min_k in [
        ("bf16", None, 0),
        ("int8-MP", "mixed_precision", 0),
        ("int8-MP min_k=1536", "mixed_precision", 1536),
    ]:
        for bs in ([chosen_bs] if chosen_bs else [24, 12, 8, 4]):
            try:
                log(f"measuring vit_giant {name} bs{bs} ...")
                r = measure(scheme, min_k, bs=bs)
                print(f"vit_giant bs{bs} {name}: {r:.1f} img/s", flush=True)
                chosen_bs = bs
                break
            except Exception as e:
                print(
                    f"vit_giant bs{bs} {name}: FAIL {type(e).__name__}: "
                    f"{str(e)[:140]}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
