"""On-chip micro-bench: rope kernels vs the jnp composite at train shapes."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from quantized_training_tpu.ops.pallas_rope import (
    pair_tables,
    rope_group_kernel,
    rope_group_ref,
    rope_ungroup_kernel,
    rope_ungroup_ref,
    ungroup_amax,
    ungroup_quant,
)

B, S, H, KV, hd = 8, 2048, 32, 4, 64
G = H // KV


def timeit(f, *a, iters=30):
    out = f(*a)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


x = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, hd), jnp.bfloat16)
y = jax.random.normal(jax.random.PRNGKey(1), (B, KV, G, S, hd), jnp.bfloat16)
k4 = jax.random.normal(jax.random.PRNGKey(2), (B, S, KV, hd), jnp.bfloat16)
inv = 1.0 / (10000.0 ** (jnp.arange(0, hd, 2, jnp.float32) / hd))
emb = jnp.concatenate([jnp.outer(jnp.arange(S, dtype=jnp.float32), inv)] * 2, -1)
cos, sin = jnp.cos(emb), jnp.sin(emb)
c2, s2 = pair_tables(cos, sin)

g = jax.jit(lambda x: rope_group_kernel(x, c2, s2, kv=KV))
gk = jax.jit(lambda k: rope_group_kernel(k, c2, s2, kv=KV))  # G=1 path
u = jax.jit(lambda y: rope_ungroup_kernel(y, c2, s2, inverse=True))
gr = jax.jit(lambda x: rope_group_ref(x, cos, sin, KV))
ur = jax.jit(lambda y: rope_ungroup_ref(y, cos, sin, KV, inverse=True))
am = jax.jit(lambda y: ungroup_amax(y))
row0, col0 = am(y)
qr = jax.jit(lambda y, s: ungroup_quant(y, s, axis=1))
qc = jax.jit(lambda y, s: ungroup_quant(y, s, axis=0))

# correctness on-chip
np.testing.assert_allclose(
    np.asarray(g(x), np.float32), np.asarray(gr(x), np.float32), atol=2e-2
)
np.testing.assert_allclose(
    np.asarray(u(y), np.float32),
    np.asarray(ur(y), np.float32).reshape(B, S, H, hd),
    atol=2e-2,
)
gb = 2 * B * S * H * hd * 2 / 1e9
gbk = 2 * B * S * KV * hd * 2 / 1e9
for name, f, a, vol in [
    ("group_kernel", g, (x,), gb),
    ("group_ref(jnp)", gr, (x,), gb),
    ("group_kernel G=1 (k)", gk, (k4,), gbk),
    ("ungroup_kernel", u, (y,), gb),
    ("ungroup_ref(jnp)", ur, (y,), gb),
    ("ungroup_amax", am, (y,), gb / 2),
    ("ungroup_quant_row", qr, (y, row0 * (1 / 127.0)), gb * 0.75),
    ("ungroup_quant_col", qc, (y, col0 * (1 / 127.0)), gb * 0.75),
]:
    dt = timeit(f, *a)
    print(f"{name:22s} {dt * 1e3:7.3f} ms  {vol / dt:6.0f} GB/s")
