"""Fused AdamW-BF16-SR optimizer update as a single Pallas kernel.

The reference fuses its optimizer math + stochastic-rounding bit trick per
parameter with torch.compile (other_optim/bf16_sr.py:61-73, :108-122); the
TPU-native equivalent is one Pallas kernel per parameter tensor doing

  fp32 math on bf16 states -> new exp_avg / exp_avg_sq (bf16) ->
  weight update -> SR writeback via on-chip PRNG
  (pltpu.prng_random_bits: add 16 random low bits to the fp32 bit pattern
  and truncate — bit-identical semantics to bf16_sr.py:108-122)

in a single pass over HBM (5 tensor reads -> 3 writes, no fp32
intermediates in memory).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANES = 1024
_BLOCK_ROWS = 256


def _adamw_kernel(
    scalars_ref,  # SMEM [7] fp32: lr, b1, b2, wd, eps, bc1, bc2
    seed_ref,  # SMEM [1] int32
    p_ref,
    g_ref,
    ea_ref,
    eas_ref,
    new_p_ref,
    new_ea_ref,
    new_eas_ref,
    *,
    bf16_sr: bool,
):
    lr = scalars_ref[0]
    b1 = scalars_ref[1]
    b2 = scalars_ref[2]
    wd = scalars_ref[3]
    eps = scalars_ref[4]
    bc1 = scalars_ref[5]
    bc2 = scalars_ref[6]

    g32 = g_ref[:].astype(jnp.float32)
    ea32 = ea_ref[:].astype(jnp.float32)
    eas32 = eas_ref[:].astype(jnp.float32)

    # lerp formulation (bf16_sr.py:97-99)
    ea32 = ea32 + (1.0 - b1) * (g32 - ea32)
    eas32 = eas32 + (1.0 - b2) * (g32 * g32 - eas32)
    new_ea_ref[:] = ea32.astype(new_ea_ref.dtype)
    new_eas_ref[:] = eas32.astype(new_eas_ref.dtype)

    denom = jnp.sqrt(eas32) / jnp.sqrt(bc2) + eps
    numer = ea32 / bc1
    p32 = p_ref[:].astype(jnp.float32)
    new_p = p32 - lr * wd * p32 - lr * numer / denom

    if bf16_sr:
        # per-block seed so blocks draw independent streams
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        rand = pltpu.bitcast(pltpu.prng_random_bits(new_p.shape), jnp.int32)
        bits = pltpu.bitcast(new_p, jnp.int32)
        bits = bits + (rand & 0xFFFF)
        bits = bits & jnp.int32(-65536)  # 0xFFFF0000 (bf16_sr.py:120-121)
        new_p = pltpu.bitcast(bits, jnp.float32)
    new_p_ref[:] = new_p.astype(new_p_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bf16_sr", "interpret"))
def fused_adamw_update(
    p: Array,
    g: Array,
    ea: Array,
    eas: Array,
    scalars: Array,  # [7] fp32: lr, b1, b2, wd, eps, bc1, bc2
    seed: Array,  # [1] int32
    *,
    bf16_sr: bool,
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """Returns (new_p [p.dtype], new_ea bf16, new_eas bf16)."""
    shape = p.shape
    n = p.size
    cols = min(_LANES, max(128, n))
    rows_total = -(-n // cols)
    pad = rows_total * cols - n

    def prep(x, dtype):
        x = x.reshape(-1).astype(dtype)
        if pad:
            x = jnp.pad(x, (0, pad))
        return x.reshape(rows_total, cols)

    br = min(_BLOCK_ROWS, rows_total)
    # pad rows to a block multiple
    rows = -(-rows_total // br) * br
    p2 = jnp.pad(prep(p, p.dtype), ((0, rows - rows_total), (0, 0)))
    g2 = jnp.pad(prep(g, g.dtype), ((0, rows - rows_total), (0, 0)))
    ea2 = jnp.pad(prep(ea, ea.dtype), ((0, rows - rows_total), (0, 0)))
    eas2 = jnp.pad(prep(eas, eas.dtype), ((0, rows - rows_total), (0, 0)))

    grid = (rows // br,)
    bspec = lambda dt: pl.BlockSpec((br, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_p, out_ea, out_eas = pl.pallas_call(
        functools.partial(_adamw_kernel, bf16_sr=bf16_sr),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            bspec(p.dtype),
            bspec(g.dtype),
            bspec(ea.dtype),
            bspec(eas.dtype),
        ],
        out_specs=(bspec(p.dtype), bspec(jnp.bfloat16), bspec(jnp.bfloat16)),
        out_shape=(
            jax.ShapeDtypeStruct((rows, cols), p.dtype),
            jax.ShapeDtypeStruct((rows, cols), jnp.bfloat16),
            jax.ShapeDtypeStruct((rows, cols), jnp.bfloat16),
        ),
        interpret=interpret,
    )(scalars, seed, p2, g2, ea2, eas2)

    unprep = lambda x: x.reshape(-1)[:n].reshape(shape)
    return unprep(out_p), unprep(out_ea), unprep(out_eas)
