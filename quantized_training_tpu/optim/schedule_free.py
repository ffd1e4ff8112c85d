"""Schedule-free AdamW (z/weight interpolation, no LR decay schedule).

Behavioral parity with other_optim/schedule_free_adamw.py:9-149 (itself the
facebookresearch/schedule_free reference implementation):
  - state per param: z (replaces momentum), exp_avg_sq, plus scalars
    step / lr_max / weight_sum
  - warmup folded into the effective lr; ``lr = lr * sched * sqrt(bc2)``
  - train/eval mode flips interpolate params toward/away from z
    (schedule_free_adamw.py:37-57): the stored params are the TRAIN-mode
    ones; :func:`eval_params` produces the evaluation weights functionally.

The 8-bit state variant (AdamWScheduleFree8bit, :106-111) stores
``exp_avg_sq`` block-wise quantized to uint8 — see optim/state8bit.py.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .adamw import Optimizer
from .state8bit import OptimState8bit

Array = jax.Array


class ScheduleFreeState(NamedTuple):
    count: Array
    lr_max: Array
    weight_sum: Array
    z: Any
    exp_avg_sq: Any


def schedule_free_adamw(
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    warmup_steps: int = 0,
    r: float = 0.0,
    weight_lr_power: float = 2.0,
    state_8bit: bool = False,
) -> Optimizer:
    b1, b2 = betas

    def _zeros_eas(p):
        if state_8bit and p.size >= 4096 and p.size % 256 == 0:
            # AdamWScheduleFree8bit threshold (schedule_free_adamw.py:106-111)
            return OptimState8bit.zeros(p.shape, signed=False)
        return jnp.zeros(p.shape, jnp.float32)

    def init(params):
        return ScheduleFreeState(
            count=jnp.zeros((), jnp.int32),
            lr_max=jnp.full((), -1.0, jnp.float32),
            weight_sum=jnp.zeros((), jnp.float32),
            z=jax.tree.map(lambda p: p.astype(jnp.float32), params),
            exp_avg_sq=jax.tree.map(
                _zeros_eas, params, is_leaf=lambda x: isinstance(x, OptimState8bit)
            ),
        )

    def step(grads, state: ScheduleFreeState, params, lr, key=None):
        del key
        count = state.count + 1
        t = count.astype(jnp.float32)
        # schedule_free_adamw.py:131-140
        sched = jnp.clip(t / warmup_steps, max=1.0) if warmup_steps > 0 else 1.0
        bc2 = 1.0 - b2**t
        eff_lr = jnp.asarray(lr, jnp.float32) * sched * jnp.sqrt(bc2)
        lr_max = jnp.maximum(state.lr_max, eff_lr)
        weight = (t**r) * (lr_max**weight_lr_power)
        weight_sum = state.weight_sum + weight
        # weight_sum == 0 (lr 0 so far, e.g. warmup step 0): ckp1 = 0, not
        # 0/0 = NaN (schedule_free_adamw.py:142-145 catches
        # ZeroDivisionError for exactly this)
        ckp1 = jnp.where(weight_sum > 0.0, weight / weight_sum, 0.0)

        is8 = lambda x: isinstance(x, OptimState8bit)

        def upd(g, p, z, eas):
            g32 = g.astype(jnp.float32)
            eas32 = eas.dequantize() if is8(eas) else eas
            eas32 = eas32 + (1 - b2) * (jnp.square(g32) - eas32)
            denom = jnp.sqrt(eas32) + eps
            p32 = p.astype(jnp.float32)
            grad_normalized = weight_decay * p32 + g32 / denom
            # p.lerp(z, ckp1) + gn * lr * (b1*(1-ckp1) - 1)
            new_p = (
                p32
                + ckp1 * (z - p32)
                + grad_normalized * eff_lr * (b1 * (1.0 - ckp1) - 1.0)
            )
            new_z = z - eff_lr * grad_normalized
            new_eas = eas.requantize(eas32) if is8(eas) else eas32
            return new_p.astype(p.dtype), new_z, new_eas

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_p = treedef.flatten_up_to(params)
        flat_z = treedef.flatten_up_to(state.z)
        flat_eas = treedef.flatten_up_to(state.exp_avg_sq)
        out = [upd(*args) for args in zip(flat_g, flat_p, flat_z, flat_eas)]
        unzip = lambda j: jax.tree_util.tree_unflatten(treedef, [o[j] for o in out])
        return unzip(0), ScheduleFreeState(
            count, lr_max, weight_sum, unzip(1), unzip(2)
        )

    return Optimizer(init, step)


def eval_params(params, state: ScheduleFreeState, beta1: float = 0.9):
    """TRAIN-mode params -> EVAL-mode params (the .eval() flip,
    schedule_free_adamw.py:37-46): p_eval = lerp(p, z, 1 - 1/beta1)."""
    c = 1.0 - 1.0 / beta1

    def flip(p, z):
        p32 = p.astype(jnp.float32)
        return (p32 + c * (z - p32)).astype(p.dtype)

    return jax.tree.map(flip, params, state.z)


def train_params(params_eval, state: ScheduleFreeState, beta1: float = 0.9):
    """EVAL-mode params -> TRAIN-mode params (schedule_free_adamw.py:48-57)."""
    c = 1.0 - beta1

    def flip(p, z):
        p32 = p.astype(jnp.float32)
        return (p32 + c * (z - p32)).astype(p.dtype)

    return jax.tree.map(flip, params_eval, state.z)
