"""Fused Pallas AdamW kernel vs the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_training_tpu import optim
from quantized_training_tpu.ops.pallas_optim import fused_adamw_update


def _scalars(lr=1e-2, b1=0.9, b2=0.999, wd=0.01, eps=1e-8, t=1):
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t
    return jnp.asarray([lr, b1, b2, wd, eps, bc1, bc2], jnp.float32)


class TestFusedAdamW:
    def test_fp32_matches_jnp_optimizer(self):
        k = jax.random.PRNGKey(0)
        p = jax.random.normal(k, (300,), jnp.float32)  # non-multiple size
        g = jax.random.normal(jax.random.fold_in(k, 1), (300,)) * 0.1
        ea = jnp.zeros((300,), jnp.bfloat16)
        eas = jnp.zeros((300,), jnp.bfloat16)
        np_, nea, neas = fused_adamw_update(
            p, g, ea, eas, _scalars(), jnp.zeros((1,), jnp.int32),
            bf16_sr=False, interpret=True,
        )
        ref_opt = optim.adamw_bf16_sr(backend="xla")
        state = ref_opt.init({"p": p})
        ref_p, ref_state = ref_opt.step({"p": g}, state, {"p": p}, 1e-2)
        np.testing.assert_allclose(np.asarray(np_), np.asarray(ref_p["p"]), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(nea, np.float32),
            np.asarray(ref_state.exp_avg["p"], np.float32),
        )
        np.testing.assert_allclose(
            np.asarray(neas, np.float32),
            np.asarray(ref_state.exp_avg_sq["p"], np.float32),
        )

    @pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="interpret-mode pltpu.prng_random_bits returns zeros on CPU",
    )
    def test_bf16_sr_statistics(self):
        from jax.experimental.pallas import tpu as pltpu

        n = 4096
        p = jnp.full((n,), 1.0, jnp.bfloat16)
        g = jnp.full((n,), 1.0, jnp.float32)
        # with wd=0 and zero states at t=1, update == lr exactly; pick lr
        # to land midway between the bf16 grid points 0.99609375 and 1.0
        scal = _scalars(lr=0.001953125, wd=0.0)
        interp = False  # real TPU run
        outs = []
        for s in range(5):
            np_, _, _ = fused_adamw_update(
                p, g, jnp.zeros((n,), jnp.bfloat16), jnp.zeros((n,), jnp.bfloat16),
                scal, jnp.asarray([s], jnp.int32), bf16_sr=True, interpret=interp,
            )
            outs.append(np.asarray(np_, np.float32))
        allv = np.concatenate(outs)
        vals = np.unique(allv)
        assert len(vals) == 2, vals  # straddles exactly two bf16 grid points
        frac_hi = (allv == vals[1]).mean()
        assert 0.45 < frac_hi < 0.55, frac_hi  # unbiased midpoint rounding

    @pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="interpret-mode pltpu.prng_random_bits returns zeros on CPU",
    )
    def test_bf16_sr_seed_determinism(self):
        from jax.experimental.pallas import tpu as pltpu

        n = 512
        p = jnp.full((n,), 1.0, jnp.bfloat16)
        g = jnp.full((n,), 1.0, jnp.float32)
        scal = _scalars(lr=0.001953125, wd=0.0)
        interp = False  # real TPU run
        z = jnp.zeros((n,), jnp.bfloat16)
        a1 = fused_adamw_update(p, g, z, z, scal, jnp.asarray([7], jnp.int32),
                                bf16_sr=True, interpret=interp)[0]
        a2 = fused_adamw_update(p, g, z, z, scal, jnp.asarray([7], jnp.int32),
                                bf16_sr=True, interpret=interp)[0]
        b = fused_adamw_update(p, g, z, z, scal, jnp.asarray([8], jnp.int32),
                               bf16_sr=True, interpret=interp)[0]
        np.testing.assert_array_equal(np.asarray(a1, np.float32), np.asarray(a2, np.float32))
        assert not np.array_equal(np.asarray(a1, np.float32), np.asarray(b, np.float32))

    def test_2d_param_shapes(self):
        p = jax.random.normal(jax.random.PRNGKey(2), (48, 96), jnp.float32)
        g = jnp.ones_like(p)
        z = jnp.zeros(p.shape, jnp.bfloat16)
        np_, nea, neas = fused_adamw_update(
            p, g, z, z, _scalars(), jnp.zeros((1,), jnp.int32),
            bf16_sr=False, interpret=True,
        )
        assert np_.shape == p.shape and nea.shape == p.shape
