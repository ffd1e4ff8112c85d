"""Env-knob matrix smoke (VERDICT r4 weak #6).

The measured-worse-but-kept A/B knobs (QT_PREQUANT, QT_SAVE_POSTATTN) and
the path toggles (QT_FUSED, QT_FUSED_ROPE) are each individually tested
elsewhere; this sweeps COMBINATIONS — including ones no benchmark ever
ran (prequant + unfused, prequant + fused-interpret + saved post-attn) —
through a tiny mixed-precision train step and checks the loss stays
finite and close to the default path, so stale flag interactions can't
rot silently.

All knobs are read at trace time; each case builds a fresh step function.
"""

import os
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

from quantized_training_tpu import optim, quant
from quantized_training_tpu.models import llama
from quantized_training_tpu.quant import fused
from quantized_training_tpu.train import init_train_state, make_train_step

TINY = llama.LlamaConfig(
    vocab_size=512,
    hidden_size=128,
    intermediate_size=256,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_key_value_heads=2,
    max_position_embeddings=64,
)

KNOBS = ("QT_PREQUANT", "QT_SAVE_POSTATTN", "QT_FUSED", "QT_FUSED_ROPE")

# representative matrix: every knob off its default at least once against
# every other knob's non-default, without the full 2^4 blowup
CASES = [
    {},  # default path (the reference trajectory)
    {"QT_PREQUANT": "both"},
    {"QT_PREQUANT": "row", "QT_FUSED": "0"},
    {"QT_PREQUANT": "col", "QT_SAVE_POSTATTN": "1"},
    {"QT_SAVE_POSTATTN": "1", "QT_FUSED": "0"},
    {"QT_FUSED": "0", "QT_FUSED_ROPE": "force"},
    {"QT_PREQUANT": "both", "QT_FUSED_ROPE": "force",
     "QT_SAVE_POSTATTN": "1"},
]


def _losses(env):
    old = {k: os.environ.get(k) for k in KNOBS}
    os.environ.update(env)
    # the fused producers only engage on TPU unless interpret mode is on;
    # force interpret so QT_FUSED interactions are actually exercised
    fused.set_impl("off" if env.get("QT_FUSED") == "0" else "interpret")
    try:
        params = llama.init_params(jax.random.PRNGKey(1), TINY)
        qp = quant.quantize_params(params, "mixed_precision")
        opt = optim.adamw_bf16_sr(bf16_stochastic_rounding=False)
        state = init_train_state(qp, opt)
        step = make_train_step(TINY, opt, donate=False)
        tok = jax.random.randint(
            jax.random.PRNGKey(0), (2, 64), 0, 512, jnp.int32
        )
        lab = jnp.roll(tok, -1, axis=-1)
        out = []
        for i in range(3):
            state, m = step(state, tok, lab, 1e-3, jax.random.PRNGKey(i))
            out.append(float(m["loss"]))
        return out
    finally:
        fused.set_impl("auto")
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


@pytest.fixture(scope="module")
def default_losses():
    return _losses({})


@pytest.mark.parametrize("env", CASES[1:], ids=lambda e: "+".join(
    f"{k.replace('QT_', '')}={v}" for k, v in e.items()))
def test_knob_matrix_tracks_default(default_losses, env):
    got = _losses(env)
    assert all(np.isfinite(got)), (env, got)
    # same quantization numerics modulo path differences (prequant hoists
    # the same absmax quantize; fused kernels are 1-LSB policies)
    np.testing.assert_allclose(got, default_losses, rtol=2e-2)
