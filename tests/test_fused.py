"""Producer-fused quantize kernels + custom_vjp linears (quant/fused.py).

Kernel oracles follow the test_pallas_quant.py convention: the in-kernel
multiply-by-reciprocal vs the oracle's divide may flip round-half-even by
1 LSB on rare elements, so int8 outputs match within <=1 with low
frequency and scales match tightly.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

from quantized_training_tpu import quant
from quantized_training_tpu.models import llama
from quantized_training_tpu.ops import pallas_fused as pf
from quantized_training_tpu.quant import fused
from quantized_training_tpu.quant.core import quantize_int8

EPS = 1e-5


def _mk(shape, seed, dtype=jnp.bfloat16):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32).astype(
        dtype
    )


def _q_close(q, q_ref, frac=0.02):
    d = np.abs(np.asarray(q, np.int32) - np.asarray(q_ref, np.int32))
    assert d.max() <= 1
    assert (d > 0).mean() < frac


@pytest.mark.parametrize("M,K", [(256, 256), (128, 640)])
def test_rmsnorm_quant_rowwise_oracle(M, K):
    x = _mk((M, K), 0)
    g = (1 + 0.1 * _mk((K,), 1, jnp.float32)).astype(jnp.bfloat16)
    y_ref = pf.rms_norm_f32(x, g, EPS)
    q_ref, s_ref = quantize_int8(y_ref, axis=1)
    q, s = pf.rmsnorm_quant_rowwise(
        x, g.reshape(1, -1), norm_eps=EPS, interpret=True
    )
    _q_close(q, q_ref)
    np.testing.assert_allclose(
        np.asarray(s).ravel(),
        np.asarray(s_ref, np.float32).ravel(),
        rtol=1e-2,
    )


def test_rmsnorm_quant_colwise_oracle():
    x = _mk((256, 384), 2)
    g = (1 + 0.1 * _mk((384,), 3, jnp.float32)).astype(jnp.bfloat16)
    y_ref = pf.rms_norm_f32(x, g, EPS)
    q_ref, s_ref = quantize_int8(y_ref, axis=0)
    q, s = pf.rmsnorm_quant_colwise(
        x, g.reshape(1, -1), norm_eps=EPS, interpret=True
    )
    _q_close(q, q_ref)
    np.testing.assert_allclose(
        np.asarray(s).ravel(),
        np.asarray(s_ref, np.float32).ravel(),
        rtol=1e-2,
    )


def test_silu_mul_quant_oracle():
    a, b = _mk((256, 512), 4), _mk((256, 512), 5)
    y_ref = pf.silu_mul_f32(a, b)
    for axis, fn in [
        (1, pf.silu_mul_quant_rowwise),
        (0, pf.silu_mul_quant_colwise),
    ]:
        q_ref, s_ref = quantize_int8(y_ref, axis=axis)
        q, s = fn(a, b, interpret=True)
        _q_close(q, q_ref)
        np.testing.assert_allclose(
            np.asarray(s).ravel(),
            np.asarray(s_ref, np.float32).ravel(),
            rtol=1e-2,
        )


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="in-kernel stochastic rounding uses the TPU PRNG "
    "(pltpu.prng_random_bits); run on a chip to exercise",
)
def test_sr_deterministic_and_bounded():
    x = _mk((128, 256), 6)
    g = jnp.ones((256,), jnp.bfloat16)
    seed = jnp.array([1234], jnp.int32)
    q1, s1 = pf.rmsnorm_quant_rowwise(
        x, g.reshape(1, -1), seed, norm_eps=EPS, sr=True
    )
    q2, _ = pf.rmsnorm_quant_rowwise(
        x, g.reshape(1, -1), seed, norm_eps=EPS, sr=True
    )
    assert bool(jnp.all(q1 == q2)), "same seed must reproduce"
    # SR result is within 1 step of the deterministic rounding
    q_det, _ = pf.rmsnorm_quant_rowwise(
        x, g.reshape(1, -1), norm_eps=EPS
    )
    assert np.abs(
        np.asarray(q1, np.int32) - np.asarray(q_det, np.int32)
    ).max() <= 1


def _mp_weights(shapes, seeds, **cfg_kwargs):
    cfg = quant.MixedPrecisionConfig(**cfg_kwargs)
    return [
        quant.MixedPrecisionWeight(_mk(s, sd), cfg)
        for s, sd in zip(shapes, seeds)
    ]


def _grads(fn, *args):
    out, grads = jax.value_and_grad(fn, argnums=tuple(range(len(args))))(*args)
    return out, grads


@pytest.mark.slow
def test_norm_linear_multi_matches_unfused():
    """Fused custom_vjp (interpret kernels) == unfused composite: outputs
    and every gradient, within quantization-LSB tolerance."""
    x = _mk((4, 64, 256), 7)
    gamma = (1 + 0.1 * _mk((256,), 8, jnp.float32)).astype(jnp.bfloat16)
    ws = _mp_weights([(256, 256)] * 3, [9, 10, 11])
    key = jax.random.PRNGKey(42)

    def run(x, gamma, *wdata):
        weights = [
            quant.MixedPrecisionWeight(d, ws[0].config) for d in wdata
        ]
        outs = quant.norm_linear_multi(x, gamma, weights, EPS, key=key)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    wdata = [w.data for w in ws]
    fused.set_impl("interpret")
    try:
        loss_f, grads_f = _grads(run, x, gamma, *wdata)
    finally:
        fused.set_impl("off")
    try:
        loss_u, grads_u = _grads(run, x, gamma, *wdata)
    finally:
        fused.set_impl("auto")

    np.testing.assert_allclose(float(loss_f), float(loss_u), rtol=2e-2)
    for gf, gu in zip(grads_f, grads_u):
        gf, gu = np.asarray(gf, np.float32), np.asarray(gu, np.float32)
        denom = np.abs(gu).max() + 1e-6
        assert np.abs(gf - gu).max() / denom < 6e-2, (
            np.abs(gf - gu).max(),
            denom,
        )


def test_silu_mul_linear_matches_unfused():
    gate = _mk((4, 64, 256), 12)
    up = _mk((4, 64, 256), 13)
    (w,) = _mp_weights([(128, 256)], [14])
    key = jax.random.PRNGKey(43)

    def run(gate, up, wdata):
        wq = quant.MixedPrecisionWeight(wdata, w.config)
        out = quant.silu_mul_linear(gate, up, wq, key=key)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    fused.set_impl("interpret")
    try:
        loss_f, grads_f = _grads(run, gate, up, w.data)
    finally:
        fused.set_impl("off")
    try:
        loss_u, grads_u = _grads(run, gate, up, w.data)
    finally:
        fused.set_impl("auto")

    np.testing.assert_allclose(float(loss_f), float(loss_u), rtol=2e-2)
    for gf, gu in zip(grads_f, grads_u):
        gf, gu = np.asarray(gf, np.float32), np.asarray(gu, np.float32)
        denom = np.abs(gu).max() + 1e-6
        assert np.abs(gf - gu).max() / denom < 6e-2


def test_fallbacks_cover_other_schemes():
    """bf16 (plain arrays) and non-all-int8 configs route to the exact
    unfused composite."""
    x = _mk((2, 16, 256), 15)
    gamma = jnp.ones((256,), jnp.bfloat16)
    w_plain = [_mk((256, 256), 16)]
    outs = quant.norm_linear_multi(x, gamma, w_plain, EPS)
    ref = pf.rms_norm_ref(x, gamma, EPS) @ w_plain[0].T
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(ref))

    ws = _mp_weights([(256, 256)], [17], grad_weight=False)
    outs_q = quant.norm_linear_multi(x, gamma, ws, EPS)
    assert outs_q[0].shape == (2, 16, 256)

    out_s = quant.silu_mul_linear(x, x, w_plain[0])
    ref_s = pf.silu_mul_ref(x, x) @ w_plain[0].T
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(ref_s))


def test_train_step_fused_vs_unfused():
    """Tiny llama train step: loss trajectory with fused producers
    (interpret) tracks the unfused path."""
    from quantized_training_tpu import optim
    from quantized_training_tpu.train import init_train_state, make_train_step

    cfg = llama.LlamaConfig(
        vocab_size=512,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )
    tok = jax.random.randint(jax.random.PRNGKey(0), (2, 64), 0, 512, jnp.int32)
    lab = jnp.roll(tok, -1, axis=-1)

    def losses(impl):
        fused.set_impl(impl)
        try:
            params = llama.init_params(jax.random.PRNGKey(1), cfg)
            qp = quant.quantize_params(params, "mixed_precision")
            opt = optim.adamw_bf16_sr(bf16_stochastic_rounding=False)
            state = init_train_state(qp, opt)
            step = make_train_step(cfg, opt, donate=False)
            out = []
            for i in range(3):
                state, m = step(
                    state, tok, lab, 1e-3, jax.random.PRNGKey(i)
                )
                out.append(float(m["loss"]))
            return out
        finally:
            fused.set_impl("auto")

    lf = losses("interpret")
    lu = losses("off")
    np.testing.assert_allclose(lf, lu, rtol=2e-2)


def test_layernorm_gelu_quant_oracles():
    x = _mk((256, 384), 20)
    g = (1 + 0.1 * _mk((384,), 21, jnp.float32)).astype(jnp.bfloat16)
    b = (0.05 * _mk((384,), 22, jnp.float32)).astype(jnp.bfloat16)
    LNEPS = 1e-6
    y_ref = pf.layer_norm_f32(x, g, b, LNEPS)
    for axis in (1, 0):
        q_ref, s_ref = quantize_int8(y_ref, axis=axis)
        q, s = pf.layernorm_quant(
            x, g.reshape(1, -1), b.reshape(1, -1), axis=axis,
            norm_eps=LNEPS, interpret=True,
        )
        _q_close(q, q_ref)
        np.testing.assert_allclose(
            np.asarray(s).ravel(),
            np.asarray(s_ref, np.float32).ravel(),
            rtol=1e-2,
        )

    a = _mk((256, 384), 23)
    y_ref = pf.gelu_f32(a)
    for axis in (1, 0):
        q_ref, s_ref = quantize_int8(y_ref, axis=axis)
        q, s = pf.gelu_quant(a, axis=axis, interpret=True)
        _q_close(q, q_ref)


def test_layernorm_gelu_linear_match_unfused():
    x = _mk((2, 128, 256), 24)
    g = (1 + 0.1 * _mk((256,), 25, jnp.float32)).astype(jnp.bfloat16)
    b = (0.05 * _mk((256,), 26, jnp.float32)).astype(jnp.bfloat16)
    (w,) = _mp_weights([(256, 256)], [27])
    bias = (0.01 * _mk((256,), 28, jnp.float32)).astype(jnp.bfloat16)
    key = jax.random.PRNGKey(44)
    LNEPS = 1e-6

    def run_ln(x, g, b, wdata, bias):
        wq = quant.MixedPrecisionWeight(wdata, w.config)
        out = quant.layernorm_linear(x, g, b, wq, LNEPS, bias=bias, key=key)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def run_gelu(x, wdata, bias):
        wq = quant.MixedPrecisionWeight(wdata, w.config)
        out = quant.gelu_linear(x, wq, bias=bias, key=key)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    for fn, args in [(run_ln, (x, g, b, w.data, bias)),
                     (run_gelu, (x, w.data, bias))]:
        fused.set_impl("interpret")
        try:
            loss_f, grads_f = _grads(fn, *args)
        finally:
            fused.set_impl("off")
        try:
            loss_u, grads_u = _grads(fn, *args)
        finally:
            fused.set_impl("auto")
        np.testing.assert_allclose(float(loss_f), float(loss_u), rtol=2e-2)
        for gf, gu in zip(grads_f, grads_u):
            gf, gu = np.asarray(gf, np.float32), np.asarray(gu, np.float32)
            denom = np.abs(gu).max() + 1e-6
            assert np.abs(gf - gu).max() / denom < 6e-2


def test_vit_train_step_fused_vs_unfused():
    """ViT training: fused layernorm/gelu producers (interpret) track the
    unfused path."""
    from quantized_training_tpu import optim
    from quantized_training_tpu.models import vit
    from quantized_training_tpu.train import init_train_state

    cfg = vit.ViTConfig(
        image_size=32, patch_size=8, hidden_size=128, num_layers=2,
        num_heads=2, num_classes=10,
    )
    imgs = jax.random.normal(
        jax.random.PRNGKey(0), (8, 32, 32, 3), jnp.float32
    ).astype(jnp.bfloat16)
    labels = jax.random.randint(jax.random.PRNGKey(1), (8,), 0, 10, jnp.int32)

    def losses(impl):
        fused.set_impl(impl)
        try:
            params = vit.init_params(jax.random.PRNGKey(2), cfg)
            qp = quant.quantize_params(params, "mixed_precision")
            opt = optim.adamw_bf16_sr(bf16_stochastic_rounding=False)
            state = init_train_state(qp, opt)
            import functools as ft

            @jax.jit
            def step(state, key):
                def loss(p):
                    virt = quant.virtual_params(p)
                    merged = quant.merge_masters(virt, p)
                    return vit.loss_fn(merged, imgs, labels, cfg, key=key)

                l, grads = jax.value_and_grad(loss)(state.params)
                return l

            out = [float(step(state, jax.random.PRNGKey(i))) for i in range(2)]
            return out
        finally:
            fused.set_impl("auto")

    lf = losses("interpret")
    lu = losses("off")
    np.testing.assert_allclose(lf, lu, rtol=3e-2)


def test_col_amax_forwarding_exact():
    """The forward rowwise kernels' col_amax output must equal the 2-pass
    amax, and the scale-supplied colwise pass must reproduce the 2-pass
    colwise quantize bit-exactly (the backward relies on this)."""
    # silu site
    a, b = _mk((256, 512), 14), _mk((256, 512), 15)
    q_r, s_r, amax = pf.silu_mul_quant_rowwise(
        a, b, interpret=True, with_col_amax=True
    )
    q2, s2 = pf.silu_mul_quant_colwise(a, b, interpret=True)
    q1, s1 = pf.silu_mul_quant_colwise(
        a, b, interpret=True, scale=amax * (1.0 / 127.0)
    )
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    # rowwise outputs unchanged by the extra amax output
    q_r0, s_r0 = pf.silu_mul_quant_rowwise(a, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(q_r), np.asarray(q_r0))

    # norm site
    x = _mk((256, 384), 16)
    g = (1 + 0.1 * _mk((384,), 17, jnp.float32)).astype(jnp.bfloat16)
    _, _, amax_n = pf.rmsnorm_quant_rowwise(
        x, g.reshape(1, -1), norm_eps=EPS, interpret=True, with_col_amax=True
    )
    qn2, sn2 = pf.rmsnorm_quant_colwise(
        x, g.reshape(1, -1), norm_eps=EPS, interpret=True
    )
    qn1, sn1 = pf.rmsnorm_quant_colwise(
        x, g.reshape(1, -1), norm_eps=EPS, interpret=True,
        scale=amax_n * (1.0 / 127.0),
    )
    np.testing.assert_array_equal(np.asarray(qn1), np.asarray(qn2))
    np.testing.assert_array_equal(np.asarray(sn1), np.asarray(sn2))


def test_rmsnorm_bwd_kernel_oracle():
    from quantized_training_tpu.quant.fused import _rmsnorm_bwd_math

    x = _mk((256, 384), 20)
    g = (1 + 0.1 * _mk((384,), 21, jnp.float32)).astype(jnp.bfloat16)
    dy = _mk((256, 384), 22)
    dx_ref, dg_ref = _rmsnorm_bwd_math(x, g, dy, EPS)
    dx, dg = pf.rmsnorm_bwd(x, g.reshape(1, -1), dy, norm_eps=EPS,
                            interpret=True)
    np.testing.assert_allclose(
        np.asarray(dx, np.float32), np.asarray(dx_ref, np.float32),
        rtol=0, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(dg.reshape(-1), np.float32),
        np.asarray(dg_ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_attn_out_linear_matches_unfused():
    """Fused ungroup->quantize o-proj == ungroup + unfused qlinear:
    output and gradients (to the grouped input and the weight)."""
    B, KV, G, S, hd = 2, 2, 4, 128, 64
    H = KV * G
    out_g = _mk((B, KV, G, S, hd), 20)
    (w,) = _mp_weights([(256, H * hd)], [21])
    key = jax.random.PRNGKey(7)

    def run(out_g, wdata):
        ww = quant.MixedPrecisionWeight(wdata, w.config)
        o = quant.attn_out_linear(out_g, ww, KV, key=key)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    fused.set_impl("interpret")
    try:
        loss_f, grads_f = _grads(run, out_g, w.data)
    finally:
        fused.set_impl("off")
    try:
        loss_u, grads_u = _grads(run, out_g, w.data)
    finally:
        fused.set_impl("auto")

    np.testing.assert_allclose(float(loss_f), float(loss_u), rtol=2e-2)
    for gf, gu in zip(grads_f, grads_u):
        gf, gu = np.asarray(gf, np.float32), np.asarray(gu, np.float32)
        denom = np.abs(gu).max() + 1e-6
        assert np.abs(gf - gu).max() / denom < 6e-2


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="in-kernel stochastic rounding uses the TPU PRNG "
    "(pltpu.prng_random_bits); run on a chip to exercise",
)
def test_attn_out_linear_sr_paths():
    """SR config exercises the in-kernel PRNG seeds of the fused
    ungroup-quantize (deterministic per key, finite grads)."""
    B, KV, G, S, hd = 2, 2, 4, 128, 64
    out_g = _mk((B, KV, G, S, hd), 22)
    (w,) = _mp_weights([(256, KV * G * hd)], [23], stochastic_rounding=True)
    key = jax.random.PRNGKey(11)

    fused.set_impl("interpret")
    try:
        o1 = quant.attn_out_linear(out_g, w, KV, key=key)
        o2 = quant.attn_out_linear(out_g, w, KV, key=key)
        assert bool(jnp.all(o1 == o2))
        g = jax.grad(
            lambda og: jnp.sum(
                quant.attn_out_linear(og, w, KV, key=key).astype(jnp.float32)
                ** 2
            )
        )(out_g)
        assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))
    finally:
        fused.set_impl("auto")


def test_silu_bwd_quant_kernels_match_oracle():
    from quantized_training_tpu.quant.core import quantize_int8

    a = _mk((128, 256), 30)
    b = _mk((128, 256), 31)
    dy = _mk((128, 256), 32)
    da_ref, db_ref = pf.silu_mul_bwd_f32(a, b, dy)
    da_q, da_s, db_q, db_s, da_am, db_am = pf.silu_mul_bwd_quant_rowwise(
        a, b, dy, interpret=True
    )
    for v_ref, q, s, am in ((da_ref, da_q, da_s, da_am), (db_ref, db_q, db_s, db_am)):
        qr, sr_ = quantize_int8(v_ref, axis=1)
        assert np.abs(
            np.asarray(q, np.int32) - np.asarray(qr, np.int32)
        ).max() <= 1  # fp32-producer 1-LSB policy
        np.testing.assert_allclose(
            np.asarray(s).ravel(), np.asarray(sr_, np.float32).ravel(), rtol=1e-2
        )
        np.testing.assert_allclose(
            np.asarray(am).ravel(),
            np.abs(np.asarray(v_ref, np.float32)).max(0),
            rtol=1e-2,
        )
    da_qc, db_qc = pf.silu_mul_bwd_quant_colwise(
        a, b, dy, da_am * (1 / 127.0), db_am * (1 / 127.0), interpret=True
    )
    for v_ref, qc in ((da_ref, da_qc), (db_ref, db_qc)):
        qr, _ = quantize_int8(v_ref, axis=0)
        assert np.abs(
            np.asarray(qc, np.int32) - np.asarray(qr, np.int32)
        ).max() <= 1


def test_mlp_linear_matches_unfused():
    """One-op fused MLP (interpret kernels) == the norm_linear_multi +
    silu_mul_linear composite: output and all gradients."""
    x = _mk((4, 64, 256), 40)
    gamma = (1 + 0.1 * _mk((256,), 41, jnp.float32)).astype(jnp.bfloat16)
    wg, wu = _mp_weights([(384, 256)] * 2, [42, 43])
    (wd,) = _mp_weights([(256, 384)], [44])
    key = jax.random.PRNGKey(5)

    def run(x, gamma, g_d, u_d, d_d):
        ws = [
            quant.MixedPrecisionWeight(d, wg.config) for d in (g_d, u_d, d_d)
        ]
        out = quant.mlp_linear(x, gamma, ws[0], ws[1], ws[2], EPS, key=key)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    fused.set_impl("interpret")
    try:
        loss_f, grads_f = _grads(run, x, gamma, wg.data, wu.data, wd.data)
    finally:
        fused.set_impl("off")
    try:
        loss_u, grads_u = _grads(run, x, gamma, wg.data, wu.data, wd.data)
    finally:
        fused.set_impl("auto")

    np.testing.assert_allclose(float(loss_f), float(loss_u), rtol=2e-2)
    for gf, gu in zip(grads_f, grads_u):
        gf, gu = np.asarray(gf, np.float32), np.asarray(gu, np.float32)
        denom = np.abs(gu).max() + 1e-6
        assert np.abs(gf - gu).max() / denom < 6e-2, np.abs(gf - gu).max() / denom


@pytest.mark.parametrize("gi,gw", [(True, False)], ids=["gi_only"])
def test_mlp_linear_partial_configs_match_unfused(gi, gw):
    """VERDICT r4 item 3: the fused producers cover fwd+grad_input
    configs (BF16 wgrads branch), not just all-INT8 — fused (interpret)
    must match the unfused composite. (fwd-only configs intentionally
    take the unfused path — see _fusable_cfg's measured A/B — so there
    is no fused fwd-only branch to test.)"""
    x = _mk((4, 64, 256), 50)
    gamma = (1 + 0.1 * _mk((256,), 51, jnp.float32)).astype(jnp.bfloat16)
    wg, wu = _mp_weights([(384, 256)] * 2, [52, 53],
                         grad_input=gi, grad_weight=gw)
    (wd,) = _mp_weights([(256, 384)], [54], grad_input=gi, grad_weight=gw)
    key = jax.random.PRNGKey(6)

    def run(x, gamma, g_d, u_d, d_d):
        ws = [
            quant.MixedPrecisionWeight(d, wg.config) for d in (g_d, u_d, d_d)
        ]
        out = quant.mlp_linear(x, gamma, ws[0], ws[1], ws[2], EPS, key=key)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    fused.set_impl("interpret")
    try:
        loss_f, grads_f = _grads(run, x, gamma, wg.data, wu.data, wd.data)
    finally:
        fused.set_impl("off")
    try:
        loss_u, grads_u = _grads(run, x, gamma, wg.data, wu.data, wd.data)
    finally:
        fused.set_impl("auto")

    np.testing.assert_allclose(float(loss_f), float(loss_u), rtol=2e-2)
    for gf, gu in zip(grads_f, grads_u):
        gf, gu = np.asarray(gf, np.float32), np.asarray(gu, np.float32)
        denom = np.abs(gu).max() + 1e-6
        assert np.abs(gf - gu).max() / denom < 6e-2, (
            np.abs(gf - gu).max() / denom
        )


@pytest.mark.parametrize("gi,gw", [(True, False)], ids=["gi_only"])
def test_norm_and_attn_out_partial_configs_match_unfused(gi, gw):
    x = _mk((4, 64, 256), 60)
    gamma = (1 + 0.1 * _mk((256,), 61, jnp.float32)).astype(jnp.bfloat16)
    ws = _mp_weights([(256, 256)] * 2, [62, 63],
                     grad_input=gi, grad_weight=gw)
    key = jax.random.PRNGKey(7)

    def run_norm(x, gamma, *wdata):
        weights = [
            quant.MixedPrecisionWeight(d, ws[0].config) for d in wdata
        ]
        outs = quant.norm_linear_multi(x, gamma, weights, EPS, key=key)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    fused.set_impl("interpret")
    try:
        loss_f, grads_f = _grads(run_norm, x, gamma, *[w.data for w in ws])
    finally:
        fused.set_impl("off")
    try:
        loss_u, grads_u = _grads(run_norm, x, gamma, *[w.data for w in ws])
    finally:
        fused.set_impl("auto")
    np.testing.assert_allclose(float(loss_f), float(loss_u), rtol=2e-2)
    for gf, gu in zip(grads_f, grads_u):
        gf, gu = np.asarray(gf, np.float32), np.asarray(gu, np.float32)
        denom = np.abs(gu).max() + 1e-6
        assert np.abs(gf - gu).max() / denom < 6e-2

    # attn_out_linear: grouped [B,KV,G,S,hd] -> o-proj
    B, KV, G, S, hd = 2, 2, 2, 64, 64
    y = _mk((B, KV, G, S, hd), 64)
    (w,) = _mp_weights([(256, KV * G * hd)], [65],
                       grad_input=gi, grad_weight=gw)

    def run_attn(y, wdata):
        wq = quant.MixedPrecisionWeight(wdata, w.config)
        out = quant.attn_out_linear(y, wq, KV, key=key)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    fused.set_impl("interpret")
    try:
        loss_f, grads_f = _grads(run_attn, y, w.data)
    finally:
        fused.set_impl("off")
    try:
        loss_u, grads_u = _grads(run_attn, y, w.data)
    finally:
        fused.set_impl("auto")
    np.testing.assert_allclose(float(loss_f), float(loss_u), rtol=2e-2)
    for gf, gu in zip(grads_f, grads_u):
        gf, gu = np.asarray(gf, np.float32), np.asarray(gu, np.float32)
        denom = np.abs(gu).max() + 1e-6
        assert np.abs(gf - gu).max() / denom < 6e-2


def test_silu_bwd_rowwise_bf16_variant():
    """with_bf16=True returns the bf16 (da, db) pair alongside the
    rowwise int8; with_amax=False drops the col amaxes."""
    gate, up, dy = _mk((128, 256), 70), _mk((128, 256), 71), _mk((128, 256), 72)
    da_q, da_s, db_q, db_s, da_bf, db_bf = pf.silu_mul_bwd_quant_rowwise(
        gate, up, dy, interpret=True, with_amax=False, with_bf16=True
    )
    da_ref, db_ref = pf.silu_mul_bwd_f32(gate, up, dy)
    np.testing.assert_allclose(
        np.asarray(da_bf, np.float32), np.asarray(da_ref.astype(jnp.bfloat16),
                                                  np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(db_bf, np.float32), np.asarray(db_ref.astype(jnp.bfloat16),
                                                  np.float32)
    )
    q_ref, s_ref = quantize_int8(da_ref.astype(jnp.float32), axis=1)
    _q_close(da_q, q_ref)
    # the 6-output all-int8 variant still returns amaxes
    out = pf.silu_mul_bwd_quant_rowwise(gate, up, dy, interpret=True)
    assert len(out) == 6 and out[4].shape == (1, 256)


def test_fused_with_prequantized_weights_matches_dynamic():
    """PreQuantMPWeight rides the fused producer custom_vjps (round 5:
    the per-step weight views and the producer fusion save DISJOINT HBM
    passes, so they compose); outputs and grads must match the dynamic
    MixedPrecisionWeight fused path exactly (same absmax quantize of the
    same weights, hoisted)."""
    from quantized_training_tpu.quant.mixed_precision import (
        PreQuantMPWeight,
        prequantize_weight,
    )

    x = _mk((4, 64, 256), 80)
    gamma = (1 + 0.1 * _mk((256,), 81, jnp.float32)).astype(jnp.bfloat16)
    wg, wu = _mp_weights([(384, 256)] * 2, [82, 83])
    (wd,) = _mp_weights([(256, 384)], [84])
    key = jax.random.PRNGKey(9)

    def run(x, gamma, g_d, u_d, d_d, preq):
        ws = [quant.MixedPrecisionWeight(d, wg.config) for d in (g_d, u_d, d_d)]
        if preq:
            ws = [prequantize_weight(w) for w in ws]
            assert all(isinstance(w, PreQuantMPWeight) for w in ws)
        out = quant.mlp_linear(x, gamma, ws[0], ws[1], ws[2], EPS, key=key)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    fused.set_impl("interpret")
    try:
        loss_d, grads_d = _grads(
            lambda *a: run(*a, preq=False), x, gamma, wg.data, wu.data, wd.data
        )
        loss_p, grads_p = _grads(
            lambda *a: run(*a, preq=True), x, gamma, wg.data, wu.data, wd.data
        )
    finally:
        fused.set_impl("auto")

    np.testing.assert_allclose(float(loss_p), float(loss_d), rtol=1e-6)
    for gp, gd in zip(grads_p, grads_d):
        np.testing.assert_allclose(
            np.asarray(gp, np.float32), np.asarray(gd, np.float32),
            rtol=1e-6, atol=1e-6,
        )

    # attn_out path with prequant weight
    B, KV, G, S, hd = 2, 2, 2, 64, 64
    y = _mk((B, KV, G, S, hd), 85)
    (w,) = _mp_weights([(256, KV * G * hd)], [86])

    def run_attn(y, wdata, preq):
        wq = quant.MixedPrecisionWeight(wdata, w.config)
        if preq:
            wq = prequantize_weight(wq)
        out = quant.attn_out_linear(y, wq, KV, key=key)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    fused.set_impl("interpret")
    try:
        l_d, g_d = _grads(lambda *a: run_attn(*a, preq=False), y, w.data)
        l_p, g_p = _grads(lambda *a: run_attn(*a, preq=True), y, w.data)
    finally:
        fused.set_impl("auto")
    np.testing.assert_allclose(float(l_p), float(l_d), rtol=1e-6)
    for gp, gd in zip(g_p, g_d):
        np.testing.assert_allclose(
            np.asarray(gp, np.float32), np.asarray(gd, np.float32),
            rtol=1e-6, atol=1e-6,
        )
