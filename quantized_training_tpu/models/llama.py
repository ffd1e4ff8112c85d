"""Pure-JAX Llama for quantized pretraining/finetuning.

TPU-first re-design of the reference's model path (the reference uses HF
``LlamaForCausalLM``, llm_pretrain.py:100-120): a functional param-pytree
model whose decoder stack runs under ``lax.scan`` (one compiled layer body,
stacked [L, ...] weights — this is also what makes per-layer FSDP sharding
and quantized-wrapper stacking free).

Parity details kept from the reference training setup:
  - RoPE tables in fp32, rotation in the model dtype
    (llm_pretrain.py:115-119 keeps ``rotary_emb.inv_freq`` fp32; HF
    LlamaRotaryEmbedding applies cos/sin in the activation dtype)
  - RMSNorm computes in fp32, scales in the weight dtype (HF LlamaRMSNorm)
  - fp32 softmax in attention; logits cast to fp32 for the loss
    (llm_pretrain.py:30-35)
  - ``bitnet=True`` reproduces the RMSNorm-into-linear surgery of
    train_utils.py:47-71: q/k/v and gate/up consume the existing pre-norms
    and NEW norms are inserted before o_proj and down_proj
  - config loadable from the mini_llamas HF-format config.json
    (mini_llamas/Llama-2-470m/config.json)

Every linear weight leaf lives under a dict key ``"w"`` with shape
[out, in] (stacked: [L, out, in]) so ``quant.quantize_params`` wraps them.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, replace
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp

from ..quant import (
    mlp_linear,
    norm_linear_multi,
    prequantize_step,
    qlinear,
    qlinear_multi,
    silu_mul_linear,
)

Array = jax.Array

# checkpoint_name tag on the splash-attention (out, logsumexp) residuals;
# `forward`'s remat policy saves these so bwd skips the attention-fwd
# recompute (see _splash_kernel)
ATTN_RESIDUAL_NAME = "attn_residuals"
# tag on post-rope q/k/v (see _qkv_part / LlamaConfig.save_qkv_residuals)
QKV_RESIDUAL_NAME = "qkv_residuals"
# tag on the post-attention residual sum (QT_SAVE_POSTATTN=1)
POST_ATTN_RESIDUAL_NAME = "post_attn_residual"


def _save_post_attn() -> bool:
    import os

    return os.environ.get("QT_SAVE_POSTATTN", "0") == "1"


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    bitnet: bool = False  # RMSNorm-into-linear surgery (train_utils.py:47-71)
    remat: bool = False  # activation checkpointing per decoder layer
    # 'auto' = Pallas flash attention on TPU, fp32-softmax einsum elsewhere
    attention_impl: str = "auto"  # 'auto' | 'flash' | 'xla'
    # remat policy extra: also save post-rope q/k/v across the layer
    # checkpoint. MEASURED SLOWER at llama2-1b bs8 on v5e (14.7k vs 15.4k
    # tok/s int8 — the extra 84 MB/layer of live buffers costs more in
    # scheduling/memory pressure than the skipped qkv recompute saves,
    # and the bf16 config stopped compiling through this environment's
    # remote helper); kept as an opt-in knob for small models.
    save_qkv_residuals: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf_json(cls, path_or_dict, **overrides) -> "LlamaConfig":
        """Load from an HF-format config.json (the mini_llamas contract)."""
        if isinstance(path_or_dict, (str, Path)):
            with open(Path(path_or_dict) / "config.json" if Path(path_or_dict).is_dir() else path_or_dict) as f:
                d = json.load(f)
        else:
            d = dict(path_or_dict)
        keys = {
            "vocab_size",
            "hidden_size",
            "intermediate_size",
            "num_hidden_layers",
            "num_attention_heads",
            "num_key_value_heads",
            "max_position_embeddings",
            "rms_norm_eps",
            "rope_theta",
            "tie_word_embeddings",
        }
        kwargs = {k: v for k, v in d.items() if k in keys}
        kwargs.update(overrides)
        return cls(**kwargs)


# Llama-2-470m (mini_llamas/Llama-2-470m/config.json)
LLAMA2_470M = LlamaConfig()
# Llama2-1B: the README throughput-benchmark model (README.md:123-128 uses
# a 1B llama at bs16/seq2048); standard 1.1B TinyLlama geometry.
LLAMA2_1B = LlamaConfig(
    hidden_size=2048,
    intermediate_size=5632,
    num_hidden_layers=22,
    num_attention_heads=32,
    num_key_value_heads=4,
)


def init_params(key: Array, cfg: LlamaConfig, dtype=jnp.bfloat16):
    """HF-style init: normal(0.02) for weights, ones for norms."""
    H, D = cfg.num_attention_heads * cfg.head_dim, cfg.hidden_size
    KV = cfg.num_key_value_heads * cfg.head_dim
    F, L, V = cfg.intermediate_size, cfg.num_hidden_layers, cfg.vocab_size

    keys = iter(jax.random.split(key, 16))

    def w(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    # NOTE on projection fusion: a fused group-major qkv ([L, H+2KV, D])
    # and gate_up ([L, 2F, D]) variant was built and measured on v5e —
    # it LOST ~8% int8 train throughput (12.4k vs 13.5k tok/s). With SR
    # off, XLA CSE already deduplicates the identical dynamic quantizes
    # of the shared input h across q/k/v (and gate/up), so fusion saved
    # nothing there while the output split slices and the backward
    # grad-concat added full HBM passes per layer. Separate projections
    # are the measured-faster TPU layout.
    layers = {
        "attn_norm": {"g": jnp.ones((L, D), dtype)},
        "q": {"w": w(next(keys), (L, H, D))},
        "k": {"w": w(next(keys), (L, KV, D))},
        "v": {"w": w(next(keys), (L, KV, D))},
        "o": {"w": w(next(keys), (L, D, H))},
        "mlp_norm": {"g": jnp.ones((L, D), dtype)},
        "gate": {"w": w(next(keys), (L, F, D))},
        "up": {"w": w(next(keys), (L, F, D))},
        "down": {"w": w(next(keys), (L, D, F))},
    }
    if cfg.bitnet:
        layers["o_norm"] = {"g": jnp.ones((L, H), dtype)}
        layers["down_norm"] = {"g": jnp.ones((L, F), dtype)}

    params = {
        "embed": {"embedding": w(next(keys), (V, D))},
        "layers": layers,
        "final_norm": {"g": jnp.ones((D,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"w": w(next(keys), (V, D))}
    return params


def rms_norm(x: Array, g: Array, eps: float) -> Array:
    """fp32 math, weight applied in its own dtype (HF LlamaRMSNorm)."""
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return xf.astype(x.dtype) * g


def rope_tables(cfg: LlamaConfig, seq_len: int) -> tuple[Array, Array]:
    """fp32 cos/sin tables [S, head_dim]."""
    hd = cfg.head_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    )
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [S, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """x: [B, S, H, hd]; rotate-half convention.

    Tables are computed in fp32 (rope_tables) and cast to the activation
    dtype here; the rotation itself runs in x's dtype — the HF Llama
    convention (`(q * cos) + (rotate_half(q) * sin)` in model dtype with
    fp32-derived cos/sin). An all-fp32 rotation variant measured ~40 ms/
    step extra at llama2-1b bs8: the fp32 upcast forced fp32 layout
    copies through the attention head transposes.
    """
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[None, :, None, :].astype(x.dtype)
    s = sin[None, :, None, :].astype(x.dtype)
    return x * c + rotated * s


def _use_grouped_rope(cfg: LlamaConfig, seq: int) -> bool:
    """Fused rope+grouping path (ops/pallas_rope.py): replaces the
    rope-then-transpose jnp composite whose physical [B,S,H,hd] ->
    [B,H,S,hd] layout change XLA lowers as ~7 ms generic copies (~42
    ms/step at llama2-1b bs8, in BOTH bf16 and int8 configs — see
    profile_step.py). Active on the splash path by default; QT_FUSED_ROPE=0
    disables, QT_FUSED_ROPE=force enables the grouped pipeline with the
    einsum fallback (CPU equivalence tests)."""
    import os

    flag = os.environ.get("QT_FUSED_ROPE", "1")
    if flag == "0":
        return False
    if cfg.head_dim % 64 or cfg.head_dim > 256:
        return False
    if flag == "force":
        return True
    return _resolve_attn_impl(cfg.attention_impl, seq) == "splash"


def _resolve_attn_impl(impl: str, seq: int) -> str:
    """'auto' picks the fastest kernel the shape admits (measured on v5e:
    splash 512/1024 fwd+bwd 15.7 ms/layer vs legacy flash default 80.4 ms
    at B8 H32 KV4 S2048 hd64 — see benchmark_step_components.py)."""
    if impl != "auto":
        return impl
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        return "xla"
    if seq % 512 == 0:
        return "splash"
    if seq % 128 == 0 and seq >= 256:
        return "flash"
    return "xla"


def _splash_kernel(groups: int, seq: int):
    """Splash-attention (GQA/MQA-native) kernel: one causal mask per
    q-head-in-group; tuned block sizes for v5e. Built per trace — the
    kernel object holds arrays of the constructing trace, so it must NOT
    be cached across jit traces (UnexpectedTracerError otherwise)."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sak,
        splash_attention_mask as sam,
    )

    def blk(target: int) -> int:
        b = min(target, seq)
        while seq % b:
            b //= 2
        return b

    # 1024-everywhere measured best at S2048 hd64 on v5e; the FUSED
    # backward kernel (dq+dkv in one pass over K/V) measured ~3.3 ms/layer
    # faster than separate dq/dkv kernels at B8 H32 KV4 S2048
    # (/tmp attn sweep: 38.4 vs 41.7 ms/call incl. dispatch)
    bq = bkv = blk(1024)
    # block_kv_compute=512 under block_kv=1024 measured fastest in the
    # round-4 sweep (benchmark_attention_sweep.py: 12.18 vs 12.40 ms/layer
    # fwd+bwd at B8 H32 KV4 S2048 hd64); 2048-sized blocks exceed this
    # environment's remote-compile helper, 512/512 is slower (13.1).
    bc = min(512, bkv)
    bs = sak.BlockSizes(
        block_q=bq, block_kv=bkv, block_kv_compute=bc,
        block_q_dkv=bq, block_kv_dkv=bkv, block_kv_dkv_compute=bc,
        use_fused_bwd_kernel=True,
    )
    mask = sam.MultiHeadMask([sam.CausalMask((seq, seq)) for _ in range(groups)])
    # residual_checkpoint_name tags the kernel's (out, logsumexp) residuals
    # so the remat policy in `forward` can SAVE them: the attention forward
    # is then not recomputed during the backward pass (the kernel bwd only
    # needs q/k/v/out/lse), which removes ~5 ms/layer of recompute at
    # B8 S2048 while costing only ~69 MB/layer (out bf16 + lse f32).
    return sak.make_splash_mqa_single_device(
        mask, block_sizes=bs, residual_checkpoint_name=ATTN_RESIDUAL_NAME
    )


def attention(q: Array, k: Array, v: Array, impl: str = "auto") -> Array:
    """Causal GQA attention.

    q: [B, S, H, hd], k/v: [B, S, KV, hd] -> [B, S, H, hd]

    TPU dispatch order: splash kernel (GQA-native — KV is NOT repeated,
    saving 8x KV bandwidth at 32/4 heads) -> legacy flash with tuned
    blocks -> einsum with fp32 scores/softmax (reference numerics,
    materializes [S, S]).
    """
    B, S, H, hd = q.shape
    KV = k.shape[2]
    impl = _resolve_attn_impl(impl, S)

    if impl == "splash":
        kern = _splash_kernel(H // KV, S)
        # splash has no sm_scale arg; pre-scale q (for hd a power of 4 the
        # scale is a power of two — exact in bf16; otherwise one rounding)
        qs = q * jnp.asarray(hd**-0.5, q.dtype)
        qg = qs.transpose(0, 2, 1, 3).reshape(B, KV, H // KV, S, hd)
        kg = k.transpose(0, 2, 1, 3)  # [B, KV, S, hd]
        vg = v.transpose(0, 2, 1, 3)
        out = jax.vmap(jax.vmap(kern))(qg, kg, vg)  # [B, KV, H/KV, S, hd]
        return out.reshape(B, H, S, hd).transpose(0, 2, 1, 3)

    if KV != H:
        rep = H // KV
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    if impl == "flash":
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )

        # largest power-of-two divisor of S up to 512: the kernel requires
        # S % block == 0, and 'auto' admits any S % 128 == 0 (e.g. 640/1152)
        b = min(512, S)
        while S % b:
            b //= 2
        bs = BlockSizes(
            block_q=b, block_k_major=b, block_k=b, block_b=1,
            block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
            block_q_dkv=b, block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
        )
        out = flash_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            causal=True,
            sm_scale=hd**-0.5,
            block_sizes=bs,
        )
        return out.transpose(0, 2, 1, 3)

    scores = jnp.einsum(
        "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
    ) * (hd**-0.5)
    mask = jnp.tril(jnp.ones((S, S), bool))
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bthd->bshd", probs, v)


def _qkv_part_grouped(cfg: LlamaConfig, x, lp, cos, sin, key):
    """Norm + QKV projections + FUSED rope/grouping (ops/pallas_rope.py):
    q comes out [B,KV,G,S,hd] (with the 1/sqrt(hd) pre-scale folded into
    its rope tables), k/v [B,KV,S,hd] — the splash operand layouts,
    produced in one HBM pass each with no XLA layout copies."""
    from jax.ad_checkpoint import checkpoint_name

    from ..ops.pallas_rope import group_heads, rope_group

    B, S, _ = x.shape
    H, KV, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q, k, v = norm_linear_multi(
        x, lp["attn_norm"]["g"], [lp["q"]["w"], lp["k"]["w"], lp["v"]["w"]],
        cfg.rms_norm_eps, key=jax.random.fold_in(key, 0),
    )
    scale = hd**-0.5
    qg = rope_group(q.reshape(B, S, H, hd), cos * scale, sin * scale, KV)
    kg = rope_group(k.reshape(B, S, KV, hd), cos, sin, KV)[:, :, 0]
    vg = group_heads(v.reshape(B, S, KV, hd), KV)[:, :, 0]
    if cfg.save_qkv_residuals:
        qg = checkpoint_name(qg, QKV_RESIDUAL_NAME)
        kg = checkpoint_name(kg, QKV_RESIDUAL_NAME)
        vg = checkpoint_name(vg, QKV_RESIDUAL_NAME)
    return qg, kg, vg


def _attention_grouped(qg, kg, vg, impl: str):
    """Causal GQA attention on grouped operands.

    qg [B,KV,G,S,hd] (already 1/sqrt(hd)-scaled), kg/vg [B,KV,S,hd] ->
    [B,KV,G,S,hd]. Splash on TPU; grouped fp32-softmax einsum fallback
    (CPU equivalence tests)."""
    B, KV, G, S, hd = qg.shape
    impl = _resolve_attn_impl(impl, S)
    if impl == "splash":
        kern = _splash_kernel(G, S)
        return jax.vmap(jax.vmap(kern))(qg, kg, vg)
    scores = jnp.einsum(
        "bkgsd,bktd->bkgst", qg, kg, preferred_element_type=jnp.float32
    )
    mask = jnp.tril(jnp.ones((S, S), bool))
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(qg.dtype)
    return jnp.einsum("bkgst,bktd->bkgsd", probs, vg)


def _qkv_part(cfg: LlamaConfig, x, lp, cos, sin, key):
    """Norm + QKV projections + RoPE (remattable)."""
    from jax.ad_checkpoint import checkpoint_name

    B, S, _ = x.shape
    H, KV, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    # shared-input multi-linear with the norm FUSED into the input
    # quantize (all-int8 configs on TPU): h is quantized once for all
    # three projections and the bf16 norm output never hits HBM;
    # other schemes take the identical unfused rms_norm + qlinear_multi
    q, k, v = norm_linear_multi(
        x, lp["attn_norm"]["g"], [lp["q"]["w"], lp["k"]["w"], lp["v"]["w"]],
        cfg.rms_norm_eps, key=jax.random.fold_in(key, 0),
    )
    q = q.reshape(B, S, H, hd)
    k = k.reshape(B, S, KV, hd)
    v = v.reshape(B, S, KV, hd)
    q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
    if cfg.save_qkv_residuals:
        # saved by the remat policy: the attention backward consumes
        # q/k/v directly, so with these kept the whole qkv+rope chain
        # drops out of the backward recompute
        q = checkpoint_name(q, QKV_RESIDUAL_NAME)
        k = checkpoint_name(k, QKV_RESIDUAL_NAME)
        v = checkpoint_name(v, QKV_RESIDUAL_NAME)
    return q, k, v


def _post_attn_part(cfg: LlamaConfig, x, ctx, lp, key, *, ctx_grouped=None):
    """O-projection + MLP with residuals (remattable).

    ``ctx_grouped`` (grouped attention output [B,KV,G,S,hd], exclusive
    with ``ctx``): routes the o-projection through the fused
    ungroup->quantize linear (quant/fused.py::attn_out_linear)."""
    def lkey(i):
        return jax.random.fold_in(key, i)

    if ctx_grouped is not None:
        from ..quant import attn_out_linear

        x = x + attn_out_linear(
            ctx_grouped, lp["o"]["w"], cfg.num_key_value_heads, key=lkey(3)
        )
        if _save_post_attn():
            # saving the post-attention residual (64 MB/layer bf16) lets
            # the remat replay drop the o-projection GEMM + the fused
            # attn-out quantize that only existed to rebuild it (the MLP
            # custom_vjp holds x_mid as a residual)
            from jax.ad_checkpoint import checkpoint_name

            x = checkpoint_name(x, POST_ATTN_RESIDUAL_NAME)
    else:
        if cfg.bitnet:
            ctx = rms_norm(ctx, lp["o_norm"]["g"], cfg.rms_norm_eps)
        x = x + qlinear(ctx, lp["o"]["w"], key=lkey(3))

    if cfg.bitnet:
        gate, up = norm_linear_multi(
            x, lp["mlp_norm"]["g"], [lp["gate"]["w"], lp["up"]["w"]],
            cfg.rms_norm_eps, key=lkey(4),
        )
        act = jax.nn.silu(gate) * up
        act = rms_norm(act, lp["down_norm"]["g"], cfg.rms_norm_eps)
        return x + qlinear(act, lp["down"]["w"], key=lkey(6))
    # whole MLP as one fused op (all-int8): norm/silu producers run inside
    # the quantizes AND the backward's (dgate, dup) are computed+quantized
    # in-kernel; falls back to norm_linear_multi + silu_mul_linear
    return x + mlp_linear(
        x, lp["mlp_norm"]["g"], lp["gate"]["w"], lp["up"]["w"],
        lp["down"]["w"], cfg.rms_norm_eps, key=lkey(4),
    )


def _decoder_layer(cfg: LlamaConfig, x, lp, cos, sin, key):
    """One decoder layer. lp = per-layer param slice; key for SR quant.

    NOTE on remat granularity: checkpointing sub-segments of the layer
    (to keep the flash-attention fwd from being recomputed, ~78 ms/step
    at llama2-1b bs8) was tried and is numerically fine, but any
    partial-layer checkpoint inside the scan blows up the 1B-model XLA
    compile in this environment (remote compile helper exits). The stable
    configuration is ONE jax.checkpoint around the whole layer, applied
    by ``forward``.
    """
    B, S, D = x.shape
    H, hd = cfg.num_attention_heads, cfg.head_dim

    if _use_grouped_rope(cfg, S):
        from ..ops.pallas_rope import ungroup_heads

        qg, kg, vg = _qkv_part_grouped(cfg, x, lp, cos, sin, key)
        out = _attention_grouped(qg, kg, vg, cfg.attention_impl)
        if not cfg.bitnet:
            # grouped output straight into the fused ungroup->quantize
            # o-projection (falls back to ungroup + qlinear internally)
            return _post_attn_part(cfg, x, None, lp, key, ctx_grouped=out)
        ctx = ungroup_heads(out, cfg.num_key_value_heads).reshape(B, S, H * hd)
    else:
        q, k, v = _qkv_part(cfg, x, lp, cos, sin, key)
        ctx = attention(q, k, v, cfg.attention_impl).reshape(B, S, H * hd)
    return _post_attn_part(cfg, x, ctx, lp, key)


def backbone(params, tokens: Array, cfg: LlamaConfig, key: Array | None = None):
    """tokens [B, S] int32 -> final-norm hidden states [B, S, D].

    ``key`` seeds stochastic rounding inside quantized linears (unused for
    deterministic schemes).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    B, S = tokens.shape
    x = params["embed"]["embedding"][tokens]
    cos, sin = rope_tables(cfg, S)

    # optional (QT_PREQUANT env var, default off): hoist weight
    # quantization out of the layer loop — int8 mixed-precision weights
    # pre-quantized ONCE per step instead of per matmul, views entering
    # the scan as saved inputs so remat never re-quantizes them.
    # Measured NEUTRAL-TO-NEGATIVE at llama2-1b bs8 on v5e (see
    # quant/api.py::prequantize_step for the A/B numbers): XLA already
    # overlaps the per-matmul weight quantizes with MXU work, and both
    # int8 views together (+2 GB) tip the step into host-offload.
    layers = prequantize_step(
        params["layers"], key=jax.random.fold_in(key, 0x5EED)
    )

    layer_body = partial(_decoder_layer, cfg)
    if cfg.remat:
        # per-layer activation checkpointing (llm_pretrain.py:112-113);
        # see _decoder_layer's docstring for the granularity constraint.
        # The policy keeps the splash kernel's named (out, lse) residuals
        # so the attention forward is NOT recomputed in the backward —
        # everything else (norms, quantizes, projections) still remats.
        # On non-splash paths no value carries the name, so this degrades
        # to plain full remat.
        names = [ATTN_RESIDUAL_NAME]
        # tiny [1,K] f32 col-absmax outputs of the fused quantize kernels:
        # saving them lets the replay DCE the whole silu-row quantize /
        # down-GEMM / attn-out-quantize / o-GEMM chains, which were only
        # re-run because a multi-output custom call cannot be partially
        # DCE'd (see quant/fused.py QUANT_AMAX_RESIDUAL)
        from ..quant.fused import QUANT_AMAX_RESIDUAL

        names.append(QUANT_AMAX_RESIDUAL)
        if _save_post_attn():
            names.append(POST_ATTN_RESIDUAL_NAME)
        if cfg.save_qkv_residuals:
            names.append(QKV_RESIDUAL_NAME)
        layer_body = jax.checkpoint(
            layer_body,
            policy=jax.checkpoint_policies.save_only_these_names(*names),
        )

    def scan_fn(x, inputs):
        lp, lkey = inputs
        return layer_body(x, lp, cos, sin, lkey), None

    layer_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(cfg.num_hidden_layers)
    )
    x, _ = jax.lax.scan(scan_fn, x, (layers, layer_keys))

    return rms_norm(x, params["final_norm"]["g"], cfg.rms_norm_eps)


def _lm_head_weight(params, cfg: LlamaConfig):
    return (
        params["embed"]["embedding"]
        if cfg.tie_word_embeddings
        else params["lm_head"]["w"]
    )


def forward(params, tokens: Array, cfg: LlamaConfig, key: Array | None = None):
    """tokens [B, S] int32 -> logits [B, S, V] (model dtype; cast for loss)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    x = backbone(params, tokens, cfg, key)
    lm_w = _lm_head_weight(params, cfg)
    return qlinear(x, lm_w, key=jax.random.fold_in(key, 0x7FFFFFFF))


def loss_fn(params, tokens: Array, labels: Array, cfg: LlamaConfig, key=None):
    """fp32 token-mean cross entropy (llm_pretrain.py:30-35).

    labels == -100 are ignored (the padding convention of the finetune
    driver, llm_finetune.py).

    When the LM head is a plain (unquantized) weight the logits never
    materialize: the head matmul and the softmax/NLL run chunk-fused
    (ops/cross_entropy.py), saving the [T, V] fp32 log-softmax residual
    and dlogits buffers (~3 GB at bench shapes). A quantized LM head
    (--quantize_lm_head) falls back to explicit logits so the quantized
    matmul semantics are preserved.
    """
    lm_w = _lm_head_weight(params, cfg)
    if isinstance(lm_w, jax.Array):
        from ..ops.cross_entropy import fused_linear_cross_entropy

        x = backbone(params, tokens, cfg, key)
        x2d = x.reshape(-1, x.shape[-1])
        nll_sum, n_valid = fused_linear_cross_entropy(
            x2d, lm_w, labels.reshape(-1)
        )
        return nll_sum / jnp.maximum(n_valid, 1)

    logits = forward(params, tokens, cfg, key).astype(jnp.float32)
    V = logits.shape[-1]
    logits = logits.reshape(-1, V)
    labels = labels.reshape(-1)
    valid = labels != -100
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def num_params(params) -> int:
    import numpy as np

    leaves = jax.tree.leaves(params)
    return int(sum(np.prod(l.shape) for l in leaves))
