"""Fused RoPE + head-grouping layout kernels.

Why these exist: the splash-attention kernels take q as [B, KV, G, S, hd]
(GQA-grouped, S/hd minor) while the projection GEMMs produce [B, S, H*hd].
Expressed in jnp, the bridge is rotate-half RoPE followed by a logical
transpose — and XLA lowers the physical [B,S,H,hd] -> [B,H,S,hd] layout
change as a generic copy that runs at ~2% of HBM bandwidth on v5e
(profile_step.py: six ~7 ms `copy` ops per step at llama2-1b bs8, ~42
ms/step in BOTH the bf16 and int8 configs). These kernels do the rotation
and the layout change in one HBM round-trip at DMA speed.

Kernel geometry (TPU):
  - The ungrouped side is the 3D view [B, S, H*hd]; each grid step
    handles one HEAD PAIR (128 lanes — the native lane tile; hd=64
    blocks alone violate Mosaic's last-dim rule) for an S-range:
    in/out blocks are (1, bs, 128) against [B,S,H*hd] and
    (1, 1|2, 2|1, bs, hd) against [B,KV,G,S,hd] — all contiguous DMA.
  - NO in-kernel transposes or lane slices: a first transpose-based
    version measured 53 GB/s (vreg shuffles dominated); this version
    moves lanes with tiny MXU matmuls instead —
      rotate-half:  rot = x2 @ R2   (R2 = blockdiag(R, R), signed perm)
      pair split:   head_g = y2 @ SEL_g   (SEL_g [128, 64] selector)
      pair merge:   y2 = h0 @ SEL_0^T + h1 @ SEL_1^T
    Each is [bs,128]@[128,*] — ~1% of the kernel's HBM time in FLOPs.
  - cos/sin arrive PAIR-TILED [S, 128] (cos2/sin2, see
    :func:`pair_tables`) so the rope math is pure elementwise; any
    scalar pre-scale (q's 1/sqrt(hd)) is folded into the tables:
    scale*(x*c + rot(x)*s) = x*(c*scale) + rot(x)*(s*scale).
  - grid is (B, S/bs, n_pairs) with the pair index INNERMOST so the
    cos/sin blocks are re-fetched only on S-steps.

The VJP of y = x*c + rot(x)*s is dx = dy*c + rot^T(dy)*s with
rot^T = rot^{-1} (the rotation is orthogonal) — `inverse=True`.

Also here: the attention-output -> INT8 o-proj input fusion
(:func:`ungroup_amax` / :func:`ungroup_quant`): the
ungrouping runs INSIDE the int8 quantize, so the bf16 [B,S,H*hd]
attention output is never materialized in the int8 forward (nor in the
remat replay), and the backward's colwise pass reuses the forward's
column absmax.

Oracles: :func:`rope_group_ref` / :func:`rope_ungroup_ref` (plain jnp,
also the CPU fallback). The kernels compute in fp32 and the MXU
selector/rotation matmuls are exact signed permutations, so outputs
match the jnp composites to 1 output-dtype ulp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _iota2(n, m):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    return r, c


def _rot2_matrix(hd: int, inverse: bool):
    """blockdiag(R, R) [2*hd, 2*hd] with rot(x) = x @ R = concat(-x2, x1)
    per 64-lane head; R^T (inverse) gives rot^{-1}."""
    half = hd // 2
    r, c = _iota2(2 * hd, 2 * hd)
    same = (r // hd) == (c // hd)
    rr, cc = r % hd, c % hd
    neg = (rr == cc + half) if not inverse else (cc == rr + half)
    pos = (cc == rr + half) if not inverse else (rr == cc + half)
    R = jnp.where(same & neg, jnp.float32(-1), jnp.float32(0))
    return R + jnp.where(same & pos, jnp.float32(1), jnp.float32(0))


def _sel_matrix(hd: int, which: int):
    """SEL_which [2*hd, hd]: picks lanes [which*hd, (which+1)*hd)."""
    r, c = _iota2(2 * hd, hd)
    return jnp.where(r == c + which * hd, jnp.float32(1), jnp.float32(0))


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def pair_tables(cos: Array, sin: Array, scale: float = 1.0):
    """[S, hd] rope tables -> pair-tiled f32 [S, 2*hd] with the scalar
    pre-scale folded in (kernel input format)."""
    c = jnp.concatenate([cos, cos], axis=-1).astype(jnp.float32) * scale
    s = jnp.concatenate([sin, sin], axis=-1).astype(jnp.float32) * scale
    return c, s


def _pair_coords(p: int, G: int):
    """Head pair p -> (kv, g) of its first head + whether the pair spans
    the kv axis (G == 1) or the g axis (G even)."""
    if G == 1:
        return 2 * p, 0
    return (2 * p) // G, ((2 * p) % G) // 2


# ---------------------------------------------------------------------------
# group: [B, S, H*hd] (+rope) -> [B, KV, G, S, hd]
# ---------------------------------------------------------------------------


def _group_kernel(x_ref, cos_ref, sin_ref, out_ref, *, hd, inverse):
    xf = x_ref[0].astype(jnp.float32)  # [bs, 2*hd]
    y = xf * cos_ref[:] + _mm(xf, _rot2_matrix(hd, inverse)) * sin_ref[:]
    lo = _mm(y, _sel_matrix(hd, 0)).astype(out_ref.dtype)
    hi = _mm(y, _sel_matrix(hd, 1)).astype(out_ref.dtype)
    if out_ref.shape[1] == 2:  # pair spans the kv axis (G == 1)
        out_ref[0, 0, 0] = lo
        out_ref[0, 1, 0] = hi
    else:
        out_ref[0, 0, 0] = lo
        out_ref[0, 0, 1] = hi


def _pick_bs(S: int, cap: int = 1024) -> int:
    if S % 8 != 0:
        # a non-dividing bs would make the grid S//bs silently drop the
        # sequence tail; gates (_supported_heads) route such S to the jnp
        # path, so reaching here is a caller bug.
        raise ValueError(f"rope kernels need S % 8 == 0, got S={S}")
    b, best = 8, 8
    while b <= min(S, cap):
        if S % b == 0:
            best = b
        b *= 2
    return best


@functools.partial(jax.jit, static_argnames=("kv", "inverse", "interpret"))
def rope_group_kernel(
    x: Array,
    cos2: Array,
    sin2: Array,
    *,
    kv: int,
    inverse: bool = False,
    interpret: bool = False,
) -> Array:
    """[B, S, H, hd] (+pair-tiled rope tables [S, 2*hd]) -> [B,KV,G,S,hd]."""
    B, S, H, hd = x.shape
    G = H // kv
    assert H % 2 == 0 and (G == 1 or G % 2 == 0), (H, G)
    x3 = x.reshape(B, S, H * hd)
    bs = _pick_bs(S)
    P = H // 2
    if G == 1:
        out_spec = pl.BlockSpec(
            (1, 2, 1, bs, hd),
            lambda b, s, p: (b, p, 0, s, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        out_spec = pl.BlockSpec(
            (1, 1, 2, bs, hd),
            lambda b, s, p: (b, (2 * p) // G, ((2 * p) % G) // 2, s, 0),
            memory_space=pltpu.VMEM,
        )
    return pl.pallas_call(
        functools.partial(_group_kernel, hd=hd, inverse=inverse),
        grid=(B, S // bs, P),
        in_specs=[
            pl.BlockSpec((1, bs, 2 * hd), lambda b, s, p: (b, s, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 2 * hd), lambda b, s, p: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 2 * hd), lambda b, s, p: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, kv, G, S, hd), x.dtype),
        interpret=interpret,
    )(x3, cos2, sin2)


# ---------------------------------------------------------------------------
# ungroup: [B, KV, G, S, hd] -> [B, S, H*hd] (+transposed rope)
# ---------------------------------------------------------------------------


def _ungroup_kernel(y_ref, cos_ref, sin_ref, out_ref, *, hd, inverse):
    if y_ref.shape[1] == 2:
        lo = y_ref[0, 0, 0].astype(jnp.float32)
        hi = y_ref[0, 1, 0].astype(jnp.float32)
    else:
        lo = y_ref[0, 0, 0].astype(jnp.float32)
        hi = y_ref[0, 0, 1].astype(jnp.float32)
    y2 = _mm(lo, _sel_matrix(hd, 0).T) + _mm(hi, _sel_matrix(hd, 1).T)
    out = y2 * cos_ref[:] + _mm(y2, _rot2_matrix(hd, inverse)) * sin_ref[:]
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def rope_ungroup_kernel(
    y: Array,
    cos2: Array,
    sin2: Array,
    *,
    inverse: bool = True,
    interpret: bool = False,
) -> Array:
    """[B,KV,G,S,hd] (+pair-tiled tables) -> [B, S, H, hd]."""
    B, KV, G, S, hd = y.shape
    H = KV * G
    assert H % 2 == 0 and (G == 1 or G % 2 == 0), (H, G)
    bs = _pick_bs(S)
    P = H // 2
    if G == 1:
        in_spec = pl.BlockSpec(
            (1, 2, 1, bs, hd),
            lambda b, s, p: (b, p, 0, s, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        in_spec = pl.BlockSpec(
            (1, 1, 2, bs, hd),
            lambda b, s, p: (b, (2 * p) // G, ((2 * p) % G) // 2, s, 0),
            memory_space=pltpu.VMEM,
        )
    out = pl.pallas_call(
        functools.partial(_ungroup_kernel, hd=hd, inverse=inverse),
        grid=(B, S // bs, P),
        in_specs=[
            in_spec,
            pl.BlockSpec((bs, 2 * hd), lambda b, s, p: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 2 * hd), lambda b, s, p: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bs, 2 * hd), lambda b, s, p: (b, s, p),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, H * hd), y.dtype),
        interpret=interpret,
    )(y, cos2, sin2)
    return out.reshape(B, S, H, hd)


# ---------------------------------------------------------------------------
# attention-output -> INT8 o-proj input (ungroup fused into the quantize)
# ---------------------------------------------------------------------------


def _amax_kernel(y_ref, row_ref, colp_ref):
    # row_ref block index (b, s, 0) is INVARIANT to the innermost grid dim
    # p, so its revisits are consecutive — the one accumulator pattern
    # Pallas TPU supports (output windows are NOT re-fetched on
    # non-consecutive revisit; Mosaic interpret mode raises 'Revisited
    # block' for it). The col absmax therefore CANNOT accumulate into a
    # (0, p) block here (p changes every step — its revisits across (b, s)
    # are non-consecutive, and on hardware the window would hold stale
    # double-buffer contents from other pairs). Instead each (b, s, p)
    # step writes its partial col max to a DISTINCT block of colp
    # [B, S//bs, H*hd], written exactly once, and the [1, H*hd] reduction
    # over (b, s) happens outside the kernel (ungroup_amax) — a few KB of
    # f32, negligible next to the one read of y.
    if y_ref.shape[1] == 2:
        lo = y_ref[0, 0, 0].astype(jnp.float32)
        hi = y_ref[0, 1, 0].astype(jnp.float32)
    else:
        lo = y_ref[0, 0, 0].astype(jnp.float32)
        hi = y_ref[0, 0, 1].astype(jnp.float32)
    p = pl.program_id(2)

    @pl.when(p == 0)
    def _():
        row_ref[:] = jnp.zeros_like(row_ref)

    la, ha = jnp.abs(lo), jnp.abs(hi)
    m = jnp.maximum(
        jnp.max(la, axis=1, keepdims=True), jnp.max(ha, axis=1, keepdims=True)
    )
    row_ref[0] = jnp.maximum(row_ref[0], m)
    # partial col max as an (8, 2*hd) tile (Mosaic's minimum f32 block):
    # reduce [bs, hd] over strided row groups so the tile holds real
    # partials; the final max over all rows happens outside the kernel.
    bs = la.shape[0]
    cm8 = jnp.concatenate(
        [
            jnp.max(la.reshape(8, bs // 8, -1), axis=1),
            jnp.max(ha.reshape(8, bs // 8, -1), axis=1),
        ],
        axis=1,
    )
    colp_ref[:] = cm8


def _ungroup_scale_kernel(y_ref, seed_ref, s_ref, q_ref, *, hd, axis, sr, salt):
    from .pallas_quant import _block_seed, _inv_scale, _round_op

    if sr:
        pltpu.prng_seed(
            _block_seed(
                seed_ref, pl.program_id(0), pl.program_id(1),
                pl.program_id(2), jnp.int32(salt),
            )
        )
    if y_ref.shape[1] == 2:
        lo = y_ref[0, 0, 0].astype(jnp.float32)
        hi = y_ref[0, 1, 0].astype(jnp.float32)
    else:
        lo = y_ref[0, 0, 0].astype(jnp.float32)
        hi = y_ref[0, 0, 1].astype(jnp.float32)
    y2 = _mm(lo, _sel_matrix(hd, 0).T) + _mm(hi, _sel_matrix(hd, 1).T)
    inv = _inv_scale(s_ref[0] if axis == 1 else s_ref[:], 1e-12)
    q = _round_op(y2 * inv, sr)
    q_ref[0] = jnp.clip(q, -128, 127).astype(jnp.int8)


def _grouped_specs(B, KV, G, S, hd, bs):
    if G == 1:
        return pl.BlockSpec(
            (1, 2, 1, bs, hd), lambda b, s, p: (b, p, 0, s, 0),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (1, 1, 2, bs, hd),
        lambda b, s, p: (b, (2 * p) // G, ((2 * p) % G) // 2, s, 0),
        memory_space=pltpu.VMEM,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def ungroup_amax(y: Array, *, interpret: bool = False):
    """Grouped attention output -> (row absmax [B,S,1], col absmax
    [1, H*hd]) of the ungrouped [B*S, H*hd] view, one read."""
    B, KV, G, S, hd = y.shape
    H = KV * G
    bs = _pick_bs(S)
    n_s = S // bs
    row, colp = pl.pallas_call(
        _amax_kernel,
        grid=(B, n_s, H // 2),
        in_specs=[_grouped_specs(B, KV, G, S, hd, bs)],
        out_specs=[
            pl.BlockSpec((1, bs, 1), lambda b, s, p: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 2 * hd), lambda b, s, p: (b * n_s + s, p),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, 1), jnp.float32),
            jax.ShapeDtypeStruct((B * n_s * 8, H * hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(y)
    col = jnp.max(colp, axis=0).reshape(1, H * hd)
    return row, col


@functools.partial(jax.jit, static_argnames=("axis", "sr", "interpret"))
def ungroup_quant(
    y: Array,
    scale: Array,
    seed: Array | None = None,
    *,
    axis: int,
    sr: bool = False,
    interpret: bool = False,
) -> Array:
    """Grouped attention output -> INT8 [B, S, H*hd] given precomputed
    scales (axis=1: row scale [B,S,1]; axis=0: col scale [1,H*hd]).

    One read of y, one int8 write — the bf16 ungrouped attention output
    never exists. Combine with :func:`ungroup_amax` (rowwise fwd) or a
    forwarded col amax (backward) for a 2-pass / 1-pass total."""
    from .pallas_quant import _as_seed, _seed_spec

    B, KV, G, S, hd = y.shape
    H = KV * G
    bs = _pick_bs(S)
    seed = _as_seed(seed)
    if axis == 1:
        s_spec = pl.BlockSpec((1, bs, 1), lambda b, s, p: (b, s, 0),
                              memory_space=pltpu.VMEM)
    else:
        s_spec = pl.BlockSpec((1, 2 * hd), lambda b, s, p: (0, p),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _ungroup_scale_kernel, hd=hd, axis=axis, sr=sr, salt=23 + axis
        ),
        grid=(B, S // bs, H // 2),
        in_specs=[
            _grouped_specs(B, KV, G, S, hd, bs),
            _seed_spec(),
            s_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, bs, 2 * hd), lambda b, s, p: (b, s, p),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, H * hd), jnp.int8),
        interpret=interpret,
    )(y, seed, scale)


# ---------------------------------------------------------------------------
# jnp oracles / CPU fallbacks
# ---------------------------------------------------------------------------


def rope_group_ref(x, cos, sin, kv):
    """jnp oracle: rotate-half rope then GQA grouping.

    x [B,S,H,hd]; cos/sin [S,hd] (pre-scaled); -> [B,KV,G,S,hd]."""
    B, S, H, hd = x.shape
    half = hd // 2
    xf = x.astype(jnp.float32)
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    c = cos.astype(jnp.float32)[None, :, None, :]
    s = sin.astype(jnp.float32)[None, :, None, :]
    y = (xf * c + rot * s).astype(x.dtype)
    return y.transpose(0, 2, 1, 3).reshape(B, kv, H // kv, S, hd)


def rope_ungroup_ref(y, cos, sin, kv, *, inverse=True):
    """jnp oracle: ungroup then (inverse) rotation -> [B,S,H,hd]."""
    B, KV, G, S, hd = y.shape
    half = hd // 2
    x = y.reshape(B, KV * G, S, hd).transpose(0, 2, 1, 3)
    xf = x.astype(jnp.float32)
    if inverse:
        rot = jnp.concatenate([xf[..., half:], -xf[..., :half]], axis=-1)
    else:
        rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    c = cos.astype(jnp.float32)[None, :, None, :]
    s = sin.astype(jnp.float32)[None, :, None, :]
    return (xf * c + rot * s).astype(y.dtype)


def _use_kernel(x) -> bool:
    try:
        return (
            jax.default_backend() == "tpu"
            and x.dtype in (jnp.bfloat16, jnp.float32)
        )
    except Exception:
        return False


def _supported_heads(H: int, G: int, hd: int, S: int = 0) -> bool:
    """Kernel admissibility. hd % 64: the kernels' last block dim is 2*hd
    and must hit Mosaic's 128-lane tile (hd=8..56 would pass an hd%8 gate
    and then fail Mosaic compilation); S % 8: _pick_bs needs a dividing
    block size or the grid drops the sequence tail."""
    return (
        H % 2 == 0
        and (G == 1 or G % 2 == 0)
        and hd % 64 == 0
        and S % 8 == 0
    )


# ---------------------------------------------------------------------------
# differentiable wrappers (cos/sin are [S, hd]; pair-tiling is internal)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def rope_group(x: Array, cos: Array, sin: Array, kv: int) -> Array:
    """Differentiable fused rope+group: [B,S,H,hd] -> [B,KV,G,S,hd].

    cos/sin [S, hd] carry any scalar pre-scale (q's 1/sqrt(hd)); their
    cotangents are zero (rope tables are position constants)."""
    S, H, hd = x.shape[1], x.shape[2], x.shape[3]
    if _use_kernel(x) and _supported_heads(H, H // kv, hd, S):
        c2, s2 = pair_tables(cos, sin)
        return rope_group_kernel(x, c2, s2, kv=kv)
    return rope_group_ref(x, cos, sin, kv)


def _rope_group_fwd(x, cos, sin, kv):
    return rope_group(x, cos, sin, kv), (cos, sin)


def _rope_group_bwd(kv, res, dy):
    cos, sin = res
    KV, G, S, hd = dy.shape[1], dy.shape[2], dy.shape[3], dy.shape[4]
    if _use_kernel(dy) and _supported_heads(KV * G, G, hd, S):
        c2, s2 = pair_tables(cos, sin)
        dx = rope_ungroup_kernel(dy, c2, s2, inverse=True)
    else:
        dx = rope_ungroup_ref(dy, cos, sin, kv, inverse=True)
    return dx, jnp.zeros_like(cos), jnp.zeros_like(sin)


rope_group.defvjp(_rope_group_fwd, _rope_group_bwd)


def _const_tables(S: int, hd: int, dtype):
    return jnp.ones((S, hd), dtype), jnp.zeros((S, hd), dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def group_heads(x: Array, kv: int) -> Array:
    """Differentiable fused grouping (no rotation): [B,S,H,hd] ->
    [B,KV,G,S,hd] (v, and the backward's dout)."""
    S, H, hd = x.shape[1], x.shape[2], x.shape[3]
    one, zero = _const_tables(S, hd, x.dtype)
    if _use_kernel(x) and _supported_heads(H, H // kv, hd, S):
        c2, s2 = pair_tables(one, zero)
        return rope_group_kernel(x, c2, s2, kv=kv)
    return rope_group_ref(x, one, zero, kv)


def _group_heads_fwd(x, kv):
    return group_heads(x, kv), ()


def _group_heads_bwd(kv, _res, dy):
    S, hd = dy.shape[3], dy.shape[4]
    KV, G = dy.shape[1], dy.shape[2]
    one, zero = _const_tables(S, hd, dy.dtype)
    if _use_kernel(dy) and _supported_heads(KV * G, G, hd, S):
        c2, s2 = pair_tables(one, zero)
        return (rope_ungroup_kernel(dy, c2, s2, inverse=True),)
    return (rope_ungroup_ref(dy, one, zero, kv, inverse=True),)


group_heads.defvjp(_group_heads_fwd, _group_heads_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ungroup_heads(y: Array, kv: int) -> Array:
    """Differentiable fused ungrouping (no rotation): [B,KV,G,S,hd] ->
    [B,S,H,hd] (the attention output feeding o_proj)."""
    KV, G, S, hd = y.shape[1], y.shape[2], y.shape[3], y.shape[4]
    one, zero = _const_tables(S, hd, y.dtype)
    if _use_kernel(y) and _supported_heads(KV * G, G, hd, S):
        c2, s2 = pair_tables(one, zero)
        return rope_ungroup_kernel(y, c2, s2, inverse=True)
    return rope_ungroup_ref(y, one, zero, kv, inverse=True)


def _ungroup_heads_fwd(y, kv):
    return ungroup_heads(y, kv), ()


def _ungroup_heads_bwd(kv, _res, dx):
    S, H, hd = dx.shape[1], dx.shape[2], dx.shape[3]
    one, zero = _const_tables(S, hd, dx.dtype)
    if _use_kernel(dx) and _supported_heads(H, H // kv, hd, S):
        c2, s2 = pair_tables(one, zero)
        return (rope_group_kernel(dx, c2, s2, kv=kv),)
    return (rope_group_ref(dx, one, zero, kv),)


ungroup_heads.defvjp(_ungroup_heads_fwd, _ungroup_heads_bwd)
