"""Capture + parse a device trace of one train step (op-level breakdown).

The TPU equivalent of the reference's ``--profile`` torch.profiler flow
(llm_pretrain.py:186-188, :262-264), plus an inline analysis pass: traces
two steps with ``jax.profiler.trace``, then aggregates per-op durations
from the xplane and prints the top offenders — no TensorBoard needed.

Usage:
  python profile_step.py [--quantize mixed_precision] [--model llama2-1b]
                         [--bs 8] [--seq 2048] [--top 30] [--out DIR]
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import sys
from collections import defaultdict

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quantize", default=None)
    parser.add_argument("--quantize_kwargs", default=None,
                        help="JSON kwargs for the scheme config "
                        '(e.g. \'{"grad_weight": false}\')')
    parser.add_argument("--model", default="llama2-1b")
    parser.add_argument("--bs", type=int, default=8)
    parser.add_argument("--accum", type=int, default=1,
                        help="micro-steps: tokens become [accum, bs, seq]")
    parser.add_argument("--seq", type=int, default=2048)
    parser.add_argument("--top", type=int, default=30)
    parser.add_argument("--out", default=None, help="trace dir (kept for TensorBoard)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from quantized_training_tpu import optim, quant
    from quantized_training_tpu.models import llama
    from quantized_training_tpu.train import init_train_state, make_train_step

    cfg = {"llama2-1b": llama.LLAMA2_1B, "llama2-470m": llama.LLAMA2_470M}[args.model]
    cfg = dataclasses.replace(cfg, max_position_embeddings=args.seq, remat=True)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    import json

    qkw = json.loads(args.quantize_kwargs) if args.quantize_kwargs else {}
    qparams = quant.quantize_params(params, args.quantize, **qkw)
    optimizer = optim.adamw_bf16_sr(bf16_stochastic_rounding=False)
    state = init_train_state(qparams, optimizer)
    step_fn = make_train_step(cfg, optimizer)
    shape = (
        (args.accum, args.bs, args.seq) if args.accum > 1
        else (args.bs, args.seq)
    )
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), shape, 0, cfg.vocab_size, jnp.int32
    )
    labels = jnp.roll(tokens, -1, axis=-1)
    key = jax.random.PRNGKey(2)

    def sync(m):
        np.asarray(jax.device_get(m["loss"]))

    # lower BEFORE running: step_fn donates state, and .lower() on donated
    # (deleted) arrays is unreliable; compile() later is a cache hit
    lowered = step_fn.lower(state, tokens, labels, 1e-4, key)
    state, m = step_fn(state, tokens, labels, 1e-4, key)
    sync(m)
    print("compiled; tracing 2 steps...", file=sys.stderr, flush=True)

    outdir = args.out or f"/tmp/trace_{args.quantize or 'bf16'}"
    with jax.profiler.trace(outdir):
        for i in range(2):
            state, m = step_fn(state, tokens, labels, 1e-4, jax.random.fold_in(key, i))
        sync(m)

    traces = sorted(glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True))
    if not traces:
        raise SystemExit(
            f"no .xplane.pb produced under {outdir} — device-side profiling "
            "may be unsupported in this environment"
        )
    path = traces[-1]
    pd = jax.profiler.ProfileData.from_serialized_xspace(open(path, "rb").read())

    import re

    # Classify ops against the compiled HLO: the trace's event names
    # truncate operand lists, which mislabels the wgrad GEMMs that XLA
    # output-fuses into the stacked-grad dynamic-update-slice (their
    # first displayed operand is the bf16[L,...] buffer, hiding the s8
    # GEMM operands). The HLO text carries the full operand dtypes AND
    # the op_name metadata (".../dot_general" etc.), so look each leaf
    # up there first. Compiling here is cheap: the step was just
    # compiled, so this hits the in-process executable cache.
    hlo_info: dict[str, str] = {}
    try:
        hlo = lowered.compile().as_text()
        for line in hlo.splitlines():
            m = re.match(r"\s*%?([\w.\-]+) = (.*)", line)
            if m:
                hlo_info[m.group(1)] = m.group(2)
    except Exception as e:  # profiling still works, categories degrade
        print(f"HLO lookup unavailable ({e}); name-only categories",
              file=sys.stderr)

    def category(name: str) -> str:
        """Bucket a leaf HLO event into the step-budget categories."""
        head = name.partition(" = ")[0]
        base = re.match(r"%([\w.\-]+)", head)
        base = base.group(1) if base else head
        if "splash" in base or base.startswith("pallas_call"):
            return "attention kernels (splash fwd/bwd)"
        if base.startswith(("jit_fused_adamw", "fused_adamw")):
            return "optimizer (fused adamw)"
        if base.startswith(
            ("jit_quantize", "quantize_int8", "jit_rmsnorm", "rmsnorm_quant",
             "jit_silu", "silu_mul_quant", "silu_mul_bwd_quant",
             "jit_layer_norm", "layer_norm_quant", "jit_gelu", "gelu_quant",
             "jit_ungroup", "ungroup_quant", "ungroup_amax")
        ):
            return "quantize + fused-producer kernels"
        if base.startswith(("jit_rope", "rope_group", "rope_ungroup")):
            return "attention-adjacent (rope / head layouts / residual stacking)"
        if base.startswith("while"):
            return "scan wrapper self-time"
        if ("copy-start" in base or "copy-done" in base or "slice-start" in base
                or "slice-done" in base):
            return "async DMA self-time (overlapped)"
        rest = hlo_info.get(base, "")
        if rest:
            # op_name metadata tells us it lowers a dot_general; operand
            # dtypes come from each operand's own definition line
            is_dot = "/dot_general" in rest
            has_s8 = any(
                hlo_info.get(op, "").startswith(("s8[", "(s8["))
                for op in re.findall(r"%([\w.\-]+)", rest.partition("(")[2])
            )
            if is_dot and has_s8:
                return "int8 GEMM fusions (fwd/dgrad/wgrad + fused epilogues)"
            if is_dot or "convolution" in base:
                return "bf16 matmul (lm_head / embed / unquantized)"
        else:
            rest = name.partition(" = ")[2]
            if "fusion" in base and re.search(r"[(,] ?s8\[", rest):
                return "int8 GEMM fusions (fwd/dgrad/wgrad + fused epilogues)"
            if "convolution" in base or re.match(r"dot\b", base):
                return "bf16 matmul (lm_head / embed / unquantized)"
        if re.search(r"bf16\[\d+,\d+,2048,64\]|f32\[\d+,\d+,\d+,2048[,\]]", name):
            return "attention-adjacent (rope / head layouts / residual stacking)"
        return "other (elementwise, norm-bwd, loss scan, bookkeeping)"

    # Exclusive self-time: 'XLA Ops' events nest (while wrappers span the
    # per-iteration leaf ops), so walk the interval stack and subtract
    # children from their parents — the categorized totals then sum to
    # the device step time exactly.
    cats: dict[str, float] = defaultdict(float)
    ops: dict[str, float] = defaultdict(float)
    n_steps_traced = 2
    for plane in pd.planes:
        if plane.name != "/device:TPU:0":
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = sorted(line.events, key=lambda e: (e.start_ns, -e.duration_ns))
            stack: list[tuple[int, str, str]] = []
            for ev in evs:
                while stack and ev.start_ns >= stack[-1][0]:
                    stack.pop()
                if stack:
                    cats[stack[-1][1]] -= ev.duration_ns / 1e6
                    ops[stack[-1][2]] -= ev.duration_ns / 1e6
                c = category(ev.name)
                cats[c] += ev.duration_ns / 1e6
                ops[ev.name] += ev.duration_ns / 1e6
                stack.append((ev.end_ns, c, ev.name))

    print(f"trace: {path}")
    print(f"\n{'ms/step':>9}  step budget (exclusive device time)")
    for name, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        if ms > 0.05:
            print(f"{ms / n_steps_traced:9.1f}  {name}")
    print(f"{sum(cats.values()) / n_steps_traced:9.1f}  TOTAL")
    print(f"\n{'ms/step':>9}  top ops (exclusive)")
    for name, ms in sorted(ops.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{ms / n_steps_traced:9.1f}  {name[:140]}")

    # per-category op detail: the budget table says WHERE the time goes,
    # this says what each bucket is made of
    by_cat: dict[str, list[tuple[float, str]]] = defaultdict(list)
    for name, ms in ops.items():
        by_cat[category(name)].append((ms, name))
    for cat, items in sorted(by_cat.items(), key=lambda kv: -sum(m for m, _ in kv[1])):
        print(f"\n== {cat} ==")
        for ms, name in sorted(items, reverse=True)[:12]:
            if ms / n_steps_traced >= 0.3:
                print(f"{ms / n_steps_traced:9.1f}  {name[:150]}")


if __name__ == "__main__":
    main()
