"""Headline benchmark: INT8 mixed-precision Llama pretrain tokens/s/chip.

Mirrors the reference's benchmark methodology (README.md:123-137,
llm_pretrain.py:228-237 tokens/sec logging): Llama-1B-class model at
seq_len 2048 and EFFECTIVE BATCH 16 — the reference's benchmark batch —
full train step (fwd + bwd + AdamW), INT8 dynamic row-wise quantization
on the forward and BOTH backward matmuls vs the BF16 baseline. The
effective batch runs as 4 x bs4 gradient accumulation, IDENTICALLY for
both configs (a single-batch bs16 program exceeds this environment's
remote-compile helper; symmetric accumulation is the faithful proxy and
is how an effective batch beyond device memory actually trains). Grads
accumulate in the GRAD dtype (reference semantics) — round 4's fp32
accumulator pushed the bf16 program into XLA's memory-pressure
rematerialization (+270 ms/step of re-run forward GEMMs) and inflated
the ratio to 1.41x; on the fixed path accumulation helps BOTH configs
and the honest ratio is ~1.25x (r5: int8 ~17.7k vs bf16 ~14.2k in the
ladder run; profile audit in README "Per-op step budget").

Timing note: sustained throughput — N steps dispatched back-to-back
(donated state) with one loss readback at the end, the way a real
training loop runs; a per-step-synced loop is timed as a cross-check and
the faster of the two is used (each readback costs ~25 ms through this
environment's remote-execution tunnel, so the synced loop is a lower
bound for both configs). A device-side lax.scan over train steps would
need no readbacks at all but crashes the environment's remote compile
helper at 1B scale.

Prints ONE JSON line:
  value        = INT8-MP training tokens/sec on this chip
  vs_baseline  = (our INT8/BF16 speedup) / 1.68   [the reference's best
                 INT8-vs-BF16 speedup on its own hardware, README.md:134]

Diagnostics go to stderr.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N_STEPS = 8


def build_step(cfg_name: str, bs: int, seq: int, scheme: str | None,
               accum: int = 1):
    import dataclasses

    from quantized_training_tpu import optim, quant
    from quantized_training_tpu.models import llama
    from quantized_training_tpu.train import init_train_state, make_train_step

    cfg = {"llama2-1b": llama.LLAMA2_1B, "llama2-470m": llama.LLAMA2_470M}[cfg_name]
    cfg = dataclasses.replace(cfg, max_position_embeddings=seq, remat=True)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_params(params, scheme)
    optimizer = optim.adamw_bf16_sr(bf16_stochastic_rounding=False)
    state = init_train_state(qparams, optimizer)
    step_fn = make_train_step(cfg, optimizer)  # jitted, donated state
    shape = (accum, bs, seq) if accum > 1 else (bs, seq)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), shape, 0, cfg.vocab_size, dtype=jnp.int32
    )
    labels = jnp.roll(tokens, -1, axis=-1)
    return state, step_fn, tokens, labels


def measure(cfg_name: str, bs: int, seq: int, scheme: str | None,
            accum: int = 1) -> float:
    """Sustained-throughput timing: dispatch N_STEPS train steps
    back-to-back (state donated step-to-step) with ONE loss readback at
    the end — how a real training loop runs (llm_pretrain syncs only at
    log intervals), and how the reference's tok/s logging behaves under
    CUDA async dispatch. A per-step-synced loop is also timed as a
    cross-check: each readback costs ~25 ms through this environment's
    remote-execution tunnel, inflating BOTH configs' step times, so the
    synced rate is a lower bound. The faster of the two is reported; if
    chained dispatch did not pipeline (tunnel serialization), the two
    match and the synced number stands. (A device-side scan over steps
    would need no readbacks at all but crashes this environment's remote
    compile helper at 1B scale.)"""
    t0 = time.perf_counter()
    state, step_fn, tokens, labels = build_step(cfg_name, bs, seq, scheme, accum)
    key = jax.random.PRNGKey(2)
    for i in range(2):  # compile + warm
        state, m = step_fn(state, tokens, labels, 1e-4, jax.random.fold_in(key, i))
        l0 = float(m["loss"])
    log(f"  compile+warm {time.perf_counter() - t0:.0f}s, loss={l0:.3f}")
    t0 = time.perf_counter()
    for i in range(N_STEPS):
        state, m = step_fn(
            state, tokens, labels, 1e-4, jax.random.fold_in(key, 100 + i)
        )
        l1 = float(m["loss"])  # sync every step
    dt_synced = (time.perf_counter() - t0) / N_STEPS
    assert jnp.isfinite(l1), l1
    t0 = time.perf_counter()
    for i in range(N_STEPS):
        state, m = step_fn(
            state, tokens, labels, 1e-4, jax.random.fold_in(key, 200 + i)
        )
    l2 = float(m["loss"])  # single sync for the whole chain
    dt_chained = (time.perf_counter() - t0) / N_STEPS
    assert jnp.isfinite(l2), l2
    log(
        f"  per-step: synced {dt_synced * 1e3:.1f} ms, "
        f"chained {dt_chained * 1e3:.1f} ms"
    )
    return accum * bs * seq / min(dt_synced, dt_chained)


def try_measure(configs, scheme):
    """configs: list of (cfg_name, bs, seq, accum); first success wins.

    Compile is minutes per program through this environment's remote
    tunnel (mitigated by the persistent cache), so attempts are precious.
    """
    for cfg_name, bs, seq, accum in configs:
        tag = f"{cfg_name} bs={bs}x{accum} {scheme or 'bf16'}"
        try:
            log(f"measuring {tag} ...")
            toks = measure(cfg_name, bs, seq, scheme, accum)
            log(f"{tag}: {toks:,.0f} tok/s")
            return toks, (cfg_name, bs, seq, accum)
        except Exception as e:  # OOM or compile failure -> next config
            log(f"{tag}: {type(e).__name__}: {str(e)[:160]}")
    return None, None


def main():
    seq = 2048
    # Headline config: EFFECTIVE BATCH 16 — the reference's own benchmark
    # batch (README.md:125) — as 4 x bs4 gradient accumulation, identical
    # for the int8 and bf16 measurements. A single-batch bs16 program (and
    # the 2 x bs8 bf16 program) exceeds this environment's remote-compile
    # helper, so symmetric accumulation is the faithful proxy; it is also
    # how an effective batch above device memory actually trains. Fallback
    # rungs keep the old single-batch bs8 headline measurable.
    configs = [
        ("llama2-1b", 4, seq, 4),
        ("llama2-1b", 8, seq, 1),
        ("llama2-1b", 4, seq, 1),
        ("llama2-470m", 8, seq, 1),
    ]

    # persistent compilation cache: the int8 program's one-time compile is
    # the dominant fixed cost through this environment's remote tunnel
    # (60-170 s vs ~10 s bf16); cached reruns skip it entirely
    try:
        import os

        cache = os.environ.get("QT_COMPILE_CACHE", "/tmp/qt_xla_cache")
        if cache:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:
        log(f"persistent compile cache unavailable: {e}")

    log(f"benchmarking on {jax.devices()[0].device_kind}")
    int8_toks, chosen = try_measure(configs, "mixed_precision")
    if int8_toks is None:
        # safety net: if the producer-fused kernels (QT_FUSED default on)
        # hit a compile wall on this backend, fall back to the unfused
        # quantize path rather than reporting nothing
        import os

        log("retrying with QT_FUSED=0 (unfused producer path)")
        os.environ["QT_FUSED"] = "0"
        int8_toks, chosen = try_measure(configs, "mixed_precision")
    if int8_toks is None:
        log("FATAL: could not measure int8 mixed-precision at any config")
        sys.exit(1)
    cfg_name, bs, seq, accum = chosen
    bf16_toks, _ = try_measure([chosen], None)

    speedup = int8_toks / bf16_toks if bf16_toks else float("nan")
    log(
        f"RESULT {cfg_name} bs={bs}x{accum} (eff {bs * accum}): "
        f"bf16={bf16_toks:,.0f} tok/s  "
        f"int8_mp={int8_toks:,.0f} tok/s  speedup={speedup:.3f}x "
        f"(reference best: 1.68x at bs16)"
    )
    print(
        json.dumps(
            {
                "metric": f"{cfg_name}_int8_mixed_precision_train_tokens_per_sec_per_chip",
                "value": round(int8_toks, 1),
                "unit": "tok/s",
                "vs_baseline": round(speedup / 1.68, 4),
                "detail": {
                    "bf16_tokens_per_sec": round(bf16_toks, 1) if bf16_toks else None,
                    "int8_vs_bf16_speedup": round(speedup, 4),
                    "batch_size": bs,
                    "grad_accum": accum,
                    "effective_batch": bs * accum,
                    "seq_len": seq,
                    "device": str(jax.devices()[0].device_kind),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
