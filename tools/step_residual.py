#!/usr/bin/env python
"""In-situ decode-step cost attribution (the config-3 residual hunt).

tools/step_breakdown.py times components back-to-back; their sum (~19 ms)
never matched the measured step (~24 ms).  This measures the REAL forward
(stacked + deferred int8-KV decode on the bench 7B shape) as a scan slope,
with components removed one at a time via models/llama.set_ablate, so each
component's in-situ cost — including overlap and relayout effects invisible
to back-to-back timing — falls out by subtraction.  Cache lengths are
pinned so every iteration is identical.  All variants run in ONE process
(the 7B load through the axon tunnel is ~10 min; jax.clear_caches between
variants forces the retrace that picks up the ablation flag).

python tools/step_residual.py [--variants full,sampler,attn,mlp,all]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from tools.qmm_clean import timeit

VARIANTS = {
    "full": ("", False),          # the real step, argmax token select
    "sampler": ("", True),        # + the real vectorized sampler
    "attn": ("attn", False),      # minus the attention kernel
    "mlp": ("mlp", False),        # minus gate/up/down matmuls
    "append": ("append", False),  # minus the deferred all-layer append
    "all": ("attn,mlp,append", False),  # qkv/wo matmuls + norms + glue only
    # pairwise removals: r4 found single-component sums (~15.2 ms) well
    # short of the full step (~20 ms) — these triangulate which pair
    # carries the ~4.8 ms interaction term
    "attn+mlp": ("attn,mlp", False),      # append + glue remain
    "attn+append": ("attn,append", False),  # mlp + glue remain
    "mlp+append": ("mlp,append", False),    # attn + glue remain
}

# env-flip variants: the r4 pairwise run localized a ~4.1 ms attn×mlp
# interaction (both present cost more than their in-situ sums) — these
# swap the attention implementation to find whether a specific pallas
# kernel carries the coupling
ENV_VARIANTS = {
    "xla_attn": {"BT_FUSED_ATTN": "0"},      # XLA attention, pallas mlp
    "unmerged": {"BT_ATTN_MERGED": "0"},     # per-b attention dots
    "nodefer": {"BT_DEFER_KV": "0"},         # per-layer append
    "nostackc": {"BT_STACKED": "0"},         # no stacked-cache carry
    "nogateup": {"BT_FUSED_GATEUP": "0"},    # unfused act·mul (r4 kernel off)
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="/tmp/bench_7b_q8.gguf")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--lens", type=int, default=140)
    ap.add_argument("--variants", default="full,sampler,attn,mlp,append,all")
    ap.add_argument("--iters", default="64,192")
    ap.add_argument("--kv-quant", type=int, default=1, dest="kv_quant",
                    help="0 = bf16 KV (the config-1 single-stream setup)")
    args = ap.parse_args()
    iters = tuple(int(v) for v in args.iters.split(","))

    if not os.path.exists(args.model):
        from bench import build_config_model, build_model

        if args.model == "/tmp/bench_tinyllama_q4_0.gguf":
            build_model(args.model, False)
        else:
            build_config_model(3)

    import booster_tpu.models.llama as llama_mod
    from booster_tpu.models import load_model
    from booster_tpu.models.llama import forward
    from booster_tpu.sampling import SamplingParams
    from booster_tpu.sampling.samplers import make_sampler_state
    from booster_tpu.sampling.vector import VectorSampling, sample_vectorized
    from booster_tpu.serving import Engine

    import time as _t

    t0 = _t.time()
    model = load_model(args.model,
                       weights=os.environ.get("BENCH_WEIGHTS", "auto"),
                       batch_hint=args.batch)
    B = args.batch
    eng = Engine(model, max_batch=B, max_seq=args.seq,
                 kv_quantized=bool(args.kv_quant),
                 decode_chunk=8)
    eng.init_batch_state()
    cfg = eng.cfg
    print(f"backend={jax.default_backend()} loaded in {_t.time()-t0:.0f}s",
          flush=True)

    lens = jnp.full((B,), args.lens, jnp.int32)
    base_cache = dataclasses.replace(eng.cache, lengths=lens)
    tok = jnp.ones((B, 1), jnp.int32)
    n_valid = jnp.ones((B,), jnp.int32)

    vp = VectorSampling.from_params(
        [SamplingParams(temp=0.8, top_k=40, seed=i) for i in range(B)])
    state = make_sampler_state(B, 256, seed=0)
    feats = ("nopenalties",)
    results = {}

    for name in args.variants.split(","):
        env = {}
        if name in ENV_VARIANTS:
            env = ENV_VARIANTS[name]
            ablate, use_sampler = "", False
        else:
            ablate, use_sampler = VARIANTS[name]
        llama_mod.set_ablate(ablate)
        for k, v in env.items():
            os.environ[k] = v
        jax.clear_caches()

        def step(carry, params, vp, use_sampler=use_sampler):
            cache, tok, state = carry
            logits, cache = forward(params, cfg, tok, cache, last_only=True,
                                    n_valid=n_valid)
            lg = logits[:, -1, :]
            if use_sampler:
                nxt, state = sample_vectorized(lg, state, vp, features=feats)
            else:
                nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            # pin lengths so every iteration attends the same window
            cache = dataclasses.replace(cache, lengths=lens)
            return (cache, nxt[:, None], state)

        dt = timeit(f"step[{name}]", step, (base_cache, tok, state),
                    eng.params, vp, iters=iters)
        for k in env:
            os.environ.pop(k, None)
        if dt:
            results[name] = dt * 1e3
            print(f"step[{name:8s}]: {dt*1e3:7.3f} ms  "
                  f"({B/dt:.0f} tok/s agg)", flush=True)

    llama_mod.set_ablate("")
    if "full" in results:
        full = results["full"]
        for name, ms in results.items():
            if name not in ("full", "sampler"):
                print(f"in-situ {name}: {full - ms:+.3f} ms", flush=True)
        if "sampler" in results:
            print(f"in-situ sampler: {results['sampler'] - full:+.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
