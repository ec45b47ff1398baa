#!/usr/bin/env python
"""Paged-decode in-situ cost attribution (the paged-vs-dense gap hunt).

paged_bench.py r5: dense 6.4 ms/step vs paged 14.1 ms/step at the 1.1B
64-stream shape — this measures the REAL paged forward as a scan slope with
components ablated one at a time (models/llama.set_ablate), exactly like
tools/step_residual.py does for the dense path, so the gap's owner falls
out by subtraction.  Page tables are laid out slot-major (realistic: no
cross-slot page sharing) and lengths pinned.

python tools/paged_residual.py [--variants full,attn,append,all] [--dense]
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
    "full": "",
    "attn": "attn",      # minus the paged attention kernel
    "append": "append",  # minus the deferred all-layer paged scatter
    "mlp": "mlp",
    "all": "attn,mlp,append",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="/tmp/bench_tinyllama_q4_0.gguf")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--page", type=int, default=128)
    ap.add_argument("--lens", type=int, default=140)
    ap.add_argument("--variants", default="full,attn,append,all")
    ap.add_argument("--iters", default="64,192")
    ap.add_argument("--dense", action="store_true",
                    help="measure the dense cache instead (baseline)")
    ap.add_argument("--weights", default=os.environ.get("BENCH_WEIGHTS",
                                                        "bf16"))
    args = ap.parse_args()
    iters = tuple(int(v) for v in args.iters.split(","))

    if not os.path.exists(args.model):
        from bench import build_model
        build_model(args.model, False)

    import booster_tpu.models.llama as llama_mod
    from booster_tpu.models import load_model
    from booster_tpu.models.llama import forward
    from booster_tpu.serving import Engine

    import time as _t

    t0 = _t.time()
    model = load_model(args.model, weights=args.weights,
                       batch_hint=args.batch)
    B = args.batch
    eng = Engine(model, max_batch=B, max_seq=args.seq, kv_quantized=True,
                 paged=not args.dense, page_size=args.page, decode_chunk=8)
    eng.init_batch_state()
    cfg = eng.cfg
    print(f"backend={jax.default_backend()} paged={not args.dense} "
          f"loaded in {_t.time()-t0:.0f}s", flush=True)

    lens = jnp.full((B,), args.lens, jnp.int32)
    if args.dense:
        base_cache = dataclasses.replace(eng.cache, lengths=lens)
    else:
        maxp = eng.cache.table.shape[1]
        tbl = jnp.asarray(
            np.arange(B * maxp, dtype=np.int32).reshape(B, maxp)
            % eng.cache.n_pages)
        base_cache = dataclasses.replace(eng.cache, lengths=lens, table=tbl)
    tok = jnp.ones((B, 1), jnp.int32)
    n_valid = jnp.ones((B,), jnp.int32)

    results = {}
    for name in args.variants.split(","):
        llama_mod.set_ablate(VARIANTS[name])
        jax.clear_caches()

        def step(carry, params):
            cache, tok = carry
            logits, cache = forward(params, cfg, tok, cache, last_only=True,
                                    n_valid=n_valid)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            cache = dataclasses.replace(cache, lengths=lens)  # pin window
            return (cache, nxt[:, None])

        dt = timeit(f"step[{name}]", step, (base_cache, tok), eng.params,
                    iters=iters)
        if dt:
            results[name] = dt * 1e3
            print(f"step[{name:8s}]: {dt*1e3:7.3f} ms  "
                  f"({B/dt:.0f} tok/s agg)", flush=True)

    llama_mod.set_ablate("")
    if "full" in results:
        full = results["full"]
        for name, ms in results.items():
            if name != "full":
                print(f"in-situ {name}: {full - ms:+.3f} ms", flush=True)


if __name__ == "__main__":
    main()
