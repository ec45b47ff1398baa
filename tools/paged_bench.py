#!/usr/bin/env python
"""Paged vs dense KV cache at 64 streams (VERDICT r3 #6 / r4 next #1).

Runs bench.bench_batch-style decode on the 1.1B bench model: dense int8
cache vs the paged pool at the engine's default page size (256) and at 128,
same slots/steps.  r5 rework receipts (merged head-DMA kernel + fused
table-steered append + prep hoisting): paged/dense 1.00x at P=256,
0.81x at P=128 (per-page DMA issue cost; tools/paged_residual.py).

Exits nonzero if any leg crashes — run with `set -o pipefail` when piping.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")


def run(paged: bool, n_streams=64, n_tokens=128, kv_quant=True,
        page_size=256):
    from booster_tpu.models import load_model
    from booster_tpu.sampling import SamplingParams
    from booster_tpu.serving import Engine

    from bench import build_model

    path = "/tmp/bench_tinyllama_q4_0.gguf"
    build_model(path, False)
    model = load_model(path, weights="bf16")
    engine = Engine(model, max_batch=n_streams, max_seq=512,
                    kv_quantized=kv_quant,
                    paged=paged, page_size=page_size, decode_chunk=32)
    engine.init_batch_state()
    prompts = {}
    for s in range(n_streams):
        engine.reset_slot(s, SamplingParams(temp=0.8, top_k=40, seed=s),
                          seed=s)
        prompts[s] = engine.tokenizer.encode(f"stream {s} benchmark prompt")
    first = engine.prefill_slots(prompts)
    engine.decode_slots(first, n_steps=32)  # compile
    slots = list(prompts)
    t0 = time.perf_counter()
    done, steps = 0, 0
    handle = engine.decode_slots_start(slots, n_steps=32)
    while steps + 32 < n_tokens:
        nxt = engine.decode_slots_start(slots, n_steps=32)
        toks, _ = engine.decode_slots_finish(handle)
        done += sum(len(r) for r in toks.values())
        handle = nxt
        steps += 32
    toks, _ = engine.decode_slots_finish(handle)
    done += sum(len(r) for r in toks.values())
    dt = time.perf_counter() - t0
    return done / dt


def main():
    dense = run(False)
    print(f"dense int8 KV 64 streams: {dense:.1f} tok/s aggregate",
          flush=True)
    results = {"dense": round(dense, 1)}
    for p in (256, 128):
        paged = run(True, page_size=p)
        print(f"paged (int8 pool, P={p}) 64 streams: {paged:.1f} tok/s "
              f"aggregate  (paged/dense = {paged / dense:.2f})", flush=True)
        results[f"paged_p{p}"] = round(paged, 1)
        results[f"ratio_p{p}"] = round(paged / dense, 3)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
