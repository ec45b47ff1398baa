#!/usr/bin/env python
"""Paged vs dense KV cache at 64 streams (VERDICT r3 #6: 'exists' != 'usable
at the perf bar' — measure the gap).  Runs bench.bench_batch twice on the
1.1B bench model: dense int8 cache vs paged pool, same slots/steps."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")


def run(paged: bool, n_streams=64, n_tokens=128, kv_quant=True):
    import numpy as np

    from booster_tpu.models import load_model
    from booster_tpu.sampling import SamplingParams
    from booster_tpu.serving import Engine

    from bench import build_model

    path = "/tmp/bench_tinyllama_q4_0.gguf"
    build_model(path, False)
    model = load_model(path, weights="bf16")
    engine = Engine(model, max_batch=n_streams, max_seq=512,
                    kv_quantized=kv_quant,
                    paged=paged, page_size=128, decode_chunk=32)
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
    paged = run(True)
    print(f"paged (int8 pool, P=128) 64 streams: {paged:.1f} tok/s aggregate",
          flush=True)
    print(f"paged/dense = {paged / dense:.2f}", flush=True)


if __name__ == "__main__":
    main()
