#!/usr/bin/env python
"""Speculative decoding on the real chip (VERDICT r3 #6: built and
parity-tested, zero TPU perf numbers).

Measures single-stream decode tok/s on the config-2 shape (8B-shape
Q4_K_M target) with and without a draft, plus the batched SpecBatch path
at 8 streams.  Two draft regimes bracket reality on synthetic weights:

  - self-draft (draft == target file, acceptance ≈ 1): the upper bound —
    what the speculative machinery can deliver when the draft agrees;
    isolates the verify/propose overhead.
  - tiny random draft (2-layer, same vocab): the lower bound — random
    weights make draft/target argmaxes nearly independent, so acceptance
    is degenerate-low (real checkpoints sit in between; the number to
    watch is that the low-acceptance case does not fall far below the
    non-speculative baseline).

Usage: python tools/spec_bench.py [--tokens 96] [--k 8] [--streams 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def tiny_draft_path(vocab: int) -> str:
    from tools.make_test_model import make_model

    path = f"/tmp/spec_draft_tiny_v{vocab}.gguf"
    if not os.path.exists(path):
        make_model(path, vocab_size=vocab, hidden=512, layers=2, heads=8,
                   kv_heads=4, ff=1024)
    return path


def bench_single(target, draft, ids, sp, n_tokens, k, label, oracle=None):
    from booster_tpu.serving.speculative import (generate_lookup_chained,
                                                 generate_speculative)

    def run():
        if draft is None:
            return target.generate(ids, sp, max_new_tokens=n_tokens)
        if draft == "lookup":
            return generate_lookup_chained(
                target, ids, max_new_tokens=n_tokens, k=k, oracle=oracle)
        return generate_speculative(target, draft, ids, sampling=sp,
                                    max_new_tokens=n_tokens, k=k)

    run()  # warmup/compile
    runs = [run() for _ in range(3)]
    tps = sorted(1000.0 / r.gen_ms_per_token for r in runs)[1]
    acc = getattr(runs[-1], "acceptance_rate", None)
    print(f"{label}: {tps:.1f} tok/s"
          + (f"  acceptance={acc:.2f} (of k={k} drafted/round)"
             if acc is not None else ""), flush=True)
    return {"tps": round(tps, 1),
            "acceptance": None if acc is None else round(acc, 3)}


def bench_batch_spec(model, draft_model, n_streams, n_tokens, k):
    """SpecBatch (all slots propose+verify per round) vs plain batch."""
    from booster_tpu.sampling import SamplingParams
    from booster_tpu.serving import Engine
    from booster_tpu.serving.spec_batch import SpecBatch

    eng = Engine(model, max_batch=n_streams, max_seq=512, kv_quantized=True)
    eng.init_batch_state()
    dr = None
    if draft_model is not None:
        de = Engine(draft_model, max_batch=n_streams, max_seq=512)
        dr = SpecBatch(eng, de, k=k)
    prompts = {}
    for s in range(n_streams):
        eng.reset_slot(s, SamplingParams(temp=0.0), seed=s)
        if dr is not None:
            dr.reset_slot(s, s)
        prompts[s] = eng.tokenizer.encode(f"stream {s} spec benchmark")
    first = eng.prefill_slots(prompts)
    if dr is not None:
        dr.prefill_draft(prompts)
        for s, t in first.items():
            dr.seed_first_token(s, t)
    slots = list(prompts)
    done = 0

    def round_once():
        nonlocal done
        if dr is not None:
            toks, _ = dr.finish(dr.start(slots))
        else:
            toks, _ = eng.decode_slots(dict.fromkeys(slots, 1), n_steps=8)
        done += sum(len(r) for r in toks.values())

    round_once()  # compile
    done = 0
    t0 = time.perf_counter()
    while done < n_tokens * n_streams:
        round_once()
    dt = time.perf_counter() - t0
    return done / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=96)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--skip-batch", action="store_true")
    args = ap.parse_args()

    from bench import build_config_model
    from booster_tpu.models import load_model
    from booster_tpu.sampling import SamplingParams
    from booster_tpu.serving import Engine

    path = build_config_model(2)  # 8B-shape Q4_K_M
    t0 = time.time()
    model = load_model(path, weights="auto", batch_hint=1)
    print(f"target loaded in {time.time()-t0:.0f}s", flush=True)
    target = Engine(model, max_batch=1, max_seq=2048, decode_chunk=args.k)
    ids = target.tokenizer.encode("benchmark " * 12)
    sp = SamplingParams(temp=0.0)

    results = {}
    results["baseline"] = bench_single(
        target, None, ids, sp, args.tokens, args.k, "no-spec baseline")

    # prompt-lookup decoding: free n-gram draft, device-chained rounds.
    # Synthetic random weights generate non-repeating text (acceptance ~0
    # here) — this leg measures the machinery's WORST case; extractive/
    # templated text on real checkpoints is its best case.
    results["lookup"] = bench_single(
        target, "lookup", ids, sp, args.tokens, args.k,
        "prompt-lookup, no matches (machinery floor)")

    # acceptance-1 ceiling: propose the target's own recorded greedy
    # continuation (oracle) through the same chained verifier — what
    # lookup/spec delivers when the draft is right
    plain = target.generate(ids, sp, max_new_tokens=args.tokens)
    results["oracle"] = bench_single(
        target, "lookup", ids, sp, args.tokens, args.k,
        "oracle draft (acceptance-1 ceiling)", oracle=plain.token_ids)

    draft_model = load_model(tiny_draft_path(model.cfg.n_vocab))
    draft = Engine(draft_model, max_batch=1, max_seq=2048)
    results["tiny_draft"] = bench_single(
        target, draft, ids, sp, args.tokens, args.k,
        "spec, tiny random draft (acceptance lower bound)")

    self_draft = Engine(model, max_batch=1, max_seq=2048)
    results["self_draft"] = bench_single(
        target, self_draft, ids, sp, args.tokens, args.k,
        "spec, self-draft (acceptance upper bound)")

    if not args.skip_batch:
        agg0 = bench_batch_spec(model, None, args.streams, 64, args.k)
        print(f"batch {args.streams} streams, no spec: {agg0:.1f} tok/s agg",
              flush=True)
        agg1 = bench_batch_spec(model, draft_model, args.streams, 64, args.k)
        print(f"batch {args.streams} streams, tiny draft: {agg1:.1f} tok/s agg",
              flush=True)
        results["batch"] = {"streams": args.streams,
                            "no_spec": round(agg0, 1),
                            "tiny_draft": round(agg1, 1)}

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
