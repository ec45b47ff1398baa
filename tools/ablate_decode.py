#!/usr/bin/env python
"""Decode-step launch-count and timing ablation (perf tooling).

Reports, for a given model shape on the current backend:
  - kernel-launch count of one compiled decode step (fusions + custom calls
    in the optimized HLO entry, scan bodies expanded per trip)
  - measured ms/step for an on-device N-step decode chunk

Used to attack the kernel-count bound (ROUND1/2 notes: ~40 us/launch through
the axon tunnel makes launch count the decode bottleneck after the MXU
weight-feed floor).

Usage: python tools/ablate_decode.py [--small] [--batch B] [--steps N]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def count_launches(hlo_text: str) -> dict:
    """Approximate device launch count from optimized HLO: every top-level
    fusion/custom-call/sort/... in the entry (and in while bodies, multiplied
    by trip count when it is a counted loop) is one launch."""
    # split into computations
    comps = {}
    cur = None
    for line in hlo_text.splitlines():
        m = re.match(r"^(ENTRY )?%?([\w\.\-]+)\s*\(.*\)\s*->", line)
        if m:
            cur = m.group(2)
            comps[cur] = {"entry": bool(m.group(1)), "ops": []}
            continue
        if cur and re.match(r"^\s+\S+ = ", line):
            op = line.split("=", 1)[1].strip()
            # the opcode is the word right before the operand list; TPU
            # layouts contain parens ("{1,0:T(8,128)}") so match the last
            # whitespace-preceded identifier followed by "("
            m2 = re.search(r"(?:^|[}\s])([a-z][\w\-]*)\(", op)
            if not m2:
                continue
            comps[cur]["ops"].append((m2.group(1), line.strip()))
    launch_kinds = ("fusion", "custom-call", "sort", "convolution", "dot",
                    "all-reduce", "all-gather", "reduce-scatter", "copy",
                    "dynamic-update-slice", "dynamic-slice", "reduce",
                    "scatter", "gather", "transpose", "concatenate", "select",
                    "broadcast", "iota", "rng-bit-generator")
    out = {}
    for name, c in comps.items():
        n = 0
        kinds = {}
        for kind, _line in c["ops"]:
            base = kind.split(".")[0]
            if base in launch_kinds:
                n += 1
                kinds[base] = kinds.get(base, 0) + 1
        out[name] = (n, kinds, c["entry"])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--kv-quant", action="store_true")
    ap.add_argument("--hlo", action="store_true", help="dump optimized HLO")
    ap.add_argument("--model", default="", help="GGUF path (default: bench 1.1B)")
    args = ap.parse_args()

    if args.model:
        path = args.model
    else:
        from bench import build_model

        path = "/tmp/bench_tinyllama_q4_0.gguf" if not args.small else "/tmp/bench_small.gguf"
        build_model(path, args.small)

    import jax
    import jax.numpy as jnp

    from booster_tpu.models import load_model
    from booster_tpu.models.llama import forward
    from booster_tpu.serving import Engine

    t0 = time.time()
    model = load_model(path, weights=os.environ.get("BT_WEIGHTS", "native"))
    print(f"loaded in {time.time()-t0:.0f}s; backend={jax.default_backend()}")

    B = args.batch
    engine = Engine(model, max_batch=B, max_seq=args.seq,
                    kv_quantized=args.kv_quant, decode_chunk=args.steps)
    engine.init_batch_state()

    # --- launch count of one decode step (forward only) ---
    cache = engine.cache
    toks = jnp.zeros((B, 1), jnp.int32)
    lowered = jax.jit(forward, static_argnames=("cfg", "last_only")).lower(
        engine.params, engine.cfg, toks, cache, last_only=True)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    if args.hlo:
        open("/tmp/decode_step.hlo", "w").write(hlo)
        print("wrote /tmp/decode_step.hlo")
    counts = count_launches(hlo)
    total_entry = 0
    for name, (n, kinds, entry) in sorted(counts.items(), key=lambda kv: -kv[1][0]):
        if n == 0:
            continue
        tag = "ENTRY" if entry else "     "
        print(f"{tag} {name}: {n} launches  {kinds}")
        if entry:
            total_entry += n
    # scan over layers shows as a while loop: body launches x n_layers
    print(f"entry-level launches: {total_entry} "
          f"(layer-scan body repeats x{engine.cfg.n_layers})")

    # --- timing: full decode chunk ---
    from booster_tpu.sampling import SamplingParams

    for s in range(B):
        engine.reset_slot(s, SamplingParams(temp=0.0), seed=s)
    prompts = {s: engine.tokenizer.encode(f"stream {s} warmup") for s in range(B)}
    first = engine.prefill_slots(prompts)
    engine.decode_slots(first, n_steps=args.steps)  # compile
    t0 = time.perf_counter()
    engine.decode_slots(first, n_steps=args.steps)
    dt = time.perf_counter() - t0
    print(f"B={B} chunk of {args.steps}: {dt*1000:.1f} ms total, "
          f"{dt*1000/args.steps:.3f} ms/step, "
          f"{B*args.steps/dt:.1f} tok/s aggregate")


if __name__ == "__main__":
    main()
