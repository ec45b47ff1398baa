#!/usr/bin/env python
"""Dump the compiled decode-step HLO and count full-cache-sized copies.

The config-3 residual hunt: if XLA materializes copies of the stacked KV
pool (or stacked weights) anywhere in the decode step, each copy is
~1 GB ≈ 1.3 ms of pure HBM traffic.  This compiles the REAL decode step
(bench 7B shape, stacked + deferred int8-KV) on the attached backend and
reports every HLO instruction whose output is >64 MB, grouped by opcode —
copies/bitcasts/fusions that touch pool-sized buffers fall out directly.

python tools/hlo_copies.py [--model /tmp/bench_7b_q8.gguf] [--batch 64]
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s8": 1, "u8": 1, "s32": 4, "u32": 4,
               "pred": 1, "f16": 2, "s16": 2, "u16": 2, "f64": 8, "s64": 8}

SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def shape_bytes(sig: str) -> int:
    total = 0
    for dt, dims in SHAPE_RE.findall(sig):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="/tmp/bench_7b_q8.gguf")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--min-mb", type=float, default=64.0)
    ap.add_argument("--steps", type=int, default=1,
                    help="decode steps inside the jit (the engine chunks 8-32)")
    args = ap.parse_args()

    if not os.path.exists(args.model):
        from bench import build_config_model

        build_config_model(3)

    from booster_tpu.models import load_model
    from booster_tpu.models.llama import forward
    from booster_tpu.serving import Engine

    model = load_model(args.model,
                       weights=os.environ.get("BENCH_WEIGHTS", "auto"),
                       batch_hint=args.batch)
    B = args.batch
    eng = Engine(model, max_batch=B, max_seq=args.seq, kv_quantized=True,
                 decode_chunk=8)
    eng.init_batch_state()
    cfg = eng.cfg
    lens = jnp.full((B,), 140, jnp.int32)
    cache = dataclasses.replace(eng.cache, lengths=lens)
    tok = jnp.ones((B, 1), jnp.int32)
    n_valid = jnp.ones((B,), jnp.int32)

    def step_fn(params, cache, tok):
        def one(carry, _):
            cache, tok = carry
            logits, cache = forward(params, cfg, tok, cache, last_only=True,
                                    n_valid=n_valid)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            return (cache, nxt[:, None]), None

        (cache, tok), _ = jax.lax.scan(one, (cache, tok), None,
                                       length=args.steps)
        return cache, tok

    jfn = jax.jit(step_fn, donate_argnums=(1,))
    lowered = jfn.lower(eng.params, cache, tok)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"HLO text: {len(txt)/1e6:.1f} MB", flush=True)

    min_bytes = args.min_mb * 2**20
    by_op = collections.Counter()
    by_op_bytes = collections.Counter()
    big_lines = []
    for line in txt.splitlines():
        ls = line.strip()
        if "=" not in ls:
            continue
        rhs = ls.split("=", 1)[1].strip()
        mm = re.match(r"\(?([a-z0-9]+\[[0-9,]*\][^ ]*)\)?\s+([a-z\-]+)\(", rhs)
        if not mm:
            continue
        out_sig, opcode = mm.group(1), mm.group(2)
        b = shape_bytes(out_sig)
        if b >= min_bytes:
            by_op[opcode] += 1
            by_op_bytes[opcode] += b
            if opcode in ("copy", "transpose", "bitcast-convert", "convert",
                          "add-dependency", "all-reduce", "dynamic-slice",
                          "dynamic-update-slice", "concatenate", "broadcast"):
                big_lines.append((b, ls[:220]))

    print(f"\ninstructions with output >= {args.min_mb:.0f} MB by opcode:")
    for op, n in by_op.most_common():
        gb = by_op_bytes[op] / 2**30
        print(f"  {op:25s} x{n:3d}  {gb:7.2f} GB total")
    print(f"\nbig copies: {by_op['copy']} "
          f"({by_op_bytes['copy'] / 2**30:.2f} GB)")
    print(f"\nsuspect big instructions ({len(big_lines)}):")
    for b, ls in sorted(big_lines, reverse=True)[:24]:
        print(f"  {b/2**20:8.0f} MB  {ls}")

    # while-loop body buffer traffic hint: memory stats
    try:
        mem = compiled.memory_analysis()
        print(f"\nmemory_analysis: args {mem.argument_size_in_bytes/2**30:.2f} "
              f"GB, output {mem.output_size_in_bytes/2**30:.2f} GB, "
              f"temp {mem.temp_size_in_bytes/2**30:.2f} GB, "
              f"alias {mem.alias_size_in_bytes/2**30:.2f} GB")
    except Exception as e:  # noqa: BLE001
        print("memory_analysis unavailable:", e)


if __name__ == "__main__":
    main()
