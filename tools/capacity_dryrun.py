#!/usr/bin/env python
"""Capacity-plan artifacts for the big-model driver configs (VERDICT r3 #7).

SCALING.md §3's per-chip HBM numbers for config 4 (Gemma-2-27B Q5_K) and
config 5 (Llama-3-70B Q4_K_M) were arithmetic.  This runs 2-layer
truncations of both *shapes* through the real tp=8 sharded load + decode
step on the 8-device virtual CPU mesh (K-major quantized weights per
PARAM_SPECS + int8 KV), measures the actual per-device bytes of every
sharded leaf, and extrapolates to the full layer count — so the capacity
table cites a run, not just a model.

Reference analog: layer/row split placement decides the same budget,
/root/reference/cpp/src/llama.cpp:5932-5995.

Shape notes:
  - llama-arch truncations with the real explicit head_dim (128 for both
    configs, via llama.attention.key_length).
  - vocab is built at 32000; the embedding (replicated, bf16) and lm_head
    (vocab-sharded) contributions are rescaled to the real vocab using the
    measured per-row bytes.
  - weights load `native` (the capacity plan keeps the quantized stream
    quantized in HBM).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python tools/capacity_dryrun.py [--out CAPACITY.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon site hook re-registers the TPU platform even under
# JAX_PLATFORMS=cpu — force via jax.config BEFORE first backend use
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

GIB = float(1 << 30)

CONFIGS = {
    "config4_gemma2_27b_q5k": dict(
        vocab=32000, real_vocab=256128, hidden=4608, ff=36864,
        heads=32, kv_heads=16, head_dim=128, layers_full=46, quant="Q5_K",
        arith_gib_per_chip_tp8=2.18,  # SCALING.md §2 table
    ),
    "config5_llama3_70b_q4km": dict(
        vocab=32000, real_vocab=128256, hidden=8192, ff=28672,
        heads=64, kv_heads=8, head_dim=128, layers_full=80, quant="Q4_K",
        arith_gib_per_chip_tp8=4.98,
    ),
}


def bytes_on_device(tree, dev) -> int:
    total = 0
    for leaf in jax.tree.leaves(tree):
        if leaf is None or not hasattr(leaf, "addressable_shards"):
            continue
        total += sum(sh.data.nbytes for sh in leaf.addressable_shards
                     if sh.device == dev)
    return total


def run_config(name: str, spec: dict, tp: int = 8) -> dict:
    from booster_tpu.gguf import GGMLType
    from booster_tpu.models import load_model
    from booster_tpu.models.llama import forward
    from booster_tpu.ops.kv_cache import KVCache
    from booster_tpu.parallel import make_device_put, make_mesh, shard_cache
    from tools.make_test_model import make_model

    path = os.path.join(tempfile.gettempdir(), f"cap_{name}.gguf")
    if not os.path.exists(path):
        make_model(path, vocab_size=spec["vocab"], hidden=spec["hidden"],
                   layers=2, heads=spec["heads"], kv_heads=spec["kv_heads"],
                   ff=spec["ff"], quant=getattr(GGMLType, spec["quant"]),
                   head_dim=spec.get("head_dim", 0))
    mesh = make_mesh(tp, tp=tp, dp=1)
    dev0 = mesh.devices.ravel()[0]
    with jax.set_mesh(mesh):
        # native: the capacity plan assumes the quantized stream stays
        # quantized in HBM (auto would repack small models to bf16)
        m = load_model(path, device_put=make_device_put(mesh),
                       weights="native")
        cfg = m.cfg
        # measured per-device bytes, split into per-layer vs global weights
        layer_b = bytes_on_device(m.params["layers"], dev0)
        emb_b = bytes_on_device(m.params["tok_embd"], dev0)
        head_b = bytes_on_device(m.params["output"], dev0)
        glob_b = (bytes_on_device(m.params, dev0) - layer_b - emb_b - head_b)

        # decode-step temp memory on the sharded plan (int8 KV, B=8 probe)
        B, S = 8, 64
        cache = shard_cache(
            KVCache.create(cfg.n_layers, B, S, cfg.n_kv_heads, cfg.head_dim,
                           quantized=True), mesh)
        cache_b = bytes_on_device(cache, dev0)
        tok = jnp.ones((B, 1), jnp.int32)
        step = jax.jit(lambda p, c, t: forward(p, cfg, t, c, last_only=True))
        compiled = step.lower(m.params, cache, tok).compile()
        logits, _ = compiled(m.params, cache, tok)
        logits.block_until_ready()
        try:
            ma = compiled.memory_analysis()
            temp_b = int(getattr(ma, "temp_size_in_bytes", 0))
        except Exception:
            temp_b = 0

    L = spec["layers_full"]
    vocab_scale = spec["real_vocab"] / spec["vocab"]
    weights_full = (layer_b * (L / cfg.n_layers)
                    + emb_b * vocab_scale + head_b * vocab_scale + glob_b)
    # serving KV: per-slot @ 8K int8 (measured probe scaled by layers ×
    # context), and the slot count that fits in the remaining HBM
    kv_slot = cache_b * (L / cfg.n_layers) * (8192 / S) / B
    hbm = 16 * GIB
    slots_fit = int((hbm * 0.92 - weights_full) // kv_slot)
    out = {
        "tp": tp,
        "layers_measured": int(cfg.n_layers),
        "layers_full": L,
        "head_dim": int(cfg.head_dim),
        "weights_gib_per_chip": round(weights_full / GIB, 2),
        "kv_slot8k_gib_per_chip": round(kv_slot / GIB, 3),
        "kv64x8k_gib_per_chip": round(kv_slot * 64 / GIB, 2),
        "slots8k_fit_16gib": slots_fit,
        "decode_temp_mib_per_chip": round(temp_b / (1 << 20), 1),
        "scaling_md_arith_gib": spec["arith_gib_per_chip_tp8"],
        "weights_fit_16gib_v5e": bool(weights_full / GIB < 16.0),
        "measured_layer_gib_per_chip_2l": round(layer_b / GIB, 3),
        "embed_gib_real_vocab": round(emb_b * vocab_scale / GIB, 3),
        "lm_head_gib_per_chip_real_vocab": round(head_b * vocab_scale / GIB, 3),
    }
    print(f"{name}: {json.dumps(out)}", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--tp", type=int, default=8)
    args = ap.parse_args()
    results = {}
    for name, spec in CONFIGS.items():
        results[name] = run_config(name, spec, tp=args.tp)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
