#!/usr/bin/env python
"""On-chip A/B of the decode-attention kernels: merged block-diagonal dot
vs the per-b unroll, at the bench decode shape (ROUND2_NOTES deferred item:
the unroll was sized at 30-50% of attention time at B=64)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from tools.kernel_micro import timeit

import booster_tpu.ops.pallas_attention as pa


def main():
    L, B, H, Hkv, S, D = 22, 64, 32, 4, 512, 128
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())

    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.bfloat16)
    lens = jnp.full((B,), S // 2, jnp.int32)
    newk = jnp.asarray(rng.normal(size=(B, Hkv, D)), jnp.bfloat16)
    self_ok = jnp.ones((B,), bool)

    for quant in (True, False):
        if quant:
            kc = jnp.asarray(rng.integers(-127, 127, (L, B, Hkv, S, D)), jnp.int8)
            vc = jnp.asarray(rng.integers(-127, 127, (L, B, Hkv, S, D)), jnp.int8)
            ks = jnp.asarray(rng.random((L, B, Hkv, S, 1)), jnp.float32)
            vs = jnp.asarray(rng.random((L, B, Hkv, S, 1)), jnp.float32)
        else:
            kc = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.bfloat16)
            vc = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.bfloat16)
            ks = vs = None

        import itertools

        cases = [(False, 8, 512), (True, 8, 512), (True, 4, 512)]
        for merged, bt, st in cases:
            if B % bt:
                continue
            pa._MERGED = merged
            pa._BT, pa._ST = bt, st
            name = (f"{'int8' if quant else 'bf16'} "
                    f"{'merged' if merged else 'unroll'} bt={bt} st={st}")
            if merged and pa._vmem_merged(bt, st, D, H // Hkv,
                                          1 if quant else 2) > pa._MERGED_LIMIT:
                print(f"{name}: skipped (vmem model)", flush=True)
                continue

            # caches passed as loop ARGS, never closures: jit constants of
            # this size hit the remote-compile 413 limit (CLAUDE.md)
            def attn_step(qc, kc, vc, ks, vs):
                out = pa.decode_attention_stacked(
                    qc, kc, vc, ks, vs, jnp.int32(3), lens, scale=0.125,
                    self_kv=(newk, newk, self_ok))
                return out.astype(qc.dtype)

            print(f"compiling {name} ...", flush=True)
            try:
                # fresh carry each case: timeit donates it
                qf = jnp.asarray(np.asarray(q), jnp.bfloat16)
                timeit(name, attn_step, qf, kc, vc, ks, vs, iters=512)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILED {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
