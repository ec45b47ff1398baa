#!/usr/bin/env python
"""Standalone on-device microbenches for the decode-step kernels.

Times each hot kernel in an N-iteration on-device lax.scan loop (the axon
tunnel makes per-dispatch timing meaningless), isolating where the decode
step's time actually goes: fused attention, fused KV append, and the qmm
matvecs, at the bench model's B=64 shape.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=2048):
    """fn must be (carry, *args) -> carry with donated carry semantics."""
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def loop(carry, rest):
        def body(c, _):
            return fn(c, *rest), None
        c, _ = jax.lax.scan(body, carry, None, length=iters)
        return c

    def force(c):
        # block_until_ready may not block through the axon tunnel: fetch a
        # scalar to force completion (CLAUDE.md measurement rule)
        leaf = jax.tree.leaves(c)[0]
        np.asarray(leaf.ravel()[0])

    carry = args[0]
    rest = args[1:]
    carry = loop(carry, rest)  # compile + warm
    force(carry)
    t0 = time.perf_counter()
    carry = loop(carry, rest)
    force(carry)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e6:.1f} us/iter")
    return dt


def main():
    L, B, H, Hkv, S, D = 22, 64, 32, 4, 512, 128
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())

    from booster_tpu.ops.pallas_attention import decode_attention_stacked
    from booster_tpu.ops.pallas_kv import kv_append_decode_stacked

    # scan-iteration floor: how much of each "us/iter" is loop overhead
    xsmall = jnp.zeros((8, 128), jnp.float32)
    timeit("identity (loop floor)", lambda c: c + 1.0, xsmall)

    # raw HBM read rate: pallas kernel that reduces a [11264, 1024] u8 array
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    big = jnp.asarray(rng.integers(0, 255, (11264, 1024)), jnp.uint8)

    def _read_kernel(w_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += jnp.sum(w_ref[:].astype(jnp.int32), axis=0,
                              keepdims=True).astype(jnp.float32)

    def read_step(acc, big, bn=1024):
        out = pl.pallas_call(
            _read_kernel,
            grid=(11264 // bn,),
            in_specs=[pl.BlockSpec((bn, 1024), lambda n: (n, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1024), lambda n: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.float32),
        )(big)
        return acc + out[0, :128].reshape(1, 128)

    dt = timeit("raw u8 read 11.5MB (pallas)", read_step,
                jnp.zeros((1, 128), jnp.float32), big)
    print(f"  -> {11264 * 1024 / dt / 1e9:.1f} GB/s")

    # XLA reference: dense bf16 matvec at the gateup shape
    wd = jnp.asarray(rng.normal(size=(11264, 2048)), jnp.bfloat16)
    xd = jnp.asarray(rng.normal(size=(B, 2048)), jnp.bfloat16)

    def dense_step(xc, wd):
        y = jax.lax.dot_general(xc, wd, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y[:, :2048].astype(xc.dtype)

    dt = timeit("dense bf16 gateup [11264x2048] (XLA)", dense_step, xd, wd)
    print(f"  -> {11264 * 2048 * 2 / dt / 1e9:.1f} GB/s weight stream")

    kc = jnp.asarray(rng.integers(-127, 127, (L, B, Hkv, S, D)), jnp.int8)
    vc = jnp.asarray(rng.integers(-127, 127, (L, B, Hkv, S, D)), jnp.int8)
    ks = jnp.asarray(rng.random((L, B, Hkv, S, 1)), jnp.float32)
    vs = jnp.asarray(rng.random((L, B, Hkv, S, 1)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.bfloat16)
    lens = jnp.full((B,), S // 2, jnp.int32)

    # attention: carry = accumulator (attention output feeds back into q)
    def attn_step(qc, kc, vc, ks, vs, lens):
        out = decode_attention_stacked(qc, kc, vc, ks, vs, jnp.int32(3),
                                       lens, scale=0.125)
        return out.astype(qc.dtype)

    timeit("decode_attention (1 layer)", attn_step, q, kc, vc, ks, vs, lens)

    # append: carry = the caches
    new_k = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.bfloat16)
    offs = jnp.asarray(rng.integers(0, S - 1, (B,)), jnp.int32)

    def append_step(caches, new_k, offs):
        kc, vc, ks, vs = caches
        return kv_append_decode_stacked(kc, vc, new_k, new_k, offs,
                                        jnp.int32(3), ks, vs)

    timeit("kv_append (1 layer)", append_step, (kc, vc, ks, vs), new_k, offs)

    # qmm matvec: TinyLlama qkv projection shape (fused 2560x2048 Q4_0)
    from booster_tpu.ops.linear import qlinear
    from booster_tpu.quant import repack_gguf_tensor
    from booster_tpu.quant.formats import quantize
    from booster_tpu.quant.qtensor import prepare_kernel_scales

    from booster_tpu.gguf import GGMLType

    for gt, tag in ((GGMLType.Q4_0, "q4_0"), (GGMLType.Q8_0, "q8_0")):
        for (N, K, label) in ((2560, 2048, "qkv"), (2048, 2048, "wo"),
                              (11264, 2048, "gateup"), (2048, 5632, "down")):
            w = rng.normal(size=(N, K)).astype(np.float32) * 0.05
            raw = quantize(w, gt)
            qt = repack_gguf_tensor(raw, gt, (N, K))
            qt = prepare_kernel_scales(qt).astype_device()
            x = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)

            def mm_step(xc, qt=qt, N=N, K=K):
                y = qlinear(xc.reshape(B, 1, K), qt).reshape(B, N)
                return y[:, :K].astype(xc.dtype) if N >= K else jnp.pad(
                    y, ((0, 0), (0, K - N))).astype(xc.dtype)

            timeit(f"qmm {tag} {label} [{N}x{K}]", mm_step, x)


if __name__ == "__main__":
    main()
