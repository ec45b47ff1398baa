#!/usr/bin/env python
"""Bisect the i8 stream floor: where between 'u8 sum at 810 GB/s' and
'fused dequant at ~290 GB/s' does the bandwidth go?

Variants (all read the same [11264, 4096] i8 array, 46 MB):
  sum_i32      sum(q.astype(i32)) over sublanes, out [1, K]   (read probe)
  sum_f32      sum(q.astype(f32)) over sublanes
  sum_bf16_mxu cast to bf16, contract with ones via MXU dot
  dot_bf16     cast to bf16, dot with x [64, K]               (noscale qmm)
  dot_sub      same but K consumed in 512-col subtiles        (current qmm)
  dot_i32      MXU dot in int8?? x_i8 [64, K] i8, preferred i32
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, K, BM = 11264, 4096, 64
BYTES = N * K


def timeit(name, fn, carry, *rest, iters=512):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def loop(carry, rest):
        def body(c, _):
            # barrier: stop XLA hoisting the loop-invariant body computation
            c, r = jax.lax.optimization_barrier((c, rest))
            return fn(c, *r), None
        c, _ = jax.lax.scan(body, carry, None, length=iters)
        return c

    def force(c):
        np.asarray(jax.tree.leaves(c)[0].ravel()[0])

    try:
        carry = loop(carry, rest)
        force(carry)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL ({type(e).__name__}: {str(e).splitlines()[0][:140]})")
        return None
    t0 = time.perf_counter()
    carry = loop(carry, rest)
    force(carry)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e6:.1f} us/iter -> {BYTES / dt / 1e9:.0f} GB/s")
    return dt


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    qw = jnp.asarray(rng.integers(-127, 127, (N, K)), jnp.int8)
    x = jnp.asarray(rng.normal(size=(BM, K)), jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 127, (BM, K)), jnp.int8)
    BN = 1024

    def call(kernel, out_shape, extra_specs=(), bn=BN):
        return pl.pallas_call(
            kernel,
            grid=(N // bn,),
            in_specs=[pl.BlockSpec((bn, K), lambda n: (n, 0),
                                   memory_space=pltpu.VMEM)] + list(extra_specs),
            out_specs=pl.BlockSpec(out_shape[0:2] if False else None) if False
            else pl.BlockSpec(out_shape, lambda n: (0, 0),
                              memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )

    # 1. sum i32 over sublanes (the read-probe pattern)
    def k_sum_i32(q_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += jnp.sum(q_ref[:].astype(jnp.int32), axis=0,
                            keepdims=True).astype(jnp.float32)

    def step1(acc, qw):
        out = call(k_sum_i32, (1, K))(qw)
        return acc + out[:, :128]

    timeit("sum_i32 (sublane reduce)", step1, jnp.zeros((1, 128), jnp.float32), qw)

    # 2. sum f32
    def k_sum_f32(q_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += jnp.sum(q_ref[:].astype(jnp.float32), axis=0, keepdims=True)

    def step2(acc, qw):
        out = call(k_sum_f32, (1, K))(qw)
        return acc + out[:, :128]

    timeit("sum_f32", step2, jnp.zeros((1, 128), jnp.float32), qw)

    # 3. cast to bf16, sum via sublane reduce
    def k_sum_bf16(q_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += jnp.sum(q_ref[:].astype(jnp.bfloat16), axis=0,
                            keepdims=True).astype(jnp.float32)

    def step3(acc, qw):
        out = call(k_sum_bf16, (1, K))(qw)
        return acc + out[:, :128]

    timeit("sum_bf16", step3, jnp.zeros((1, 128), jnp.float32), qw)

    xspec = pl.BlockSpec((BM, K), lambda n: (0, 0), memory_space=pltpu.VMEM)

    # 4. whole-block bf16 dot
    def k_dot(q_ref, x_ref, o_ref):
        w = q_ref[:].astype(jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(x_ref[:], w, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)

    def step4(acc, qw, x):
        out = pl.pallas_call(
            k_dot, grid=(N // BN,),
            in_specs=[pl.BlockSpec((BN, K), lambda n: (n, 0),
                                   memory_space=pltpu.VMEM), xspec],
            out_specs=pl.BlockSpec((BM, BN), lambda n: (0, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BM, N), jnp.float32),
        )(qw, x)
        return acc + out[:, :128]

    timeit("dot_bf16 whole-K", step4, jnp.zeros((BM, 128), jnp.float32), qw, x)

    # 5. subtiled bf16 dot (the qmm pattern)
    def k_dot_sub(q_ref, x_ref, o_ref):
        acc = jnp.zeros_like(o_ref)
        for j in range(K // 512):
            sl = slice(j * 512, (j + 1) * 512)
            w = q_ref[:, sl].astype(jnp.bfloat16)
            acc += jax.lax.dot_general(x_ref[:, sl], w, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        o_ref[:] = acc

    def step5(acc, qw, x):
        out = pl.pallas_call(
            k_dot_sub, grid=(N // BN,),
            in_specs=[pl.BlockSpec((BN, K), lambda n: (n, 0),
                                   memory_space=pltpu.VMEM), xspec],
            out_specs=pl.BlockSpec((BM, BN), lambda n: (0, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BM, N), jnp.float32),
        )(qw, x)
        return acc + out[:, :128]

    timeit("dot_bf16 512-subtiled", step5, jnp.zeros((BM, 128), jnp.float32),
           qw, x)

    # 6. native int8 MXU dot
    def k_dot_i8(q_ref, x_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)

    def step6(acc, qw, xi):
        out = pl.pallas_call(
            k_dot_i8, grid=(N // BN,),
            in_specs=[pl.BlockSpec((BN, K), lambda n: (n, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((BM, K), lambda n: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BM, BN), lambda n: (0, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BM, N), jnp.float32),
        )(qw, xi)
        return acc + out[:, :128]

    timeit("dot_i8 native (x i8, pref i32)", step6,
           jnp.zeros((BM, 128), jnp.float32), qw, xi)

    # 7. bf16 x against i8 w direct (mixed dot, let Mosaic decide)
    def k_dot_mixed(q_ref, x_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def step7(acc, qw, x):
        out = pl.pallas_call(
            k_dot_mixed, grid=(N // BN,),
            in_specs=[pl.BlockSpec((BN, K), lambda n: (n, 0),
                                   memory_space=pltpu.VMEM), xspec],
            out_specs=pl.BlockSpec((BM, BN), lambda n: (0, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BM, N), jnp.float32),
        )(qw, x)
        return acc + out[:, :128]

    timeit("dot mixed bf16 x i8 (no explicit cast)", step7,
           jnp.zeros((BM, 128), jnp.float32), qw, x)


if __name__ == "__main__":
    main()
