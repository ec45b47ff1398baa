#!/usr/bin/env python
"""mmq design probe: per-channel i8 weights at M=64 — which dot variant
reaches the raw HBM read rate?

  a) i8 x i8 -> i32 MXU dot (activations pre-quantized per row)
  b) bf16 x i8 -> f32 mixed dot (exact activations, no dequant pass)
  c) the existing q8_0 K-major fused-dequant kernel (reference point)

The winner becomes the '--weights i8c' serving mode (the
/root/reference/cpp/ggml/src/ggml-cuda/mmq.cu role).
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.qmm_clean import timeit


def int_mm(x, w, out_dtype, bn=512, bk=2048):
    M, K = x.shape
    N = w.shape[1]
    bk = min(bk, K)
    bn = min(bn, N)

    def kern(x_ref, w_ref, o_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=out_dtype,
        )

    return pl.pallas_call(
        kern,
        grid=(M // min(M, 256), N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((min(M, 256), bk), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda m, n, k: (k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((min(M, 256), bn), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K, bytes_accessed=N * K + M * K + M * N * 4,
            transcendentals=0),
    )(x, w)


def main():
    M = int(os.environ.get("MM", "64"))
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), " M =", M)

    shapes = ((6144, 4096, "qkv"), (28672, 4096, "gateup"),
              (4096, 14336, "down"))
    for N, K, label in shapes:
        wq = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
        xb = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        xq = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)

        def a_step(acc, xq, wq=wq):
            y = int_mm(xq, wq, jnp.int32)
            return acc + y[:, :128].astype(jnp.float32)

        def b_step(acc, xb, wq=wq):
            y = int_mm(xb, wq, jnp.float32)
            return acc + y[:, :128]

        for name, step, x in (("i8xi8->i32", a_step, xq),
                              ("bf16xi8->f32", b_step, xb)):
            dt = timeit(f"{name} {label}", step,
                        jnp.zeros((M, 128), jnp.float32), x,
                        iters=(128, 512))
            if dt:
                print(f"{name} {label} [{K}x{N}]: {dt*1e6:.1f} us -> "
                      f"{N*K/dt/1e9:.0f} GB/s wstream", flush=True)


if __name__ == "__main__":
    main()
