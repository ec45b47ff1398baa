#!/usr/bin/env python
"""Clean per-matmul throughput of the real qlinear kernels at 8B shapes.

Unlike tools/kernel_micro.py (whose feedback carry inserts an XLA relayout
between iterations — realistic for a decode chain but polluting for kernel
attribution), this accumulates into a tiny carry so back-to-back kernel
throughput is measured.  Reports effective GB/s of the quantized stream.

Usage: python tools/qmm_clean.py [--bm 1] [--shapes 8b|1b]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, carry, *rest, iters=(512, 2048)):
    """Per-iteration cost as the SLOPE between two trip counts.

    Two traps this avoids (tools/loop_floor_probe.py):
    - XLA hoists loop-invariant bodies out of scans: a constant-operand
      matmul is computed ONCE ("4 TB/s" dense streams) — the
      optimization_barrier ties every iteration to the carry.
    - The per-dispatch cost through the axon tunnel is ~26-30 ms AND noisy
      (+-3 ms); dividing one total by the trip count buries small kernels
      under dispatch/iters.  The slope cancels the dispatch term."""
    def make(n):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def loop(carry, rest):
            def body(c, _):
                c, r = jax.lax.optimization_barrier((c, rest))
                return fn(c, *r), None
            c, _ = jax.lax.scan(body, carry, None, length=n)
            return c
        return loop

    def force(c):
        np.asarray(jax.tree.leaves(c)[0].ravel()[0])

    totals = []
    try:
        for n in iters:
            loop = make(n)
            c = loop(jax.tree.map(jnp.copy, carry), rest)
            force(c)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                c = loop(c, rest)
                force(c)
                best = min(best, time.perf_counter() - t0)
            totals.append(best)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL ({type(e).__name__}: {str(e).splitlines()[0][:160]})")
        return None
    return (totals[-1] - totals[0]) / (iters[-1] - iters[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bm", type=int, default=1)
    ap.add_argument("--shapes", default="8b")
    ap.add_argument("--fmts", default="q4_K,q4_0,q8_0",
                    help="comma list of formats to measure")
    ap.add_argument("--label", default="",
                    help="only measure shapes whose label contains this")
    ap.add_argument("--iters", default="512,2048")
    ap.add_argument("--dense", action="store_true", help="include bf16 ref")
    args = ap.parse_args()
    iters = tuple(int(v) for v in args.iters.split(","))
    BM = args.bm
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), " BM =", BM)
    dt = timeit("floor", lambda c: c + 1.0, jnp.zeros((8, 128), jnp.float32))
    print(f"identity loop floor: {dt*1e6:.1f} us/iter (slope)")

    from booster_tpu.gguf import GGMLType
    from booster_tpu.ops.linear import qlinear
    from booster_tpu.quant import repack_gguf_tensor
    from booster_tpu.quant.formats import quantize
    from booster_tpu.quant.qtensor import (QTensor, prepare_kernel_scales,
                                           repack_weights, transpose_qtensor)

    if args.shapes == "8b":
        shapes = ((6144, 4096, "qkv"), (4096, 4096, "wo"),
                  (28672, 4096, "gateup"), (4096, 14336, "down"))
    else:
        shapes = ((2560, 2048, "qkv"), (11264, 2048, "gateup"),
                  (2048, 5632, "down"))

    want = set(args.fmts.split(","))
    for gt, tag in ((GGMLType.Q4_K, "q4_K"), (GGMLType.Q4_0, "q4_0"),
                    (GGMLType.Q8_0, "q8_0")):
        if tag not in want:
            continue
        for (N, K, label) in shapes:
            if args.label and args.label not in label:
                continue
            w = rng.normal(size=(N, K)).astype(np.float32) * 0.05
            raw = quantize(w, gt)
            qt0 = prepare_kernel_scales(repack_gguf_tensor(raw, gt, (N, K)))
            x = jnp.asarray(rng.normal(size=(BM, K)), jnp.bfloat16)
            for lay, qth in (("lane", qt0), ("kmaj", transpose_qtensor(qt0))):
                qt = qth.astype_device()
                qbytes = int(qt.qw.size * qt.qw.dtype.itemsize)

                def mm_step(acc, x, qt=qt):
                    y = qlinear(x.reshape(BM, 1, K), qt).reshape(BM, -1)
                    return acc + y[:, :128]

                dt = timeit(f"{tag} {label} {lay}", mm_step,
                            jnp.zeros((BM, 128), jnp.float32), x, iters=iters)
                if dt:
                    print(f"qmm {tag} {label} {lay} [{N}x{K}]: {dt*1e6:.1f} us "
                          f"-> {qbytes / dt / 1e9:.0f} GB/s qstream "
                          f"({N*K/dt/1e9:.1f} G elem/s)")

    # dense bf16 reference at the same shapes
    for (N, K, label) in (shapes if args.dense else ()):
        wd = jnp.asarray(rng.normal(size=(N, K)), jnp.bfloat16)
        x = jnp.asarray(rng.normal(size=(BM, K)), jnp.bfloat16)

        def dense_step(acc, x, wd=wd):
            y = jax.lax.dot_general(x, wd, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return acc + y[:, :128]

        dt = timeit(f"bf16 {label}", dense_step,
                    jnp.zeros((BM, 128), jnp.float32), x, wd, iters=iters)
        if dt:
            print(f"dense bf16 {label} [{N}x{K}]: {dt*1e6:.1f} us "
                  f"-> {N*K*2/dt/1e9:.0f} GB/s stream")


if __name__ == "__main__":
    main()
