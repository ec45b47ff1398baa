#!/usr/bin/env python
"""Probe variants of the fused quantized-matvec inner loop on TPU.

The i8 path runs ~150 GB/s effective vs 604 GB/s for dense bf16 (XLA) —
this probes where the cost is: the i8→bf16 cast, the scale multiply, the
expander dot, sub-tile granularity, or MXU int8 dots as an alternative.

Usage: python tools/qmm_probe.py
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

M, N, K, G = 64, 11264, 2048, 32  # gateup shape, Q8_0-like grouping
BN = 1024
ITERS = 2048


def timeit(name, fn, carry, *rest):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def loop(c, r):
        def body(c, _):
            return fn(c, *r), None
        c, _ = jax.lax.scan(body, c, None, length=ITERS)
        return c

    c = loop(carry, rest)
    np.asarray(jax.tree.leaves(c)[0].ravel()[0])
    t0 = time.perf_counter()
    c = loop(c, rest)
    np.asarray(jax.tree.leaves(c)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / ITERS
    gbs = (N * K) / dt / 1e9
    print(f"{name}: {dt*1e6:.1f} us/iter  ({gbs:.0f} GB/s of i8 payload)")
    return dt


def make_variant(body_fn, sub, out_dtype=jnp.float32, x_dtype=jnp.bfloat16):
    def run(x, qw, s):
        return pl.pallas_call(
            functools.partial(body_fn, sub=sub),
            grid=(N // BN,),
            in_specs=[
                pl.BlockSpec((M, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BN, K), lambda n: (n, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BN, K // G), lambda n: (n, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, BN), lambda n: (0, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
        )(x, qw, s)
    return run


def expand(s, g, k_tile, col0):
    sg = s.shape[-1]
    col_group = (col0 + jax.lax.broadcasted_iota(jnp.int32, (sg, k_tile), 1)) // g
    row = jax.lax.broadcasted_iota(jnp.int32, (sg, k_tile), 0)
    e = (col_group == row).astype(jnp.float32)
    return jax.lax.dot_general(s.astype(jnp.float32), e,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def v_current(x_ref, qw_ref, s_ref, out_ref, *, sub):
    acc = jnp.zeros_like(out_ref)
    for j in range(K // sub):
        sl = slice(j * sub, (j + 1) * sub)
        w = qw_ref[:, sl].astype(jnp.bfloat16) * expand(
            s_ref[:], G, sub, j * sub).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(x_ref[:, sl], w, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    out_ref[:] = acc


def v_cast_only(x_ref, qw_ref, s_ref, out_ref, *, sub):
    # no scales at all: isolates cast + dot cost (wrong numerics, perf probe)
    acc = jnp.zeros_like(out_ref)
    for j in range(K // sub):
        sl = slice(j * sub, (j + 1) * sub)
        w = qw_ref[:, sl].astype(jnp.bfloat16)
        acc += jax.lax.dot_general(x_ref[:, sl], w, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    out_ref[:] = acc


def v_dot_only(x_ref, qw_ref, s_ref, out_ref, *, sub):
    # int8 x int8 MXU dot, no dequant at all (probe: does Mosaic support it,
    # and how fast) — scales would be applied per group on the accumulator
    acc = jnp.zeros((M, BN), jnp.int32)
    for j in range(K // sub):
        sl = slice(j * sub, (j + 1) * sub)
        acc += jax.lax.dot_general(x_ref[:, sl], qw_ref[:, sl],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
    out_ref[:] = acc


def v_group_dots(x_ref, qw_ref, s_ref, out_ref, *, sub):
    # int8 MXU dots per group, scales on the accumulator (exact math)
    acc = jnp.zeros_like(out_ref)
    for g0 in range(K // G):
        sl = slice(g0 * G, (g0 + 1) * G)
        d = jax.lax.dot_general(x_ref[:, sl], qw_ref[:, sl],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        acc += d.astype(jnp.float32) * s_ref[:, g0][None, :]
    out_ref[:] = acc


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    qw = jnp.asarray(rng.integers(-127, 127, (N, K)), jnp.int8)
    s = jnp.asarray(rng.random((N, K // G)) * 0.01, jnp.float32)
    xb = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)

    def wrap(variant, x0, x_is_int=False):
        def step(xc, qw, s):
            y = variant(xc, qw, s)
            if x_is_int:
                return jnp.clip(y[:, :K], -127, 127).astype(jnp.int8)
            return y[:, :K].astype(xc.dtype)
        return step

    for sub in (256, 512, 2048):
        v = make_variant(v_current, sub)
        timeit(f"current bf16-dequant sub={sub}", wrap(v, xb), xb, qw, s)
    v = make_variant(v_cast_only, 2048)
    timeit("cast-only (no scales)", wrap(v, xb), xb, qw, s)
    try:
        v = make_variant(v_dot_only, 2048, out_dtype=jnp.int32)
        timeit("int8 MXU dot (no dequant)", wrap(v, xq, True), xq, qw, s)
        v = make_variant(v_group_dots, G)
        timeit("int8 group dots + acc scales", wrap(v, xq, True), xq, qw, s)
    except Exception as e:
        print("int8 dot variants unsupported:", type(e).__name__, str(e)[:200])


if __name__ == "__main__":
    main()
