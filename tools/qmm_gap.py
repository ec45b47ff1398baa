#!/usr/bin/env python
"""Where does the q8_0 K-major kernel's stream rate go? (mmq gap analysis)

The fused-dequant kernel runs ~570-610 GB/s at M=64 while the no-dequant
i8c kernel (one mixed bf16xi8 MXU dot) streams near the HBM roofline.
This ladder isolates the cost of each stage at the SAME tiling:

  v0  mixed bf16xi8 dot, no dequant              (the i8c ceiling)
  v1  + i8->bf16 cast, bf16 dot                  (cast cost)
  v2  + multiply by a PRE-EXPANDED bf16 scale    (mult cost, no expansion)
  v3  + in-kernel scale expansion (broadcast+reshape) = the current kernel
  v4  per-group i8xi8->i32 batched dots + VPU rescale (the CUDA-mmq shape)
  v5  leading-dim scale broadcast over a [g, K/g, BN] payload view
      (K-reordered layout candidate: no sublane reshape)

Usage: python tools/qmm_gap.py [--m 64] [--n 4096] [--k 4096]
"""

from __future__ import annotations

import argparse
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

G = 32  # q8_0 group size


def make_call(kern, M, K, N, BM, BN, BK, extra_specs=(), extra_args=()):
    return pl.pallas_call(
        kern,
        grid=(M // BM, N // BN, K // BK),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BN), lambda m, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K, bytes_accessed=N * K + M * K * 2 + M * N * 4,
            transcendentals=0),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--bn", type=int, default=1024)
    ap.add_argument("--bk", type=int, default=2048)
    ap.add_argument("--sub", type=int, default=256)
    ap.add_argument("--variants", default="v0,v1,v3,v6,v7",
                    help="comma list (v0,v1,v2,v3,v4,v5,v6,v7)")
    args = ap.parse_args()
    M, N, K, BN, BK, SUB = args.m, args.n, args.k, args.bn, args.bk, args.sub
    BM = M
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}  M={M} K={K} N={N} "
          f"BN={BN} BK={BK} SUB={SUB}", flush=True)

    qw = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    s_small = jnp.asarray(rng.random((K // G, N)) + 0.5, jnp.bfloat16)
    s_big = jnp.asarray(rng.random((K, N)) + 0.5, jnp.bfloat16)
    qbytes = K * N

    def v0_kern(x_ref, w_ref, o_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def v1_kern(x_ref, w_ref, o_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        acc = jnp.zeros_like(o_ref)
        for j in range(BK // SUB):
            sl = slice(j * SUB, (j + 1) * SUB)
            w = w_ref[sl, :].astype(jnp.bfloat16)
            acc += jax.lax.dot_general(
                x_ref[:, sl], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] += acc

    def v2_kern(x_ref, w_ref, s_ref, o_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        acc = jnp.zeros_like(o_ref)
        for j in range(BK // SUB):
            sl = slice(j * SUB, (j + 1) * SUB)
            w = w_ref[sl, :].astype(jnp.bfloat16) * s_ref[sl, :]
            acc += jax.lax.dot_general(
                x_ref[:, sl], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] += acc

    def v3_kern(x_ref, w_ref, s_ref, o_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        acc = jnp.zeros_like(o_ref)
        for j in range(BK // SUB):
            sl = slice(j * SUB, (j + 1) * SUB)
            gsl = slice(j * SUB // G, (j + 1) * SUB // G)
            sexp = jnp.broadcast_to(
                s_ref[gsl, :].astype(jnp.float32)[:, None, :],
                (SUB // G, G, BN)).reshape(SUB, BN)
            w = w_ref[sl, :].astype(jnp.bfloat16) * sexp.astype(jnp.bfloat16)
            acc += jax.lax.dot_general(
                x_ref[:, sl], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] += acc

    def v4_kern(x_ref, w_ref, s_ref, o_ref):
        # per-group integer dots: x quantized per row OUTSIDE (here: just
        # reuse int8 x to measure the shape), rescale partials on the VPU
        @pl.when(pl.program_id(2) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        acc = jnp.zeros_like(o_ref)
        for j in range(BK // SUB):
            ng = SUB // G
            xg = x_ref[:, j * SUB:(j + 1) * SUB].reshape(BM, ng, G)
            wg = w_ref[j * SUB:(j + 1) * SUB, :].reshape(ng, G, BN)
            d = jax.lax.dot_general(
                jnp.swapaxes(xg, 0, 1), wg,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)  # [ng, BM, BN]
            sg = s_ref[j * SUB // G:(j + 1) * SUB // G, :]  # [ng, BN]
            acc += jnp.sum(d.astype(jnp.float32)
                           * sg.astype(jnp.float32)[:, None, :], axis=0)
        o_ref[:] += acc

    def v5_kern(x_ref, w_ref, s_ref, o_ref):
        # payload viewed [G, BK/G, BN] (leading-dim = within-group index):
        # the scale broadcast rides the UNTILED leading axis — no sublane
        # reshape.  Contraction over two dims; x arrives pre-reordered.
        @pl.when(pl.program_id(2) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        ng = BK // G
        w = w_ref[:].reshape(G, ng, BN).astype(jnp.bfloat16)
        w = w * s_ref[:][None, :, :]
        xr = x_ref[:].reshape(BM, G, ng)
        o_ref[:] += jax.lax.dot_general(
            xr, w, (((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)

    def v6_kern(x_ref, w_ref, s_ref, o_ref):
        # NO payload cast (i8->bf16 alone drops 906->578 GB/s — a relayout):
        # the MXU eats the i8 tile directly in per-group mixed bf16xi8 dots
        # and the group scale multiplies the [BM, BN] f32 PARTIAL — G*BM*BN
        # clean lane-aligned VPU ops instead of BK*BN relayout casts
        @pl.when(pl.program_id(2) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        acc = jnp.zeros_like(o_ref)
        for g in range(BK // G):
            d = jax.lax.dot_general(
                x_ref[:, g * G:(g + 1) * G], w_ref[g * G:(g + 1) * G, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [BM, BN]
            acc += d * s_ref[g, :][None, :].astype(jnp.float32)
        o_ref[:] += acc

    def v7_kern(x_ref, w_ref, s_ref, o_ref):
        # v6 with group=128 rescale (the q8_0 32-group scales are exact-
        # expanded to 128-groups only if they repeat; here just measures the
        # cost scaling with fewer, larger groups)
        GG = 128
        @pl.when(pl.program_id(2) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        acc = jnp.zeros_like(o_ref)
        for g in range(BK // GG):
            d = jax.lax.dot_general(
                x_ref[:, g * GG:(g + 1) * GG], w_ref[g * GG:(g + 1) * GG, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += d * s_ref[g * (GG // G), :][None, :].astype(jnp.float32)
        o_ref[:] += acc

    s_spec = pl.BlockSpec((BK, BN), lambda m, n, k: (k, n),
                          memory_space=pltpu.VMEM)
    sg_spec = pl.BlockSpec((BK // G, BN), lambda m, n, k: (k, n),
                           memory_space=pltpu.VMEM)

    xq = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    all_runs = {
        "v0": ("v0 mixed i8 dot  ", v0_kern, (), (), x),
        "v1": ("v1 cast only     ", v1_kern, (), (), x),
        "v2": ("v2 + preexp scale", v2_kern, (s_spec,), (s_big,), x),
        "v3": ("v3 + expansion   ", v3_kern, (sg_spec,), (s_small,), x),
        "v4": ("v4 group int dots", v4_kern, (sg_spec,), (s_small,), xq),
        "v5": ("v5 lead-dim bcast", v5_kern, (sg_spec,), (s_small,), x),
        "v6": ("v6 group mix dots", v6_kern, (sg_spec,), (s_small,), x),
        "v7": ("v7 g128 mix dots ", v7_kern, (sg_spec,), (s_small,), x),
    }
    runs = [all_runs[v] for v in args.variants.split(",")]

    for name, kern, especs, eargs, xin in runs:
        try:
            call = make_call(kern, M, K, N, BM, BN, BK, especs)

            def step(acc, xin, call=call, eargs=eargs):
                y = call(xin, qw, *eargs)
                return acc + y[:, :128]

            dt = timeit(name, step, jnp.zeros((M, 128), jnp.float32), xin,
                        iters=(128, 512))
            if dt:
                print(f"{name}: {dt*1e6:7.1f} us -> {qbytes/dt/1e9:5.0f} GB/s",
                      flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
