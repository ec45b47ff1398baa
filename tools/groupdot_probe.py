#!/usr/bin/env python
"""M=1 group-dot matvec candidate: raw-payload dots + per-group f32 rescale.

The shipped K-major kernels dequantize per element (unpack, scale-expand,
multiply — ~5-6 VPU ops/elem) and are element-pipeline bound at M=1.  The
CUDA-mmq shape (per-group integer dots + rescale, qmm_gap v6) loses at
M=64 because the [BM, BN] per-group rescale is VPU-bound — but at M=1 the
rescale is [ng, BN] ONCE:

    out_j = sum_g s_gj * ( (X_bd @ q)_gj - zero * xs_g )

with X_bd[g, k] = x_k * (k//G == g) the block-diagonal activation matrix
(built by a sublane broadcast + iota mask, ~K*ng/G elems per grid step)
and xs_g the group sums.  The MXU does ng x K x BN MACs per tile — 32x the
matvec's — but at M=1 it idles anyway, and per-element VPU work drops to
the i4 nibble unpack alone (q8: nothing — the raw i8 payload rides a mixed
bf16 x i8 dot).  The group partials are EXACT integer dots in f32, so this
is also the weight-exact "mmq" (VERDICT r4 #4) in its TPU-viable form.

Usage: python tools/groupdot_probe.py [--shapes 1b|8b] [--check]
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

G = 32
SUB = 256


def _bd_mask(ng, kk):
    """Group-selector as bf16 0/1 (an i1 `where` mask hits a Mosaic
    replicated-layout relayout error; arithmetic masking lowers clean)."""
    return (jax.lax.broadcasted_iota(jnp.int32, (ng, kk), 1) // G
            == jax.lax.broadcasted_iota(jnp.int32, (ng, kk), 0)
            ).astype(jnp.bfloat16)


def _gd_i4_kernel(x_ref, qw_ref, s_ref, out_ref, *, bkh, bn, zero):
    """x [1, 2, BKH] bf16, qw [BKH, BN] u8 (split-half nibbles),
    s [2, BKH/G, BN] f32, out [1, BN] f32."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ng = bkh // G
    mask = _bd_mask(ng, bkh)
    xh, xsh = [], []
    for h in (0, 1):
        X = jnp.broadcast_to(x_ref[:, h, :],
                             (ng, bkh)).astype(jnp.bfloat16) * mask
        xh.append(X)
        xsh.append(jnp.sum(X.astype(jnp.float32), axis=1, keepdims=True))

    acc = jnp.zeros_like(out_ref)
    for j in range(-(-bkh // SUB)):
        w_sub = min(SUB, bkh - j * SUB)
        sl = slice(j * SUB, j * SUB + w_sub)
        gsl = slice(j * SUB // G, (j * SUB + w_sub) // G)
        q = qw_ref[sl, :].astype(jnp.int32)
        lo = (q & 0x0F).astype(jnp.bfloat16)
        hi = (q >> 4).astype(jnp.bfloat16)
        for h, v in ((0, lo), (1, hi)):
            p = jax.lax.dot_general(
                xh[h][gsl, sl], v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += jnp.sum(
                s_ref[h, gsl, :] * (p - float(zero) * xsh[h][gsl, :]),
                axis=0, keepdims=True)
    out_ref[:] += acc


def _gd_i4m_kernel(x_ref, qw_ref, s_ref, out_ref, *, bkh, bn):
    """Affine (q4_K-style): s rows 0/1 = scales lo/hi, rows 2/3 = mins."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ng = bkh // G
    mask = _bd_mask(ng, bkh)
    xh, xsh = [], []
    for h in (0, 1):
        X = jnp.broadcast_to(x_ref[:, h, :],
                             (ng, bkh)).astype(jnp.bfloat16) * mask
        xh.append(X)
        xsh.append(jnp.sum(X.astype(jnp.float32), axis=1, keepdims=True))

    acc = jnp.zeros_like(out_ref)
    for j in range(-(-bkh // SUB)):
        w_sub = min(SUB, bkh - j * SUB)
        sl = slice(j * SUB, j * SUB + w_sub)
        gsl = slice(j * SUB // G, (j * SUB + w_sub) // G)
        q = qw_ref[sl, :].astype(jnp.int32)
        lo = (q & 0x0F).astype(jnp.bfloat16)
        hi = (q >> 4).astype(jnp.bfloat16)
        for h, v in ((0, lo), (1, hi)):
            p = jax.lax.dot_general(
                xh[h][gsl, sl], v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += jnp.sum(
                s_ref[h, gsl, :] * p - s_ref[2 + h, gsl, :] * xsh[h][gsl, :],
                axis=0, keepdims=True)
    out_ref[:] += acc


def _gd_i8_kernel(x_ref, qw_ref, s_ref, out_ref, *, bk, bn, raw):
    """x [1, BK] bf16, qw [BK, BN] i8, s [1, BK/G, BN] f32, out [1, BN]."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ng = bk // G
    X = jnp.broadcast_to(x_ref[:, :],
                         (ng, bk)).astype(jnp.bfloat16) * _bd_mask(ng, bk)

    acc = jnp.zeros_like(out_ref)
    for j in range(-(-bk // SUB)):
        w_sub = min(SUB, bk - j * SUB)
        sl = slice(j * SUB, j * SUB + w_sub)
        gsl = slice(j * SUB // G, (j * SUB + w_sub) // G)
        rhs = qw_ref[sl, :]
        if not raw:
            rhs = rhs.astype(jnp.bfloat16)
        p = jax.lax.dot_general(
            X[gsl, sl], rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc += jnp.sum(s_ref[0, gsl, :] * p, axis=0, keepdims=True)
    out_ref[:] += acc


def run_i4(name, N, K, affine, iters, check, zero=8):
    rng = np.random.default_rng(0)
    half = K // 2
    BN = 1024 if N % 1024 == 0 else 512
    BKH = min(1024, half)
    while half % BKH:
        BKH //= 2
    q = rng.integers(0, 16, size=(half, N), dtype=np.uint8)
    lo = q.astype(np.int32)
    hi = rng.integers(0, 16, size=(half, N), dtype=np.uint8).astype(np.int32)
    payload = (lo | (hi << 4)).astype(np.uint8)
    rows = 4 if affine else 2
    s = (rng.random((rows, half // G, N), dtype=np.float32) * 0.02 + 0.01)
    x = rng.standard_normal((1, 2, half)).astype(np.float32)

    kern = (functools.partial(_gd_i4m_kernel, bkh=BKH, bn=BN) if affine
            else functools.partial(_gd_i4_kernel, bkh=BKH, bn=BN, zero=zero))
    call = pl.pallas_call(
        kern,
        grid=(N // BN, half // BKH),
        in_specs=[
            pl.BlockSpec((1, 2, BKH), lambda n, k: (0, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BKH, BN), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, BKH // G, BN), lambda n, k: (0, k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BN), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K, transcendentals=0,
            bytes_accessed=N * half + rows * (half // G) * N * 4 + N * 4),
    )
    xj = jnp.asarray(x, jnp.bfloat16)
    pj = jnp.asarray(payload)
    sj = jnp.asarray(s)

    if check:
        got = np.asarray(call(xj, pj, sj))
        sc = np.repeat(s, G, axis=1)  # [rows, half, N]
        wl = lo.astype(np.float32)
        wh = (payload.astype(np.int32) >> 4).astype(np.float32)
        if affine:
            wl = wl * sc[0] - sc[2]
            wh = wh * sc[1] - sc[3]
        else:
            wl = (wl - zero) * sc[0]
            wh = (wh - zero) * sc[1]
        xf = x.astype(np.float64)
        want = xf[0, 0] @ wl + xf[0, 1] @ wh
        err = np.abs(got[0] - want)
        print(f"  {name} check: max abs err {err.max():.5f} "
              f"(rms {np.sqrt((err**2).mean()):.5f})")

    def step(c, xj, pj, sj):
        return c + call(xj, pj, sj)[:, :128]

    dt = timeit(name, step, jnp.zeros((1, 128), jnp.float32), xj, pj, sj,
                iters=iters)
    if dt:
        qbytes = payload.size + s.size * 4
        print(f"{name} [{N}x{K}]: {dt*1e6:.1f} us -> "
              f"{qbytes/dt/1e9:.0f} GB/s qstream ({N*K/dt/1e9:.1f} G elem/s)")


def run_i8(name, N, K, raw, iters, check):
    rng = np.random.default_rng(0)
    BN = 1024 if N % 1024 == 0 else 512
    BK = min(2048, K)
    while K % BK:
        BK //= 2
    q = rng.integers(-127, 128, size=(K, N)).astype(np.int8)
    s = (rng.random((1, K // G, N), dtype=np.float32) * 0.02 + 0.01)
    x = rng.standard_normal((1, K)).astype(np.float32)

    kern = functools.partial(_gd_i8_kernel, bk=BK, bn=BN, raw=raw)
    call = pl.pallas_call(
        kern,
        grid=(N // BN, K // BK),
        in_specs=[
            pl.BlockSpec((1, BK), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BN), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK // G, BN), lambda n, k: (0, k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BN), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K, transcendentals=0,
            bytes_accessed=N * K + (K // G) * N * 4 + N * 4),
    )
    xj = jnp.asarray(x, jnp.bfloat16)
    qj = jnp.asarray(q)
    sj = jnp.asarray(s)

    if check:
        got = np.asarray(call(xj, qj, sj))
        sc = np.repeat(s[0], G, axis=0)
        want = x.astype(np.float64)[0] @ (q.astype(np.float64) * sc)
        err = np.abs(got[0] - want)
        print(f"  {name} check: max abs err {err.max():.5f} "
              f"(rms {np.sqrt((err**2).mean()):.5f})")

    def step(c, xj, qj, sj):
        return c + call(xj, qj, sj)[:, :128]

    dt = timeit(name, step, jnp.zeros((1, 128), jnp.float32), xj, qj, sj,
                iters=iters)
    if dt:
        qbytes = q.size + s.size * 4
        print(f"{name} [{N}x{K}]: {dt*1e6:.1f} us -> "
              f"{qbytes/dt/1e9:.0f} GB/s qstream ({N*K/dt/1e9:.1f} G elem/s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="1b")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--iters", default="256,1024")
    ap.add_argument("--fmts", default="i4,i4m,i8,i8raw")
    args = ap.parse_args()
    iters = tuple(int(v) for v in args.iters.split(","))
    want = set(args.fmts.split(","))
    print("backend:", jax.default_backend())

    if args.shapes == "1b":
        shapes = ((11264, 2048, "gateup"), (2048, 5632, "down"))
    else:
        shapes = ((28672, 4096, "gateup"), (4096, 14336, "down"))

    for (N, K, label) in shapes:
        if "i4" in want:
            run_i4(f"gd_i4 {label}", N, K, False, iters, args.check)
        if "i4m" in want:
            run_i4(f"gd_i4m {label}", N, K, True, iters, args.check)
        if "i8" in want:
            run_i8(f"gd_i8 {label}", N, K, False, iters, args.check)
        if "i8raw" in want:
            run_i8(f"gd_i8raw {label}", N, K, True, iters, args.check)


if __name__ == "__main__":
    main()
