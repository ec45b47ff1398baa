#!/usr/bin/env python
"""Probe: K-major (transposed) quantized-weight layout for the fused
dequant matmul.

Idea: store qw as [K, N] instead of [N, K].  Scales then vary along
SUBLANES, and expanding s [SG, BN] to per-row scales [SUB, BN] is a
sublane-dim broadcast+merge — reshapes that only touch non-minor dims,
which Mosaic supports — instead of the lane-dim expansion that currently
needs a one-hot MXU dot of N*SG*K MACs (the measured i4/i8 dequant
bottleneck, tools/expander_probe.py).

Variants:
  sub_reshape  broadcast (ng,1,BN)->(ng,G,BN) then reshape (SUB,BN)
  sub_repeat   jnp.repeat(s_sub, G, axis=0)
  sub_ptile    pltpu.repeat(s, r, axis=0) tile semantics (permuted-K order)
  noscale      cast+dot only (floor)
Checks numerics, then times i8 and i4 kernels at [K=4096 -> N=4096] G=32.
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


def timeit(name, fn, carry, *rest, iters=(512, 2048)):
    """Per-iteration cost as the SLOPE between two trip counts: the ~26-30 ms
    (and noisy) per-dispatch cost through the axon tunnel would otherwise
    swamp small kernels (tools/loop_floor_probe.py)."""
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
            c = loop(jax.tree.map(jnp.copy, carry), rest)  # compile + warm (carry donated: reuse out)
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
    dt = (totals[-1] - totals[0]) / (iters[-1] - iters[0])
    print(f"{name}: {dt*1e6:.1f} us/iter (slope)")
    return dt


def make_tqmm_i8(N, K, G, BM, variant, SUB=512, BN=512):
    SG = K // G
    ng = SUB // G

    def kernel(x_ref, qw_ref, s_ref, o_ref):
        acc = jnp.zeros((BM, BN), jnp.float32)
        for j in range(K // SUB):
            sl = slice(j * SUB, (j + 1) * SUB)
            q = qw_ref[sl, :].astype(jnp.bfloat16)  # [SUB, BN]
            if variant == "sub_reshape":
                s_sub = s_ref[j * ng:(j + 1) * ng, :]
                ex = jnp.broadcast_to(s_sub[:, None, :], (ng, G, BN))
                ex = ex.reshape(SUB, BN)
            elif variant == "sub_repeat":
                s_sub = s_ref[j * ng:(j + 1) * ng, :]
                ex = jnp.repeat(s_sub, G, axis=0)
            elif variant == "sub_ptile":
                ex = pltpu.repeat(s_ref[:, :], SUB // SG, axis=0)
            elif variant == "noscale":
                ex = None
            else:
                raise ValueError(variant)
            w = q if ex is None else q * ex.astype(jnp.bfloat16)
            acc += jax.lax.dot_general(
                x_ref[:, sl], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = acc

    def qmm(x, qw, s):
        return pl.pallas_call(
            kernel,
            grid=(N // BN,),
            in_specs=[
                pl.BlockSpec((BM, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, BN), lambda n: (0, n), memory_space=pltpu.VMEM),
                pl.BlockSpec((SG, BN), lambda n: (0, n), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BM, BN), lambda n: (0, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BM, N), jnp.float32),
        )(x, qw, s)

    return qmm


def make_tqmm_i4(N, K, G, BM, SUB=512, BN=512):
    """i4 transposed: qw [K/2, N] u8, byte row k packs elems k (lo nibble)
    and k + K/2 (hi).  Scales [2, SG_half, N] per half."""
    half = K // 2
    SGh = half // G
    ng = SUB // G

    def kernel(x_ref, qw_ref, s_ref, o_ref):
        acc = jnp.zeros((BM, BN), jnp.float32)
        for j in range(half // SUB):
            sl = slice(j * SUB, (j + 1) * SUB)
            q = qw_ref[sl, :].astype(jnp.int32)
            lo = ((q & 0x0F) - 8).astype(jnp.bfloat16)
            hi = ((q >> 4) - 8).astype(jnp.bfloat16)
            s_lo = s_ref[0, j * ng:(j + 1) * ng, :]
            s_hi = s_ref[1, j * ng:(j + 1) * ng, :]
            exl = jnp.broadcast_to(s_lo[:, None, :], (ng, G, BN)).reshape(SUB, BN)
            exh = jnp.broadcast_to(s_hi[:, None, :], (ng, G, BN)).reshape(SUB, BN)
            acc += jax.lax.dot_general(
                x_ref[:, 0, sl], lo * exl.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(
                x_ref[:, 1, sl], hi * exh.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        o_ref[:] = acc

    def qmm(x3, qw, s):
        return pl.pallas_call(
            kernel,
            grid=(N // BN,),
            in_specs=[
                pl.BlockSpec((BM, 2, half), lambda n: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((half, BN), lambda n: (0, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, SGh, BN), lambda n: (0, 0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BM, BN), lambda n: (0, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BM, N), jnp.float32),
        )(x3, qw, s)

    return qmm


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    N, K, G = 4096, 4096, 32
    SG = K // G
    for BM in (8, 64):
        print(f"== i8 transposed [K={K} -> N={N}] G={G} BM={BM} ==")
        qw = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
        s_np = (rng.random((SG, N)).astype(np.float32) * 0.02)
        s = jnp.asarray(s_np)
        x_np = rng.normal(size=(BM, K)).astype(np.float32)
        x = jnp.asarray(x_np, jnp.bfloat16)
        wref = np.asarray(qw, np.float32) * np.repeat(s_np, G, axis=0)
        yref = np.asarray(x, np.float32) @ wref

        for variant in ("sub_reshape", "sub_repeat", "sub_ptile", "noscale"):
            qmm = make_tqmm_i8(N, K, G, BM, variant)
            tag = ""
            if variant in ("sub_reshape", "sub_repeat"):
                try:
                    y = np.asarray(jax.jit(qmm)(x, qw, s))
                    err = np.abs(y - yref).max() / max(np.abs(yref).max(), 1e-9)
                    tag = f" rel err {err:.2e}" + ("  ** BAD **" if err > 3e-2 else "")
                except Exception as e:  # noqa: BLE001
                    print(f"tqmm_i8[{variant}]: FAIL "
                          f"({type(e).__name__}: {str(e).splitlines()[0][:160]})")
                    continue

            def step(acc, x, qw=qw, s=s, qmm=qmm):
                y = qmm(x, qw, s)
                return acc + y[:, :128]

            dt = timeit(f"tqmm_i8[{variant}]{tag}", step,
                        jnp.zeros((BM, 128), jnp.float32), x)
            if dt:
                print(f"  -> {N*K/dt/1e9:.0f} GB/s effective i8 stream")

        print(f"== i4 transposed [K={K} -> N={N}] G={G} BM={BM} ==")
        half = K // 2
        SGh = half // G
        qw4 = rng.integers(0, 15, (half, N)).astype(np.uint8)
        qhi = rng.integers(0, 15, (half, N)).astype(np.uint8)
        packed = jnp.asarray(qw4 | (qhi << 4), jnp.uint8)
        s4_np = rng.random((2, SGh, N)).astype(np.float32) * 0.02
        s4 = jnp.asarray(s4_np)
        w_lo = (qw4.astype(np.float32) - 8) * np.repeat(s4_np[0], G, axis=0)
        w_hi = (qhi.astype(np.float32) - 8) * np.repeat(s4_np[1], G, axis=0)
        x3 = jnp.asarray(x_np.reshape(BM, 2, half), jnp.bfloat16)
        yref4 = (np.asarray(x3[:, 0], np.float32) @ w_lo
                 + np.asarray(x3[:, 1], np.float32) @ w_hi)

        qmm4 = make_tqmm_i4(N, K, G, BM)
        try:
            y = np.asarray(jax.jit(qmm4)(x3, packed, s4))
            err = np.abs(y - yref4).max() / max(np.abs(yref4).max(), 1e-9)
            tag = f" rel err {err:.2e}" + ("  ** BAD **" if err > 3e-2 else "")
        except Exception as e:  # noqa: BLE001
            print(f"tqmm_i4: FAIL ({type(e).__name__}: {str(e).splitlines()[0][:160]})")
            continue

        def step4(acc, x3, packed=packed, s4=s4, qmm4=qmm4):
            y = qmm4(x3, packed, s4)
            return acc + y[:, :128]

        dt = timeit(f"tqmm_i4[sub_reshape]{tag}", step4,
                    jnp.zeros((BM, 128), jnp.float32), x3)
        if dt:
            print(f"  -> {N*K/2/dt/1e9:.0f} GB/s effective i4 stream")


if __name__ == "__main__":
    main()
