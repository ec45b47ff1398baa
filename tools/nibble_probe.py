#!/usr/bin/env python
"""Probe i4 nibble-unpack strategies inside a K-major qmm-shaped kernel.

The current _tqmm_i4 unpacks via u8->i32 (&0xF, >>4, -zero, ->bf16): wide
lanes, ~9 VPU passes per packed byte.  Candidate: i8-native bit ops —
(q ^ 0x88) then arithmetic (v<<4)>>4 / v>>4 sign-extends BOTH nibbles with
the -8 zero folded in, then the supported i8->bf16 cast.  Unknown: does
Mosaic accept i8 vector shifts/xor at all, and what does it buy at M=1/64?

Shapes mirror the 1.1B gate+up matvec: W [11264, 2048] q4_0 -> K-major
payload [1024, 11264] u8 (11.5 MB), scales [1, 64, 11264] f32.
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

N, K, G = 11264, 2048, 32
HALF = K // 2
PAYLOAD = N * HALF


def timeit(name, fn, carry, *rest, iters=512):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def loop(carry, rest):
        def body(c, _):
            c, r = jax.lax.optimization_barrier((c, rest))
            return fn(c, *r), None
        c, _ = jax.lax.scan(body, carry, None, length=iters)
        return c

    def force(c):
        return np.asarray(jax.tree.leaves(c)[0].ravel()[0])

    try:
        carry = loop(carry, rest)
        force(carry)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL ({type(e).__name__}: {str(e).splitlines()[0][:160]})")
        return None
    t0 = time.perf_counter()
    carry = loop(carry, rest)
    force(carry)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e6:.1f} us/iter -> {PAYLOAD / dt / 1e9:.0f} GB/s payload")
    return dt


def expand_sub(s_sub, g, bn):
    ng = s_sub.shape[0]
    return jnp.broadcast_to(s_sub[:, None, :], (ng, g, bn)).reshape(ng * g, bn)


def make_step(bm, bn, mkw, srows):
    """mkw(q_tile, s_exp_rows) -> (w_lo, w_hi) bf16; s rows pre-folded host-side."""
    SUB = 256

    def kernel(x_ref, qw_ref, s_ref, o_ref):
        acc = jnp.zeros_like(o_ref)
        for j in range(HALF // SUB):
            sl = slice(j * SUB, (j + 1) * SUB)
            gsl = slice(j * SUB // G, (j + 1) * SUB // G)
            sx = [expand_sub(s_ref[r, gsl, :], G, bn).astype(jnp.bfloat16)
                  for r in range(srows)]
            w_lo, w_hi = mkw(qw_ref[sl, :], sx)
            acc += jax.lax.dot_general(
                x_ref[:, 0, sl], w_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(
                x_ref[:, 1, sl], w_hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = acc

    def step(acc, x3, qw, s):
        out = pl.pallas_call(
            kernel, grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((bm, 2, HALF), lambda n: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((HALF, bn), lambda n: (0, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((srows, HALF // G, bn), lambda n: (0, 0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda n: (0, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bm, N), jnp.float32),
        )(x3, qw, s)
        return acc + out[:, :128]

    return step


def mkw_current(q_u8, sx):
    q = q_u8.astype(jnp.int32)
    lo = ((q & 0x0F) - 8).astype(jnp.bfloat16)
    hi = ((q >> 4) - 8).astype(jnp.bfloat16)
    return lo * sx[0], hi * sx[1]


def mkw_i8mask_sub(q_u8, sx):
    # sx[1] is s_hi/16 (host-folded); lo keeps the exact (lo-8)*s form
    v = pltpu.bitcast(q_u8, jnp.int8) ^ jnp.int8(-128)
    lo = ((v & jnp.int8(0x0F)) - jnp.int8(8)).astype(jnp.bfloat16)
    hi = (v & jnp.int8(~0x0F)).astype(jnp.bfloat16)  # 16*(hi-8) signed
    return lo * sx[0], hi * sx[1]


def mkw_i8mask_affine(q_u8, sx):
    # sx = [s_lo, s_hi/16, 8*s_lo]: lo unsigned, -8 folded as an affine min
    v = pltpu.bitcast(q_u8, jnp.int8) ^ jnp.int8(-128)
    lo = (v & jnp.int8(0x0F)).astype(jnp.bfloat16)
    hi = (v & jnp.int8(~0x0F)).astype(jnp.bfloat16)
    return lo * sx[0] - sx[2], hi * sx[1]


def unpack_i32(q_u8):
    q = q_u8.astype(jnp.int32)
    lo = ((q & 0x0F) - 8).astype(jnp.bfloat16)
    hi = ((q >> 4) - 8).astype(jnp.bfloat16)
    return lo, hi


def unpack_i8(q_u8):
    v = pltpu.bitcast(q_u8, jnp.int8) ^ jnp.int8(-120)  # 0x88
    lo = ((v << 1) >> 1)  # placeholder replaced below
    return lo, lo


def unpack_i8_shift(q_u8):
    v = pltpu.bitcast(q_u8, jnp.int8) ^ jnp.int8(-120)  # ^0x88: fold -8
    lo = ((v << 4) >> 4).astype(jnp.bfloat16)
    hi = (v >> 4).astype(jnp.bfloat16)
    return lo, hi


def unpack_i16_shift(q_u8):
    v = q_u8.astype(jnp.int16) ^ jnp.int16(0x88)
    lo = ((v << 12) >> 12).astype(jnp.bfloat16)
    hi = ((v << 8) >> 12).astype(jnp.bfloat16)
    return lo, hi


def unpack_i32_shift(q_u8):
    v = q_u8.astype(jnp.int32) ^ 0x88
    lo = ((v << 28) >> 28).astype(jnp.bfloat16)
    hi = ((v << 24) >> 28).astype(jnp.bfloat16)
    return lo, hi


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    qw = jnp.asarray(rng.integers(0, 256, (HALF, N)), jnp.uint8)
    s0 = jnp.asarray(rng.normal(size=(HALF // G, N)), jnp.float32)
    s1 = jnp.asarray(rng.normal(size=(HALF // G, N)), jnp.float32)
    s_cur = jnp.stack([s0, s1])                      # current kernel rows
    s_sub = jnp.stack([s0, s1 / 16])                 # i8mask_sub rows
    s_aff = jnp.stack([s0, s1 / 16, 8 * s0])         # i8mask_affine rows

    # correctness: small pallas_call vs numpy reference dequant-matvec
    qs = np.asarray(qw[:256, :128])
    s0s, s1s = np.asarray(s0[:8, :128]), np.asarray(s1[:8, :128])
    lo_ref = ((qs & 0xF).astype(np.float32) - 8)
    hi_ref = ((qs >> 4).astype(np.float32) - 8)
    exp = np.repeat(s0s, G, 0)
    exph = np.repeat(s1s, G, 0)
    w_ref = np.stack([lo_ref * exp, hi_ref * exph])

    for name, mkw, srows, sarr in [
        ("i8mask_sub", mkw_i8mask_sub, 2, s_sub),
        ("i8mask_affine", mkw_i8mask_affine, 3, s_aff),
        ("current", mkw_current, 2, s_cur),
    ]:
        def k(q_ref, s_ref, lo_ref, hi_ref, mkw=mkw, srows=srows):
            sx = [expand_sub(s_ref[r, :, :], G, 128).astype(jnp.bfloat16)
                  for r in range(srows)]
            w_lo, w_hi = mkw(q_ref[:], sx)
            lo_ref[:] = w_lo.astype(jnp.float32)
            hi_ref[:] = w_hi.astype(jnp.float32)
        try:
            lo, hi = pl.pallas_call(
                k,
                out_shape=(jax.ShapeDtypeStruct((256, 128), jnp.float32),
                           jax.ShapeDtypeStruct((256, 128), jnp.float32)),
            )(jnp.asarray(qs), sarr[:, :8, :128])
            got = np.stack([np.asarray(lo), np.asarray(hi)])
            ref_bf = (w_ref.astype(jnp.bfloat16)).astype(np.float32)
            exact = np.array_equal(got, ref_bf)
            close = np.allclose(got, w_ref, atol=0.15, rtol=0.05)
            print(f"correct[{name}]: exact_bf16={exact} close={close} "
                  f"maxerr={np.abs(got - w_ref).max():.4f}")
        except Exception as e:  # noqa: BLE001
            print(f"correct[{name}]: FAIL "
                  f"({type(e).__name__}: {str(e).splitlines()[0][:160]})")

    for bm in (8, 64):
        x3 = jnp.asarray(rng.normal(size=(bm, 2, HALF)), jnp.bfloat16)
        bn = 1408
        for name, mkw, srows, sarr in [
            ("u8->i32 (current)", mkw_current, 2, s_cur),
            ("i8 mask+sub     ", mkw_i8mask_sub, 2, s_sub),
            ("i8 mask affine  ", mkw_i8mask_affine, 3, s_aff),
        ]:
            acc0 = jnp.zeros((bm, 128), jnp.float32)
            timeit(f"M={bm:3d} {name}", make_step(bm, bn, mkw, srows),
                   acc0, x3, qw, sarr)


if __name__ == "__main__":
    main()
