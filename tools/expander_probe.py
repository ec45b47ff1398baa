#!/usr/bin/env python
"""Probe Mosaic lowerings for the qmm scale-expansion step.

The fused dequant matmul must expand per-group scales s [BN, SG] to
per-column scales [BN, SUB] (each scale repeated g times along lanes).
The shipped kernel does this with a one-hot f32 MXU dot whose cost is
N*SG*K MACs — suspected to BE the i4/i8 dequant bottleneck (~146 GB/s
effective).  This probe checks which cheaper lowerings Mosaic accepts
(and what they cost) on the real chip:

  dot_f32    current baseline (one-hot expander, f32 dot)
  dot_bf16   same dot in bf16 (lossy scales; measures the dtype effect)
  reshape    broadcast (BN,SG,1)->(BN,SG,g) then reshape (BN,SG*g)
  jrepeat    jnp.repeat(s, g, axis=1)
  take       jnp.take(s, const_idx, axis=1) static gather
  ptile      pltpu.repeat(s, r, axis=1) tile semantics (needs permuted-K
             weight order: scale pattern s0..s_{SG-1} repeated r times)
  gloop      no expansion: one small MXU dot per scale group, scale
             applied to the [BM, BN] partial product (scales pre-
             transposed to [SG, BN] so the per-group row is a sublane)

Part 1 checks numerics on tiny shapes; part 2 times a full i8 matvec
kernel [N=4096, K=4096, G=32] at BM=8 per variant.
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


def expand_ref(s, g):
    return np.repeat(np.asarray(s), g, axis=1)


def check(name, fn, *args, want):
    try:
        got = np.asarray(jax.jit(fn)(*args))
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:140]
        print(f"  {name}: FAIL ({type(e).__name__}: {msg})")
        return False
    if got.shape != want.shape:
        print(f"  {name}: SHAPE {got.shape} != {want.shape}")
        return False
    if not np.allclose(got, want, rtol=2e-2, atol=1e-3):
        print(f"  {name}: WRONG VALUES (max err {np.abs(got - want).max():.4f})")
        return False
    print(f"  {name}: ok")
    return True


def part1_semantics():
    print("== part 1: expansion semantics inside a kernel ==")
    BN, SG, g = 8, 128, 32
    SUB = SG * g // 16  # 256
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=(BN, SG)), jnp.float32)
    want_full = expand_ref(s, g)  # [BN, SG*g]
    want = want_full[:, :SUB]

    def run(body):
        def kernel(s_ref, o_ref):
            o_ref[:] = body(s_ref[:])
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BN, SUB), jnp.float32),
        )

    # reshape route
    def body_reshape(sv):
        t = jnp.broadcast_to(sv[:, :SUB // g, None], (BN, SUB // g, g))
        return t.reshape(BN, SUB)
    check("reshape (bcast+merge, sublane g)", lambda s: run(body_reshape)(s), s,
          want=want)

    # jnp.repeat
    def body_jrepeat(sv):
        return jnp.repeat(sv[:, :SUB // g], g, axis=1)
    check("jnp.repeat", lambda s: run(body_jrepeat)(s), s, want=want)

    # static take
    idx = np.arange(SUB) // g
    def body_take(sv):
        return jnp.take(sv, jnp.asarray(idx), axis=1)
    check("jnp.take const idx", lambda s: run(body_take)(s), s, want=want)

    # pltpu.repeat tile semantics: repeat(s, r, axis=1) should give
    # s0..s_{SG-1} s0..s_{SG-1} (concat) — verify which semantics we get
    def body_ptile(sv):
        return pltpu.repeat(sv, 2, axis=1)[:, :SUB]
    want_tile = np.tile(np.asarray(s), (1, 2))[:, :SUB]
    check("pltpu.repeat (tile semantics)", lambda s: run(body_ptile)(s), s,
          want=want_tile)

    # one-hot dot in bf16
    def body_dot16(sv):
        colg = jax.lax.broadcasted_iota(jnp.int32, (SG, SUB), 1) // g
        row = jax.lax.broadcasted_iota(jnp.int32, (SG, SUB), 0)
        e = (colg == row).astype(jnp.bfloat16)
        return jax.lax.dot_general(sv.astype(jnp.bfloat16), e,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    check("one-hot dot bf16", lambda s: run(body_dot16)(s), s, want=want)


def timeit(name, fn, carry, *rest, iters=2048):
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
    print(f"{name}: {dt*1e6:.1f} us/iter")
    return dt


def make_qmm(N, K, G, BM, variant, SUB=512, BN=512):
    """Minimal whole-row i8 fused-dequant matvec kernel, one grid step per
    N tile, full K per step (the decode tile shape)."""
    SG = K // G

    def kernel(x_ref, qw_ref, s_ref, o_ref):
        acc = jnp.zeros((BM, BN), jnp.float32)
        if variant == "gloop":
            # scales pre-transposed: s_ref [SG, BN]
            for sg in range(SG):
                colv = qw_ref[:, sg * G:(sg + 1) * G].astype(jnp.bfloat16)
                part = jax.lax.dot_general(
                    x_ref[:, sg * G:(sg + 1) * G], colv,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc += part * s_ref[sg, :][None, :]
        else:
            for j in range(K // SUB):
                sl = slice(j * SUB, (j + 1) * SUB)
                q = qw_ref[:, sl].astype(jnp.bfloat16)
                if variant == "dot_f32":
                    colg = j * SUB // G + jax.lax.broadcasted_iota(
                        jnp.int32, (SG, SUB), 1) // G
                    row = jax.lax.broadcasted_iota(jnp.int32, (SG, SUB), 0)
                    e = (colg == row).astype(jnp.float32)
                    ex = jax.lax.dot_general(s_ref[:], e, (((1,), (0,)), ((), ())),
                                             preferred_element_type=jnp.float32)
                elif variant == "dot_bf16":
                    colg = j * SUB // G + jax.lax.broadcasted_iota(
                        jnp.int32, (SG, SUB), 1) // G
                    row = jax.lax.broadcasted_iota(jnp.int32, (SG, SUB), 0)
                    e = (colg == row).astype(jnp.bfloat16)
                    ex = jax.lax.dot_general(s_ref[:].astype(jnp.bfloat16), e,
                                             (((1,), (0,)), ((), ())),
                                             preferred_element_type=jnp.float32)
                elif variant == "reshape":
                    ng = SUB // G
                    t = jnp.broadcast_to(
                        s_ref[:, j * ng:(j + 1) * ng][:, :, None], (BN, ng, G))
                    ex = t.reshape(BN, SUB)
                elif variant == "jrepeat":
                    ng = SUB // G
                    ex = jnp.repeat(s_ref[:, j * ng:(j + 1) * ng], G, axis=1)
                elif variant == "take":
                    idx = jnp.asarray(np.arange(j * SUB, (j + 1) * SUB) // G)
                    ex = jnp.take(s_ref[:], idx, axis=1)
                elif variant == "ptile":
                    # permuted-K layout: scale pattern tiles with period SG
                    ex = pltpu.repeat(s_ref[:], SUB // SG, axis=1)
                elif variant in ("noscale", "castonly"):
                    ex = None
                else:
                    raise ValueError(variant)
                if variant == "castonly":
                    acc += jnp.sum(q.astype(jnp.float32)[:BM, :BN],
                                   axis=1, keepdims=True)[:, :1] * 0 + \
                        jnp.broadcast_to(jnp.sum(q.astype(jnp.float32)) * 1e-9,
                                         (BM, BN))
                    continue
                w = q if ex is None else q * ex.astype(jnp.bfloat16)
                acc += jax.lax.dot_general(
                    x_ref[:, sl], w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
        o_ref[:] = acc

    sshape = (SG, BN) if variant == "gloop" else (BN, SG)
    sspec = (pl.BlockSpec((SG, BN), lambda n: (0, n), memory_space=pltpu.VMEM)
             if variant == "gloop"
             else pl.BlockSpec((BN, SG), lambda n: (n, 0),
                               memory_space=pltpu.VMEM))

    def qmm(x, qw, s):
        return pl.pallas_call(
            kernel,
            grid=(N // BN,),
            in_specs=[
                pl.BlockSpec((BM, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BN, K), lambda n: (n, 0), memory_space=pltpu.VMEM),
                sspec,
            ],
            out_specs=pl.BlockSpec((BM, BN), lambda n: (0, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BM, N), jnp.float32),
        )(x, qw, s)

    return qmm, sshape


def part2_timing(BM=8):
    print(f"== part 2: full i8 matvec kernel per variant [4096x4096 G=32 BM={BM}] ==")
    N, K, G = 4096, 4096, 32
    SG = K // G
    rng = np.random.default_rng(0)
    qw = jnp.asarray(rng.integers(-127, 127, (N, K)), jnp.int8)
    x = jnp.asarray(rng.normal(size=(BM, K)), jnp.bfloat16)
    s_nk = rng.random((N, SG)).astype(np.float32) * 0.02

    # correctness reference
    wref = np.asarray(qw, np.float32) * expand_ref(s_nk, G)
    yref = np.asarray(x, np.float32) @ wref.T

    base = None
    for variant, sub, bn in (("dot_f32", 512, 512), ("dot_bf16", 512, 512),
                             ("ptile", 512, 512), ("ptile", 1024, 512),
                             ("ptile", 512, 1024), ("ptile", 1024, 1024),
                             ("noscale", 512, 512), ("noscale", 1024, 1024),
                             ("castonly", 1024, 1024), ("gloop", 512, 512)):
        s = jnp.asarray(s_nk.T.copy() if variant == "gloop" else s_nk)
        qmm, _ = make_qmm(N, K, G, BM, variant, SUB=sub, BN=bn)
        # numerics first (ptile needs the permuted weight order; skip check)
        if variant not in ("ptile", "noscale", "castonly"):
            try:
                y = np.asarray(jax.jit(qmm)(x, qw, s))
                err = np.abs(y - yref).max() / max(np.abs(yref).max(), 1e-6)
                tag = f"rel err {err:.2e}"
                if err > 3e-2:
                    tag += "  ** BAD **"
            except Exception as e:  # noqa: BLE001
                print(f"qmm[{variant}]: FAIL "
                      f"({type(e).__name__}: {str(e).splitlines()[0][:140]})")
                continue
        else:
            tag = "numerics n/a (needs permuted-K weights)"

        def step(xc, qw=qw, s=s, qmm=qmm):
            y = qmm(xc, qw, s)
            return y[:, :K].astype(xc.dtype)

        xc = jnp.asarray(rng.normal(size=(BM, K)), jnp.bfloat16)
        dt = timeit(f"qmm[{variant} SUB={sub} BN={bn}] ({tag})", step, xc,
                    iters=1024)
        if dt:
            gbs = N * K / dt / 1e9
            print(f"  -> {gbs:.0f} GB/s effective i8 stream")
            if variant == "dot_f32":
                base = dt


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    if "--bm" in sys.argv:
        part2_timing(BM=int(sys.argv[sys.argv.index("--bm") + 1]))
    else:
        part1_semantics()
        part2_timing()
