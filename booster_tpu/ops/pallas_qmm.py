"""Fused block-dequant matmul Pallas kernels (the TPU hot path).

y = x @ W^T where W is a QTensor whose payload streams from HBM at 4 or 8
bits per value and is dequantized on the VPU inside the kernel while the MXU
consumes bf16 tiles — the TPU analog of the reference's fused quantized
matmul kernels (mmq.cu / ggml-quants.c vec_dot).

Layout contract (see quant/qtensor.py):
  i4p: qw [N, K/2] uint8, byte j = elem j | elem (j + K/2) << 4 — unpack is
       two mask ops, no lane shuffles; the two halves are consumed as two
       separate dots against x[:, :K/2] and x[:, K/2:].
  i8:  qw [N, K] int8.
  scales/mins: f32 [N, K/G]; the affine `mins` term is factored out of the
       kernel entirely:  x·(q·s − m)^T = x·(q·s)^T − xg·m^T  with xg the
       per-group sums of x (one tiny extra matmul outside the kernel).

Grid: (N/BN, K-tiles), K innermost; the [M, BN] f32 accumulator block stays
resident in VMEM across the K sweep (output index map ignores k).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from booster_tpu.quant.qtensor import QTensor, dequantize_qtensor

# flipped to True by tests to run kernels in interpreter mode on CPU
INTERPRET = False


def _expand_scales(s, g: int, k_tile: int, col0):
    """[BN, SG] (scales for the whole K range) → [BN, k_tile]: the scales for
    columns [col0, col0 + k_tile), each repeated g times.

    Mosaic can't reshape (BN, SG, g) → (BN, SG*g) for g < 128, and scale
    blocks smaller than a lane aren't loadable — so the whole scale row rides
    in VMEM (tiny) and a one-hot selector E[a, j] = (a == (col0 + j) // g)
    does select+broadcast in one MXU dot.  col0 may be traced (program_id).
    """
    sg = s.shape[1]
    col_group = (col0 + jax.lax.broadcasted_iota(jnp.int32, (sg, k_tile), 1)) // g
    row = jax.lax.broadcasted_iota(jnp.int32, (sg, k_tile), 0)
    expander = (col_group == row).astype(jnp.float32)
    return jax.lax.dot_general(
        s.astype(jnp.float32), expander, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _qmm_i4_kernel(x_ref, qw_ref, s_ref, out_ref, *, group: int, bb: int):
    """x_ref [M, 2, BB], qw_ref [BN, BB], s_ref [BN, 2, K/2/G], out [M, BN]."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    col0 = pl.program_id(1) * bb
    q = qw_ref[:].astype(jnp.int32)  # uint8 → int32 (Mosaic lacks u8→bf16)
    lo = (q & 0x0F).astype(jnp.bfloat16)
    hi = (q >> 4).astype(jnp.bfloat16)
    s_lo = _expand_scales(s_ref[:, 0, :], group, bb, col0).astype(jnp.bfloat16)
    s_hi = _expand_scales(s_ref[:, 1, :], group, bb, col0).astype(jnp.bfloat16)
    x_lo = x_ref[:, 0, :]
    x_hi = x_ref[:, 1, :]
    acc = jax.lax.dot_general(
        x_lo, lo * s_lo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc += jax.lax.dot_general(
        x_hi, hi * s_hi, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_ref[:] += acc


def _qmm_i8_kernel(x_ref, qw_ref, s_ref, out_ref, *, group: int, bk: int):
    """x_ref [M, BK], qw_ref [BN, BK] i8, s_ref [BN, K//G], out [M, BN]."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    col0 = pl.program_id(1) * bk
    w = qw_ref[:].astype(jnp.int32).astype(jnp.bfloat16) * _expand_scales(
        s_ref[:], group, bk, col0
    ).astype(jnp.bfloat16)
    out_ref[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _pick_tiles(n: int, kk: int, m: int) -> tuple[int, int]:
    """Choose (BN, BKB) tiles: lane-aligned, few big grid steps.

    Grid-step fixed overhead dominates decode (M small), so prefer the whole
    K range in one step (BKB = kk when ≤ 4096) and the largest N tile whose
    working set (payload + dequant temporaries, ~6×) fits VMEM comfortably.
    """
    bkb = kk
    if kk > 4096:
        for cand in (4096, 2816, 2048, 1408, 1024, 512, 256, 128):
            if kk % cand == 0:
                bkb = cand
                break
    budget = 1536 * 1024  # payload bytes per tile (~6x that with temporaries)
    bn = 128
    for cand in (1280, 1024, 768, 640, 512, 384, 256, 128):
        if n % cand == 0 and cand * bkb <= budget:
            bn = cand
            break
    else:
        if n % 128 != 0:
            bn = n
    return bn, bkb


def _qmm_i4(x: jnp.ndarray, w: QTensor) -> jnp.ndarray:
    M, K = x.shape
    N = w.shape[0]
    G = w.group
    half = K // 2
    BN, BB = _pick_tiles(N, half, M)
    grid = (N // BN, half // BB)

    x3 = x.reshape(M, 2, half).astype(jnp.bfloat16)

    out = pl.pallas_call(
        functools.partial(_qmm_i4_kernel, group=G, bb=BB),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, 2, BB), lambda n, k: (0, 0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, BB), lambda n, k: (n, k), memory_space=pltpu.VMEM),
            # whole scale row per N-tile (tiny); kernel selects the K slice
            pl.BlockSpec(
                (BN, 2, half // G), lambda n, k: (n, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * half + N * (K // G) * 4 + M * K * 2 + M * N * 4,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(x3, w.qw, w.scales.reshape(N, 2, half // G))
    return out


def _qmm_i8(x: jnp.ndarray, w: QTensor) -> jnp.ndarray:
    M, K = x.shape
    N = w.shape[0]
    G = w.group
    BN, BK = _pick_tiles(N, K, M)
    grid = (N // BN, K // BK)

    out = pl.pallas_call(
        functools.partial(_qmm_i8_kernel, group=G, bk=BK),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, BK), lambda n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, BK), lambda n, k: (n, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, K // G), lambda n, k: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * K + N * (K // G) * 4 + M * K * 2 + M * N * 4,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(x.astype(jnp.bfloat16), w.qw, w.scales)
    return out


def _supported(w: QTensor, K: int) -> bool:
    if w.kind not in ("i4p", "i8"):
        return False
    N = w.shape[0]
    G = w.group
    if K != w.shape[1] or K % (2 * G) != 0:
        return False
    half = K // 2 if w.kind == "i4p" else K
    if half % 128 != 0 or N % 128 != 0:
        return False
    return True


def qmm(x: jnp.ndarray, w: QTensor) -> jnp.ndarray:
    """x [..., K] @ W[N, K]^T → [..., N] float32."""
    K = x.shape[-1]
    lead = x.shape[:-1]
    if not _supported(w, K):
        wd = dequantize_qtensor(w, dtype=jnp.bfloat16)
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), wd,
            (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    y = _qmm_i4(x2, w) if w.kind == "i4p" else _qmm_i8(x2, w)
    if w.mins is not None:
        G = w.group
        xg = x2.astype(jnp.float32).reshape(M, K // G, G).sum(axis=2)
        y = y - jax.lax.dot_general(
            xg, w.mins, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    return y.reshape(*lead, w.shape[0])
