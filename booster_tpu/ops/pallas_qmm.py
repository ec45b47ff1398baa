"""Fused block-dequant matmul Pallas kernels (the TPU hot path).

y = x @ W^T where W is a QTensor whose payload streams from HBM at 4 or 8
bits per value and is dequantized on the VPU inside the kernel while the MXU
consumes bf16 tiles — the TPU analog of the reference's fused quantized
matmul kernels (mmq.cu / ggml-quants.c vec_dot).

Performance model (measured on v5e via axon): an M≤64 matvec is capped by
the MXU weight-feed rate (~0.4 G elem/µs) plus ~7µs per grid step, so the
kernels use few, large N-tiles, sub-tiled *inside* the kernel to bound the
dequant temporaries, and the affine `mins` term is a tiny in-kernel dot
(a separate correction matmul would pay the whole matvec floor again).

Layout contract (see quant/qtensor.py):
  i4p: qw [N, K/2] uint8, byte j = elem j | elem (j + K/2) << 4 — unpack is
       two mask ops, no lane shuffles; halves are consumed as two dots
       against x[:, :K/2] and x[:, K/2:].
  i8:  qw [N, K] int8.
  scales/mins: f32 [N, K/G]; affine mins are folded into the dequantized
       tile in-kernel (w_eff = q·s − m).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from booster_tpu.quant.qtensor import QTensor, dequantize_qtensor, kernel_scales

# flipped to True by tests to run kernels in interpreter mode on CPU
INTERPRET = False

import os as _os

_SUB = int(_os.environ.get("BT_QMM_SUB", "256"))  # in-kernel K sub-tile
_BUDGET = int(_os.environ.get("BT_QMM_BUDGET", str(2 * 1024 * 1024)))
# affine mins as a group-sum dot instead of per-element subtraction (the
# K-major kernels; BT_MIN_DOT=0 reverts to the expand+subtract form)
_MIN_DOT = _os.environ.get("BT_MIN_DOT", "1") == "1"


def _min_corr(xh, m, group: int):
    """Affine-min term Σ_k x_k·m_{k//G,n} = (x @ E) @ m as two small MXU
    dots, with E[k, g] = (k // G == g) the group-sum expander.

    The expand+subtract form costs two VPU passes over every dequantized
    element; since the K-major matvecs are element-pipeline bound
    (~0.7 G elem/µs across formats — tools/qmm_clean.py), that is exactly
    the measured q4_K-vs-q4_0 gap (277 vs 365 GB/s payload).  The dot form
    replaces it with ~1/G of the main dot's MACs per grid step, computed
    once before the sub-tile loop.  Rounding: m is consumed in bf16 like
    the subtract form; the group sums stay f32 through the correction dot
    (rounding them to bf16 loses ~5 bits on a 32-term sum — measured as
    marginal smoke-tolerance misses), so the min term is strictly more
    accurate than the bf16 per-element subtraction it replaces."""
    kk = xh.shape[-1]
    ng = m.shape[-2]
    ex = (jax.lax.broadcasted_iota(jnp.int32, (kk, ng), 0) // group
          == jax.lax.broadcasted_iota(jnp.int32, (kk, ng), 1)
          ).astype(jnp.bfloat16)
    xs = jax.lax.dot_general(xh, ex, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # mins round through bf16 like every kernel scale consumption — keeps
    # the f32-vs-compact-bf16 scale-storage bit-identity invariant — then
    # ride the dot in f32 (the group sums must not round: ~5 lost bits on
    # a 32-term sum showed up as smoke-tolerance misses)
    return jax.lax.dot_general(
        xs, m.astype(jnp.bfloat16).astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _expand_scales(s, g: int, k_tile: int, col0):
    """[BN, SG] (whole-K scale rows) → [BN, k_tile]: scales for columns
    [col0, col0 + k_tile) each repeated g times.

    Mosaic can't reshape (BN, SG, g) → (BN, SG*g) for g < 128, and scale
    blocks smaller than a lane aren't loadable — so the whole scale row rides
    in VMEM (tiny) and a one-hot selector E[a, j] = (a == (col0 + j) // g)
    does select+broadcast in one MXU dot.  col0 may be traced.
    """
    sg = s.shape[-1]
    col_group = (col0 + jax.lax.broadcasted_iota(jnp.int32, (sg, k_tile), 1)) // g
    row = jax.lax.broadcasted_iota(jnp.int32, (sg, k_tile), 0)
    expander = (col_group == row).astype(jnp.float32)
    return jax.lax.dot_general(
        s.astype(jnp.float32), expander, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _qmm_i4_kernel(x_ref, qw_ref, s_ref, out_ref, *, group: int,
                   bb: int, has_mins: bool, zero: int):
    """x_ref [BM, 2, BB] bf16, qw_ref [BN, BB] u8, s_ref [BN, 2(+2), SG]
    (scale rows, then min rows when has_mins), out [BM, BN] f32.

    Affine handling: w_eff = q·s − m with the expanded mins subtracted from
    the dequantized tile — one extra VPU op per element instead of a second
    matmul (which would pay the whole matvec floor again)."""

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    col0 = pl.program_id(2) * bb
    sub = min(_SUB, bb)
    acc = jnp.zeros_like(out_ref)
    for j in range(-(-bb // sub)):  # ceil: last sub-tile may be narrower
        w_sub = min(sub, bb - j * sub)
        sl = slice(j * sub, j * sub + w_sub)
        q = qw_ref[:, sl].astype(jnp.int32)  # u8→i32 (Mosaic lacks u8→bf16)
        lo = ((q & 0x0F) - zero).astype(jnp.bfloat16)
        hi = ((q >> 4) - zero).astype(jnp.bfloat16)
        c0 = col0 + j * sub
        w_lo = lo * _expand_scales(s_ref[:, 0, :], group, w_sub, c0).astype(jnp.bfloat16)
        w_hi = hi * _expand_scales(s_ref[:, 1, :], group, w_sub, c0).astype(jnp.bfloat16)
        if has_mins:
            w_lo -= _expand_scales(s_ref[:, 2, :], group, w_sub, c0).astype(jnp.bfloat16)
            w_hi -= _expand_scales(s_ref[:, 3, :], group, w_sub, c0).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(
            x_ref[:, 0, sl], w_lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc += jax.lax.dot_general(
            x_ref[:, 1, sl], w_hi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] += acc


def _qmm_i8_kernel(x_ref, qw_ref, s_ref, out_ref, *, group: int,
                   bk: int, has_mins: bool):
    """x_ref [BM, BK], qw_ref [BN, BK] i8, s_ref [BN, 1(+1), SG]."""

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    col0 = pl.program_id(2) * bk
    sub = min(_SUB, bk)
    acc = jnp.zeros_like(out_ref)
    for j in range(-(-bk // sub)):  # ceil: last sub-tile may be narrower
        w_sub = min(sub, bk - j * sub)
        sl = slice(j * sub, j * sub + w_sub)
        c0 = col0 + j * sub
        w = qw_ref[:, sl].astype(jnp.bfloat16) * _expand_scales(
            s_ref[:, 0, :], group, w_sub, c0
        ).astype(jnp.bfloat16)
        if has_mins:
            w -= _expand_scales(s_ref[:, 1, :], group, w_sub, c0).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(
            x_ref[:, sl], w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] += acc


_BK_CANDS = (8192, 5632, 4096, 2816, 2048, 1408, 1024, 512, 256, 128)
_BN_CANDS = (3200, 2560, 2048, 1792, 1536, 1280, 1024, 768, 640, 512,
             384, 256, 128)


def _pick_tiles(n: int, kk: int, m: int = 1, srows: int = 2,
                group: int = 32) -> tuple[int, int, int]:
    """(BM, BN, K-tile): minimize grid steps subject to the whole-kernel
    scoped-VMEM model below (grid-step overhead dominates decode, but the
    16 MB scoped limit binds first for wide-K / many-scale-row tensors).

    VMEM model (validated against Mosaic's scoped-vmem OOM reports on 8B
    ffn shapes): double-buffered blocks + accumulator + the dequant/expander
    temporaries, which Mosaic keeps live across the unrolled sub-tile loop —
    per iteration and per scale row: the [SG, SUB] selector chain and the
    [BN, SUB] expanded scales."""
    bm = m if m <= 256 else 256  # caller pads M to a multiple of 256
    sg = max(kk // group, 1)
    budget = _BUDGET
    # calibrated on Mosaic's scoped-vmem OOM reports for 8B ffn shapes
    # (model said 16.9 MB where Mosaic allocated 18.84): leave ~2.5 MB slack
    limit = 13 * 2**20 + 2**19

    def vmem_est(bn: int, bk: int) -> int:
        sub = min(_SUB, bk)
        depth = min(-(-bk // sub), 2)  # temps live ~2 unrolled iterations
        # x/qw/out/scale blocks double-buffered; scale block is the whole
        # (BN, srows, SG) row set
        blocks = 2 * (4 * bm * bk + bn * bk + 4 * bm * bn + srows * sg * 4 * bn)
        acc = 4 * bm * bn
        temps = depth * srows * (3 * sg * sub + bn * sub) * 4
        deq = 10 * bn * sub  # i32 q + bf16 lo/hi tiles
        return blocks + acc + temps + deq

    best = None
    for bk in _BK_CANDS:
        if bk > kk or kk % bk:
            continue
        for bn in _BN_CANDS:
            if bn > n or n % bn:
                continue
            if bn * bk > budget or (bm > 64 and 8 * bm * bn > budget):
                continue
            if vmem_est(bn, bk) > limit:
                continue
            steps = (n // bn) * (kk // bk)
            key = (steps, -bn * bk)
            if best is None or key < best[0]:
                best = (key, bn, bk)
        if kk == bk and best is not None:
            break
    if best is None:
        # last resort: smallest tiles (non-128-multiple N handled below)
        bn = n if n % 128 else 128
        bk = kk
        for cand in (256, 128):
            if kk % cand == 0:
                bk = cand
                break
        return bm, bn, bk
    return bm, best[1], best[2]


def _qmm_i4(x: jnp.ndarray, w: QTensor) -> jnp.ndarray:
    M, K = x.shape
    N = w.shape[0]
    G = w.group
    half = K // 2
    sg = half // G
    s3, has_mins = kernel_scales(w)  # [N, 2(+2), sg]
    BM, BN, BB = _pick_tiles(N, half, M, s3.shape[1], G)
    grid = (M // BM, N // BN, half // BB)

    x3 = x.reshape(M, 2, half).astype(jnp.bfloat16)

    return pl.pallas_call(
        functools.partial(_qmm_i4_kernel, group=G, bb=BB, has_mins=has_mins,
                          zero=w.zero),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, 2, BB), lambda m, n, k: (m, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, BB), lambda m, n, k: (n, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (BN, s3.shape[1], sg), lambda m, n, k: (n, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * half + N * (K // G) * 4 + M * K * 2 + M * N * 4,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(x3, w.qw, s3)


def _qmm_i8(x: jnp.ndarray, w: QTensor) -> jnp.ndarray:
    M, K = x.shape
    N = w.shape[0]
    G = w.group
    sg = K // G
    s3, has_mins = kernel_scales(w)  # [N, 1(+1), sg]
    BM, BN, BK = _pick_tiles(N, K, M, s3.shape[1], G)
    grid = (M // BM, N // BN, K // BK)

    return pl.pallas_call(
        functools.partial(_qmm_i8_kernel, group=G, bk=BK, has_mins=has_mins),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, BK), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, BK), lambda m, n, k: (n, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (BN, s3.shape[1], sg), lambda m, n, k: (n, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * K + N * (K // G) * 4 + M * K * 2 + M * N * 4,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(x.astype(jnp.bfloat16), w.qw, s3)


# --------------------------------------------------------------------------
# K-major ("transposed") kernels — the preferred serving layout.
#
# With qw stored [K, N] the per-group scales vary along SUBLANES of the
# weight tile, so expanding s [ng, BN] to [ng*g, BN] is a sublane broadcast
# + leading-dim merge (cheap VPU relayout) instead of the one-hot MXU dot
# the lane-major layout needs.  That dot costs N*(K/G)*K f32 MACs — measured
# to dominate every native-quant matvec (e.g. q8_0 [28672x4096]: ~820 us vs
# ~190 us of pure stream; tools/expander_probe.py, tools/tqmm_probe.py).
# --------------------------------------------------------------------------


def _expand_scales_sub(s_sub, g: int, bn: int):
    """[ng, BN] → [ng*g, BN]: scale row r repeated g times along sublanes."""
    ng = s_sub.shape[0]
    if s_sub.dtype != jnp.float32:
        # compact bf16 storage (quant.qtensor.compact_scales): widen before
        # the broadcast+merge — on 16-row bf16 tiles the merged reshape is a
        # relayout (measured −6% end-to-end), in f32 it is free
        s_sub = s_sub.astype(jnp.float32)
    return jnp.broadcast_to(s_sub[:, None, :], (ng, g, bn)).reshape(ng * g, bn)


# M=1 group-dot matvec (BT_GROUP_DOT=0 reverts): raw-payload dots against a
# block-diagonal activation matrix + ONE per-group f32 rescale.  The
# dequant kernels are element-pipeline bound at M=1 (~5-6 VPU ops per
# element: unpack, scale-expand, multiply), so instead compute
#
#     out_j = sum_g s_gj * ( (X_bd @ q)_gj  -  zero * xs_g )  -  m_gj * xs_g
#
# with X_bd[g, c] = x_c * (c//G == g) built per sub-tile (the selector is
# sub-tile-invariant) and xs the group sums.  The MXU does G x the
# matvec's MACs — idle headroom at M=1 — and per-element VPU work drops to
# the i4 nibble unpack alone; the group partials are EXACT integer dots
# carried in f32, so this is the weight-exact mmq
# (/root/reference/cpp/ggml/src/ggml-cuda/vecdotq.cuh) in its TPU-viable
# form: measured q4_0 365→547-739 GB/s, q4_K ~720→1089 G elem/s at M=1
# (tools/groupdot_probe.py); the CUDA per-group shape loses only at M>=8
# where the [M·ng, BN] rescale turns VPU-bound (tools/qmm_gap.py v6).
_GROUP_DOT = _os.environ.get("BT_GROUP_DOT", "1") == "1"


def _gd_parts(xrow, w_sub: int, group: int):
    """[1, w_sub] bf16 row → (X_bd [ngs, w_sub] bf16, xs [ngs, 1] f32).
    Arithmetic masking: an i1 `where` mask hits a Mosaic replicated-layout
    relayout error; multiply by a 0/1 bf16 selector lowers clean."""
    ngs = w_sub // group
    sel = (jax.lax.broadcasted_iota(jnp.int32, (ngs, w_sub), 1) // group
           == jax.lax.broadcasted_iota(jnp.int32, (ngs, w_sub), 0)
           ).astype(jnp.bfloat16)
    X = jnp.broadcast_to(xrow, (ngs, w_sub)).astype(jnp.bfloat16) * sel
    xs = jnp.sum(X.astype(jnp.float32), axis=1, keepdims=True)
    return X, xs


def _gd_sc(v):
    """Scales/mins consumed at bf16 precision (keeps the f32-vs-compact-bf16
    scale-storage bit-identity) but carried f32 into the rescale."""
    return v.astype(jnp.bfloat16).astype(jnp.float32)


def _tqmm_i8_gd_kernel(x_ref, qw_ref, s_ref, out_ref, *, group: int,
                       bk: int, bn: int, has_mins: bool,
                       stacked: bool = False):
    """Group-dot twin of _tqmm_i8_kernel (M=1). Same operand layout."""

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def qw(sl):
        return qw_ref[0, sl, :] if stacked else qw_ref[sl, :]

    def sc(r, gsl):
        return s_ref[0, r, gsl, :] if stacked else s_ref[r, gsl, :]

    sub = min(_SUB, bk)
    acc = jnp.zeros_like(out_ref)
    for j in range(-(-bk // sub)):
        w_sub = min(sub, bk - j * sub)
        sl = slice(j * sub, j * sub + w_sub)
        gsl = slice(j * sub // group, (j * sub + w_sub) // group)
        X, xs = _gd_parts(x_ref[:, sl], w_sub, group)
        p = jax.lax.dot_general(
            X, qw(sl).astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        contrib = _gd_sc(sc(0, gsl)) * p
        if has_mins:
            contrib = contrib - _gd_sc(sc(1, gsl)) * xs
        acc += jnp.sum(contrib, axis=0, keepdims=True)
    out_ref[:] += acc


def _tqmm_i4_gd_kernel(x_ref, qw_ref, s_ref, out_ref, *, group: int,
                       bkh: int, bn: int, has_mins: bool, zero: int,
                       stacked: bool = False):
    """Group-dot twin of _tqmm_i4_kernel (M=1): raw nibbles feed the dots
    (no -zero, no scale multiply); zero and mins fold via the group sums."""

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def qw(sl):
        return qw_ref[0, sl, :] if stacked else qw_ref[sl, :]

    def sc(r, gsl):
        return s_ref[0, r, gsl, :] if stacked else s_ref[r, gsl, :]

    sub = min(_SUB, bkh)
    acc = jnp.zeros_like(out_ref)
    for j in range(-(-bkh // sub)):
        w_sub = min(sub, bkh - j * sub)
        sl = slice(j * sub, j * sub + w_sub)
        gsl = slice(j * sub // group, (j * sub + w_sub) // group)
        q = qw(sl).astype(jnp.int32)  # u8→i32 (Mosaic lacks u8→bf16)
        planes = ((q & 0x0F).astype(jnp.bfloat16),
                  (q >> 4).astype(jnp.bfloat16))
        for h in (0, 1):
            X, xs = _gd_parts(x_ref[:, h, sl], w_sub, group)
            p = jax.lax.dot_general(
                X, planes[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if zero:
                p = p - float(zero) * xs
            contrib = _gd_sc(sc(h, gsl)) * p
            if has_mins:
                contrib = contrib - _gd_sc(sc(2 + h, gsl)) * xs
            acc += jnp.sum(contrib, axis=0, keepdims=True)
    out_ref[:] += acc


def _tqmm_i8_kernel(x_ref, qw_ref, s_ref, out_ref, *, group: int, bk: int,
                    bn: int, has_mins: bool, stacked: bool = False):
    """x_ref [BM, BK] bf16, qw_ref [BK, BN] i8, s_ref [R, BK/G, BN] f32 or
    bf16 (compact_scales; widened to f32 before the sublane broadcast).
    `stacked`: qw/s blocks carry a leading layer dim of 1 (the layer is
    selected by scalar-prefetch index maps — see QTensor.layer)."""

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def qw(sl):
        return qw_ref[0, sl, :] if stacked else qw_ref[sl, :]

    def sc(r, gsl):
        return s_ref[0, r, gsl, :] if stacked else s_ref[r, gsl, :]

    sub = min(_SUB, bk)
    acc = jnp.zeros_like(out_ref)
    min_dot = has_mins and _MIN_DOT
    if min_dot:
        acc -= _min_corr(x_ref[:, :], sc(1, slice(None)), group)
    for j in range(-(-bk // sub)):
        w_sub = min(sub, bk - j * sub)
        sl = slice(j * sub, j * sub + w_sub)
        gsl = slice(j * sub // group, (j * sub + w_sub) // group)
        w = qw(sl).astype(jnp.bfloat16) * _expand_scales_sub(
            sc(0, gsl), group, bn).astype(jnp.bfloat16)
        if has_mins and not min_dot:
            w -= _expand_scales_sub(sc(1, gsl), group, bn).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(
            x_ref[:, sl], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] += acc


def _tqmm_i4_kernel(x_ref, qw_ref, s_ref, out_ref, *, group: int, bkh: int,
                    bn: int, has_mins: bool, zero: int,
                    stacked: bool = False):
    """x_ref [BM, 2, BKH] bf16, qw_ref [BKH, BN] u8 (byte row k = elem k lo
    nibble, elem k + K/2 hi), s_ref [2(+2), BKH/G, BN] f32 or bf16
    (compact_scales; widened to f32 before the sublane broadcast).
    `stacked`: see _tqmm_i8_kernel."""

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def qw(sl):
        return qw_ref[0, sl, :] if stacked else qw_ref[sl, :]

    def sc(r, gsl):
        return s_ref[0, r, gsl, :] if stacked else s_ref[r, gsl, :]

    sub = min(_SUB, bkh)
    acc = jnp.zeros_like(out_ref)
    min_dot = has_mins and _MIN_DOT
    if min_dot:
        acc -= _min_corr(x_ref[:, 0, :], sc(2, slice(None)), group)
        acc -= _min_corr(x_ref[:, 1, :], sc(3, slice(None)), group)
    for j in range(-(-bkh // sub)):
        w_sub = min(sub, bkh - j * sub)
        sl = slice(j * sub, j * sub + w_sub)
        gsl = slice(j * sub // group, (j * sub + w_sub) // group)
        q = qw(sl).astype(jnp.int32)  # u8→i32 (Mosaic lacks u8→bf16)
        lo = ((q & 0x0F) - zero).astype(jnp.bfloat16)
        hi = ((q >> 4) - zero).astype(jnp.bfloat16)
        w_lo = lo * _expand_scales_sub(sc(0, gsl), group, bn).astype(jnp.bfloat16)
        w_hi = hi * _expand_scales_sub(sc(1, gsl), group, bn).astype(jnp.bfloat16)
        if has_mins and not min_dot:
            w_lo -= _expand_scales_sub(sc(2, gsl), group, bn).astype(jnp.bfloat16)
            w_hi -= _expand_scales_sub(sc(3, gsl), group, bn).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(
            x_ref[:, 0, sl], w_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc += jax.lax.dot_general(
            x_ref[:, 1, sl], w_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] += acc


def _pick_tiles_t(n: int, pk: int, m: int, srows: int, group: int,
                  x_mult: int, deq_bytes: int,
                  s_item: int = 4) -> tuple[int, int, int]:
    """(BM, BN, payload-K tile) for the transposed kernels: minimize grid
    steps under the scoped-VMEM model.  `pk` counts PAYLOAD rows (K for i8t,
    K/2 for i4t); `x_mult` is x bytes per payload row per M (2 for i8t bf16,
    4 for i4t's two halves); `deq_bytes` bounds the per-subtile dequant
    temporaries per element; `s_item` is the scale-plane itemsize (4 for
    f32, 2 for the bf16 compact_scales storage)."""
    bm = m if m <= 256 else 256
    limit = 13 * 2**20 + 2**19
    s_sub = 8 if s_item == 4 else 16  # native sublane tile for the scale dtype

    def vmem_est(bn: int, bk: int) -> int:
        sub = min(_SUB, bk)
        depth = min(-(-bk // sub), 2)
        blocks = 2 * (x_mult * bm * bk + bn * bk
                      + 4 * bm * bn + srows * (bk // group) * s_item * bn)
        acc = 4 * bm * bn
        temps = depth * deq_bytes * sub * bn
        return blocks + acc + temps

    best = None
    for bk in _BK_CANDS:
        if bk > pk or pk % bk:
            continue
        # scale sub-block sublane dim must be a multiple of the dtype's
        # sublane tile (or the whole row set); payload tile sublanes must
        # match the (32, 128) i8 tiling
        if bk != pk and (bk % group or (bk // group) % s_sub or bk % 32):
            continue
        for bn in _BN_CANDS:
            if bn > n or n % bn:
                continue
            if bn * bk > _BUDGET or (bm > 64 and x_mult * bm * bn > _BUDGET):
                continue
            if vmem_est(bn, bk) > limit:
                continue
            steps = (n // bn) * (pk // bk)
            key = (steps, -bn * bk)
            if best is None or key < best[0]:
                best = (key, bn, bk)
        if pk == bk and best is not None:
            break
    if best is None:
        # fallback (bf16 scales tighten the sublane gate, pruning most
        # sub-pk candidates): still respect the VMEM model — shrink BN
        # first, then accept the smallest K tile even over budget rather
        # than return an unchecked bk=pk (a latent scoped-VMEM OOM)
        bn0 = n if n % 128 else 128
        valid = [pk] + [
            c for c in _BK_CANDS if c < pk and pk % c == 0
            and not (c % group or (c // group) % s_sub or c % 32)
        ]  # same shape-validity gate as the main loop
        for bk in valid:
            if vmem_est(bn0, bk) <= limit:
                return bm, bn0, bk
        # last resort: everything is over budget — take the smallest valid
        # K tile (minimizes the VMEM blocks) rather than an unchecked bk=pk
        return bm, bn0, min(valid)
    return bm, best[1], best[2]


def _tqmm_i8(x: jnp.ndarray, w: QTensor) -> jnp.ndarray:
    M, K = x.shape
    N = w.shape[0]
    G = w.group
    sg = K // G
    s3, has_mins = kernel_scales(w)  # [(L,) R, sg, N]
    rows = s3.shape[-3]
    BM, BN, BK = _pick_tiles_t(N, K, M, rows, G, 2, 9, s3.dtype.itemsize)
    grid = (M // BM, N // BN, K // BK)
    stacked = w.layer is not None
    common = dict(
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(N * K + N * sg * s3.dtype.itemsize + M * K * 2
                            + M * N * 4),
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )
    kfn = (_tqmm_i8_gd_kernel if M == 1 and _GROUP_DOT
           else _tqmm_i8_kernel)
    kern = functools.partial(kfn, group=G, bk=BK, bn=BN,
                             has_mins=has_mins, stacked=stacked)
    xb = x.astype(jnp.bfloat16)
    if not stacked:
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BM, BK), lambda m, n, k: (m, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BK, BN), lambda m, n, k: (k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, BK // G, BN), lambda m, n, k: (0, k, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BM, BN), lambda m, n, k: (m, n),
                                   memory_space=pltpu.VMEM),
            **common,
        )(xb, w.qw, s3)
    # stacked: the layer rides as a scalar-prefetch index — no XLA slice
    # (which would copy the whole layer's weights; tools/slice_probe.py)
    lay = jnp.asarray(w.layer, jnp.int32).reshape(1)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, BK), lambda m, n, k, l: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, BN), lambda m, n, k, l: (l[0], k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, BK // G, BN),
                         lambda m, n, k, l: (l[0], 0, k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda m, n, k, l: (m, n),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(lambda lay_ref, *refs: kern(*refs),
                          grid_spec=gs, **common)(lay, xb, w.qw, s3)


def _tqmm_i4(x: jnp.ndarray, w: QTensor) -> jnp.ndarray:
    M, K = x.shape
    N = w.shape[0]
    G = w.group
    half = K // 2
    sgh = half // G
    s3, has_mins = kernel_scales(w)  # [(L,) R, sgh, N]
    rows = s3.shape[-3]
    BM, BN, BB = _pick_tiles_t(N, half, M, rows, G, 4, 16,
                               s3.dtype.itemsize)
    grid = (M // BM, N // BN, half // BB)
    stacked = w.layer is not None
    x3 = x.reshape(M, 2, half).astype(jnp.bfloat16)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(N * half + N * sgh * 2 * s3.dtype.itemsize
                            + M * K * 2 + M * N * 4),
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )
    kfn = (_tqmm_i4_gd_kernel if M == 1 and _GROUP_DOT
           else _tqmm_i4_kernel)
    kern = functools.partial(kfn, group=G, bkh=BB, bn=BN,
                             has_mins=has_mins, zero=w.zero, stacked=stacked)
    if not stacked:
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BM, 2, BB), lambda m, n, k: (m, 0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BB, BN), lambda m, n, k: (k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, BB // G, BN), lambda m, n, k: (0, k, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BM, BN), lambda m, n, k: (m, n),
                                   memory_space=pltpu.VMEM),
            **common,
        )(x3, w.qw, s3)
    lay = jnp.asarray(w.layer, jnp.int32).reshape(1)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, 2, BB), lambda m, n, k, l: (m, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, BN), lambda m, n, k, l: (l[0], k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, BB // G, BN),
                         lambda m, n, k, l: (l[0], 0, k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda m, n, k, l: (m, n),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(lambda lay_ref, *refs: kern(*refs),
                          grid_spec=gs, **common)(lay, x3, w.qw, s3)


# --------------------------------------------------------------------------
# Fused gate-up-act epilogue (K-major): one kernel computes
#   out = act(x @ Wg^T) * (x @ Wu^T)            (bf16 out)
# from the loader's fused [.., K, 2ff] gateup payload — the gate and up
# column blocks ride as two views of the SAME array with offset index maps.
# Removes the [M, 2ff] intermediate entirely: pallas_calls are opaque to
# XLA, so the unfused path writes gu to HBM, reads it for act·mul, and
# writes the product again (~11 MB/layer at the 7B B=64 bench shape).
# Bit-exact with the unfused path: same sub-tile accumulation order, same
# f32 act·mul, same bf16 rounding point (qlinear casts the down-proj input
# to bf16 anyway).  Reference analog: the fused gated-FFN epilogues the
# CUDA backend gets from operator fusion (ggml-cuda unary+mul fusion).
# --------------------------------------------------------------------------


def _gateup_i8_kernel(x_ref, qg_ref, qu_ref, sg_ref, su_ref, out_ref,
                      accg_ref, accu_ref, *, group: int, bk: int, bn: int,
                      act: str, has_mins: bool = False,
                      stacked: bool = False):
    """x [BM, BK] bf16, qg/qu [BK, BN] i8 (two offset views of the fused
    payload), sg/su [1, R, BK/G, BN] scale(+min) views, out [BM, BN] bf16,
    accg/accu [BM, BN] f32 VMEM scratch accumulators."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        accg_ref[:] = jnp.zeros_like(accg_ref)
        accu_ref[:] = jnp.zeros_like(accu_ref)

    def qw(ref, sl):
        return ref[0, sl, :] if stacked else ref[sl, :]

    def sc(ref, r, gsl):
        return ref[0, r, gsl, :] if stacked else ref[r, gsl, :]

    sub = min(_SUB, bk)
    ag = jnp.zeros_like(accg_ref)
    au = jnp.zeros_like(accu_ref)
    min_dot = has_mins and _MIN_DOT
    if min_dot:  # same op sequence as _tqmm_i8_kernel → stays bit-exact
        ag -= _min_corr(x_ref[:, :], sc(sg_ref, 1, slice(None)), group)
        au -= _min_corr(x_ref[:, :], sc(su_ref, 1, slice(None)), group)
    for j in range(-(-bk // sub)):
        w_sub = min(sub, bk - j * sub)
        sl = slice(j * sub, j * sub + w_sub)
        gsl = slice(j * sub // group, (j * sub + w_sub) // group)
        xs = x_ref[:, sl]
        for qref, sref, acc in ((qg_ref, sg_ref, 0), (qu_ref, su_ref, 1)):
            w = qw(qref, sl).astype(jnp.bfloat16) * _expand_scales_sub(
                sc(sref, 0, gsl), group, bn).astype(jnp.bfloat16)
            if has_mins and not min_dot:
                w -= _expand_scales_sub(sc(sref, 1, gsl), group,
                                        bn).astype(jnp.bfloat16)
            d = jax.lax.dot_general(xs, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if acc == 0:
                ag += d
            else:
                au += d
    accg_ref[:] += ag
    accu_ref[:] += au

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        # match the unfused path: f32 accumulators round to bf16 (qlinear's
        # astype(x.dtype)), act runs on the bf16 values (silu/relu) or
        # widens them (gelu, _act), product cast to bf16 at the down-proj
        # input — bit-exact with qlinear + _act + mul
        gb = accg_ref[:].astype(jnp.bfloat16)
        ub = accu_ref[:].astype(jnp.bfloat16)
        if act == "gelu":
            # _act widens the (bf16-rounded) gate to f32 for gelu
            r = jax.nn.gelu(gb.astype(jnp.float32),
                            approximate=True).astype(jnp.bfloat16) * ub
        elif act == "relu":
            r = jnp.maximum(gb, 0) * ub
        else:
            # silu with the sigmoid computed in f32: Mosaic's bf16 logistic
            # lowering emits an f32->bf16 vector.broadcast that fails MLIR
            # verification (found on-chip, tools/gateup_repro.py); XLA also
            # evaluates the transcendental in f32, so rounding the sigmoid
            # to bf16 before the product matches the unfused path bit-exactly
            sg = jax.lax.logistic(gb.astype(jnp.float32)).astype(jnp.bfloat16)
            r = (gb * sg) * ub
        out_ref[:] = r.astype(out_ref.dtype)


def _gateup_i4_kernel(x_ref, qg_ref, qu_ref, sg_ref, su_ref, out_ref,
                      accg_ref, accu_ref, *, group: int, bkh: int, bn: int,
                      act: str, has_mins: bool, zero: int,
                      stacked: bool = False):
    """i4 twin of _gateup_i8_kernel: payload views carry lo/hi nibble
    halves on K (x [BM, 2, BKH]); affine formats fold w_eff = q·s − m like
    _tqmm_i4_kernel."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        accg_ref[:] = jnp.zeros_like(accg_ref)
        accu_ref[:] = jnp.zeros_like(accu_ref)

    def qw(ref, sl):
        return ref[0, sl, :] if stacked else ref[sl, :]

    def sc(ref, r, gsl):
        return ref[0, r, gsl, :] if stacked else ref[r, gsl, :]

    sub = min(_SUB, bkh)
    accs = [jnp.zeros_like(accg_ref), jnp.zeros_like(accu_ref)]
    min_dot = has_mins and _MIN_DOT
    if min_dot:  # same op sequence as _tqmm_i4_kernel → stays bit-exact
        for i, sref in enumerate((sg_ref, su_ref)):
            accs[i] -= _min_corr(x_ref[:, 0, :], sc(sref, 2, slice(None)),
                                 group)
            accs[i] -= _min_corr(x_ref[:, 1, :], sc(sref, 3, slice(None)),
                                 group)
    for j in range(-(-bkh // sub)):
        w_sub = min(sub, bkh - j * sub)
        sl = slice(j * sub, j * sub + w_sub)
        gsl = slice(j * sub // group, (j * sub + w_sub) // group)
        for i, (qref, sref) in enumerate(((qg_ref, sg_ref), (qu_ref, su_ref))):
            q = qw(qref, sl).astype(jnp.int32)
            lo = ((q & 0x0F) - zero).astype(jnp.bfloat16)
            hi = ((q >> 4) - zero).astype(jnp.bfloat16)
            w_lo = lo * _expand_scales_sub(sc(sref, 0, gsl), group,
                                           bn).astype(jnp.bfloat16)
            w_hi = hi * _expand_scales_sub(sc(sref, 1, gsl), group,
                                           bn).astype(jnp.bfloat16)
            if has_mins and not min_dot:
                w_lo -= _expand_scales_sub(sc(sref, 2, gsl), group,
                                           bn).astype(jnp.bfloat16)
                w_hi -= _expand_scales_sub(sc(sref, 3, gsl), group,
                                           bn).astype(jnp.bfloat16)
            accs[i] += jax.lax.dot_general(
                x_ref[:, 0, sl], w_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            accs[i] += jax.lax.dot_general(
                x_ref[:, 1, sl], w_hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    accg_ref[:] += accs[0]
    accu_ref[:] += accs[1]

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        gb = accg_ref[:].astype(jnp.bfloat16)
        ub = accu_ref[:].astype(jnp.bfloat16)
        if act == "gelu":
            r = jax.nn.gelu(gb.astype(jnp.float32),
                            approximate=True).astype(jnp.bfloat16) * ub
        elif act == "relu":
            r = jnp.maximum(gb, 0) * ub
        else:
            # silu with the sigmoid computed in f32: Mosaic's bf16 logistic
            # lowering emits an f32->bf16 vector.broadcast that fails MLIR
            # verification (found on-chip, tools/gateup_repro.py); XLA also
            # evaluates the transcendental in f32, so rounding the sigmoid
            # to bf16 before the product matches the unfused path bit-exactly
            sg = jax.lax.logistic(gb.astype(jnp.float32)).astype(jnp.bfloat16)
            r = (gb * sg) * ub
        out_ref[:] = r.astype(out_ref.dtype)


def _gateup_i8_gd_kernel(x_ref, qg_ref, qu_ref, sg_ref, su_ref, out_ref,
                         accg_ref, accu_ref, *, group: int, bk: int,
                         bn: int, act: str, has_mins: bool = False,
                         stacked: bool = False):
    """Group-dot twin of _gateup_i8_kernel (M=1): per-accumulator op
    sequence matches _tqmm_i8_gd_kernel → fused == unfused bit-exact."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        accg_ref[:] = jnp.zeros_like(accg_ref)
        accu_ref[:] = jnp.zeros_like(accu_ref)

    def qw(ref, sl):
        return ref[0, sl, :] if stacked else ref[sl, :]

    def sc(ref, r, gsl):
        return ref[0, r, gsl, :] if stacked else ref[r, gsl, :]

    sub = min(_SUB, bk)
    ag = jnp.zeros_like(accg_ref)
    au = jnp.zeros_like(accu_ref)
    for j in range(-(-bk // sub)):
        w_sub = min(sub, bk - j * sub)
        sl = slice(j * sub, j * sub + w_sub)
        gsl = slice(j * sub // group, (j * sub + w_sub) // group)
        X, xs = _gd_parts(x_ref[:, sl], w_sub, group)
        for qref, sref, i in ((qg_ref, sg_ref, 0), (qu_ref, su_ref, 1)):
            p = jax.lax.dot_general(
                X, qw(qref, sl).astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            contrib = _gd_sc(sc(sref, 0, gsl)) * p
            if has_mins:
                contrib = contrib - _gd_sc(sc(sref, 1, gsl)) * xs
            d = jnp.sum(contrib, axis=0, keepdims=True)
            if i == 0:
                ag += d
            else:
                au += d
    accg_ref[:] += ag
    accu_ref[:] += au

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        gb = accg_ref[:].astype(jnp.bfloat16)
        ub = accu_ref[:].astype(jnp.bfloat16)
        if act == "gelu":
            r = jax.nn.gelu(gb.astype(jnp.float32),
                            approximate=True).astype(jnp.bfloat16) * ub
        elif act == "relu":
            r = jnp.maximum(gb, 0) * ub
        else:
            # f32 sigmoid, rounded before the product (see _gateup_i8_kernel)
            sg = jax.lax.logistic(gb.astype(jnp.float32)).astype(jnp.bfloat16)
            r = (gb * sg) * ub
        out_ref[:] = r.astype(out_ref.dtype)


def _gateup_i4_gd_kernel(x_ref, qg_ref, qu_ref, sg_ref, su_ref, out_ref,
                         accg_ref, accu_ref, *, group: int, bkh: int,
                         bn: int, act: str, has_mins: bool, zero: int,
                         stacked: bool = False):
    """Group-dot twin of _gateup_i4_kernel (M=1): per-accumulator op
    sequence matches _tqmm_i4_gd_kernel → fused == unfused bit-exact."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        accg_ref[:] = jnp.zeros_like(accg_ref)
        accu_ref[:] = jnp.zeros_like(accu_ref)

    def qw(ref, sl):
        return ref[0, sl, :] if stacked else ref[sl, :]

    def sc(ref, r, gsl):
        return ref[0, r, gsl, :] if stacked else ref[r, gsl, :]

    sub = min(_SUB, bkh)
    accs = [jnp.zeros_like(accg_ref), jnp.zeros_like(accu_ref)]
    for j in range(-(-bkh // sub)):
        w_sub = min(sub, bkh - j * sub)
        sl = slice(j * sub, j * sub + w_sub)
        gsl = slice(j * sub // group, (j * sub + w_sub) // group)
        parts = [_gd_parts(x_ref[:, h, sl], w_sub, group) for h in (0, 1)]
        for i, (qref, sref) in enumerate(((qg_ref, sg_ref), (qu_ref, su_ref))):
            q = qw(qref, sl).astype(jnp.int32)
            planes = ((q & 0x0F).astype(jnp.bfloat16),
                      (q >> 4).astype(jnp.bfloat16))
            for h in (0, 1):
                X, xs = parts[h]
                p = jax.lax.dot_general(
                    X, planes[h], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if zero:
                    p = p - float(zero) * xs
                contrib = _gd_sc(sc(sref, h, gsl)) * p
                if has_mins:
                    contrib = contrib - _gd_sc(sc(sref, 2 + h, gsl)) * xs
                accs[i] += jnp.sum(contrib, axis=0, keepdims=True)
    accg_ref[:] += accs[0]
    accu_ref[:] += accs[1]

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        gb = accg_ref[:].astype(jnp.bfloat16)
        ub = accu_ref[:].astype(jnp.bfloat16)
        if act == "gelu":
            r = jax.nn.gelu(gb.astype(jnp.float32),
                            approximate=True).astype(jnp.bfloat16) * ub
        elif act == "relu":
            r = jnp.maximum(gb, 0) * ub
        else:
            # f32 sigmoid, rounded before the product (see _gateup_i4_kernel)
            sg = jax.lax.logistic(gb.astype(jnp.float32)).astype(jnp.bfloat16)
            r = (gb * sg) * ub
        out_ref[:] = r.astype(out_ref.dtype)


def _pick_tiles_gateup(ff: int, pk: int, m: int, srows: int, group: int,
                       s_item: int, x_mult: int,
                       deq_bytes: int) -> tuple[int, int, int]:
    """Tile picker for the two-payload epilogue kernel: the VMEM model
    doubles the weight/scale blocks and adds the two f32 accumulators."""
    bm = m if m <= 256 else 256
    limit = 13 * 2**20 + 2**19
    s_sub = 8 if s_item == 4 else 16

    def vmem_est(bn: int, bk: int) -> int:
        sub = min(_SUB, bk)
        depth = min(-(-bk // sub), 2)
        blocks = 2 * (x_mult * bm * bk + 2 * bn * bk + 2 * bm * bn
                      + 2 * srows * (bk // group) * s_item * bn)
        acc = 2 * 4 * bm * bn
        temps = depth * 2 * deq_bytes * sub * bn
        return blocks + acc + temps

    best = None
    for bk in _BK_CANDS:
        if bk > pk or pk % bk:
            continue
        if bk != pk and (bk % group or (bk // group) % s_sub or bk % 32):
            continue
        for bn in _BN_CANDS:
            if bn > ff or ff % bn:
                continue
            if 2 * bn * bk > _BUDGET * 2:
                continue
            if vmem_est(bn, bk) > limit:
                continue
            steps = (ff // bn) * (pk // bk)
            key = (steps, -bn * bk)
            if best is None or key < best[0]:
                best = (key, bn, bk)
        if pk == bk and best is not None:
            break
    if best is None:
        return bm, 0, 0  # caller falls back to the unfused path
    return bm, best[1], best[2]


def qmm_gateup(x: jnp.ndarray, w: QTensor, act: str) -> Optional[jnp.ndarray]:
    """act(x @ Wg^T) * (x @ Wu^T) from a fused [2ff, K] gateup QTensor.
    Returns None when the shape/kind is unsupported (caller runs the
    unfused qlinear + act·mul path)."""
    K = x.shape[-1]
    if w.kind not in ("i8t", "i4t") or w.scales is None or not w.transposed:
        return None
    N2 = w.shape[0]
    if N2 % 2 or K != w.shape[1]:
        return None
    ff = N2 // 2
    G = w.group
    is4 = w.kind == "i4t"
    pk = K // 2 if is4 else K
    s3, has_mins = kernel_scales(w)  # [(L,) R, pk/G, 2ff]
    rows = s3.shape[-3]
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    s_sub = 8 if s3.dtype.itemsize == 4 else 16
    if K % (2 * G) or pk % 32 or (pk // G) % s_sub or ff % 128:
        return None
    BM, BN, BK = _pick_tiles_gateup(ff, pk, M, rows, G, s3.dtype.itemsize,
                                    4 if is4 else 2, 16 if is4 else 9)
    if BN == 0:
        return None
    x2 = x.reshape(M, K)
    Mp = M if M <= 256 else ((M + 255) // 256) * 256
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    grid = (Mp // BM, ff // BN, pk // BK)
    stacked = w.layer is not None
    nblk = ff // BN
    common = dict(
        out_shape=jax.ShapeDtypeStruct((Mp, ff), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N2 * K,
            bytes_accessed=(N2 * pk + N2 * (pk // G) * rows
                            * s3.dtype.itemsize + Mp * K * 2 + Mp * ff * 2),
            transcendentals=Mp * ff,
        ),
        interpret=INTERPRET,
    )
    scratch = [pltpu.VMEM((BM, BN), jnp.float32),
               pltpu.VMEM((BM, BN), jnp.float32)]
    gd = Mp == 1 and _GROUP_DOT
    if is4:
        kfn = _gateup_i4_gd_kernel if gd else _gateup_i4_kernel
        kern = functools.partial(kfn, group=G, bkh=BK, bn=BN,
                                 act=act, has_mins=has_mins, zero=w.zero,
                                 stacked=stacked)
        xb = x2.reshape(Mp, 2, K // 2).astype(jnp.bfloat16)
        x_spec = ((BM, 2, BK), (lambda m, n, k: (m, 0, k)),
                  (lambda m, n, k, l: (m, 0, k)))
    else:
        kfn = _gateup_i8_gd_kernel if gd else _gateup_i8_kernel
        kern = functools.partial(kfn, group=G, bk=BK, bn=BN,
                                 act=act, has_mins=has_mins, stacked=stacked)
        xb = x2.astype(jnp.bfloat16)
        x_spec = ((BM, BK), (lambda m, n, k: (m, k)),
                  (lambda m, n, k, l: (m, k)))
    if not stacked:
        y = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(x_spec[0], x_spec[1], memory_space=pltpu.VMEM),
                pl.BlockSpec((BK, BN), lambda m, n, k: (k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BK, BN), lambda m, n, k: (k, n + nblk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, BK // G, BN), lambda m, n, k: (0, k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, BK // G, BN),
                             lambda m, n, k: (0, k, n + nblk),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BM, BN), lambda m, n, k: (m, n),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
            **common,
        )(xb, w.qw, w.qw, s3, s3)
    else:
        lay = jnp.asarray(w.layer, jnp.int32).reshape(1)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(x_spec[0], x_spec[2], memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BK, BN), lambda m, n, k, l: (l[0], k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BK, BN),
                             lambda m, n, k, l: (l[0], k, n + nblk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, BK // G, BN),
                             lambda m, n, k, l: (l[0], 0, k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, BK // G, BN),
                             lambda m, n, k, l: (l[0], 0, k, n + nblk),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BM, BN), lambda m, n, k, l: (m, n),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        y = pl.pallas_call(lambda lay_ref, *refs: kern(*refs),
                           grid_spec=gs, **common)(lay, xb, w.qw, w.qw,
                                                    s3, s3)
    if Mp != M:
        y = y[:M]
    return y.reshape(*lead, ff)


# --------------------------------------------------------------------------
# Fully-fused MLP kernel (K-major i8):
#   out = (act(x @ Wg^T) * (x @ Wu^T)) @ Wd^T         ([.., C] float32)
# One pallas_call per layer replaces gateup + down — beyond the mid
# tensor's HBM round trip, each pallas launch carries a fixed prologue/
# epilogue cost that dominated the config-3 step (the step ran at ~460
# effective GB/s while every kernel streamed at ~620; merging the gateup
# pair alone was measured −1.31 ms/step where byte accounting predicted
# −0.3).  The grid is (M tiles, ff tiles): x rides whole-K with a constant
# index map (fetched once), gate/up accumulate f32 over in-kernel K
# sub-tiles, the act·mul epilogue produces the mid tile in registers, and
# the down projection accumulates into a [BM, C] f32 scratch written at
# the last ff step.  Bit-exact with the unfused path: same sub-tile
# accumulation orders, same bf16 rounding points.
#
# The down scale plane (bf16, [R, ff/G, C]) has only BF/G = 8 sublanes per
# ff tile — half a bf16 sublane tile — so its block covers TWO ff steps
# (index map f//2) and the kernel selects the (f % 2) half in VMEM.
# --------------------------------------------------------------------------


def _mlp_i8_kernel(x_ref, qg_ref, qu_ref, sg_ref, su_ref, qd_ref, sd_ref,
                   out_ref, acco_ref, *, group: int, bf: int, kk: int,
                   act: str, has_mins: bool, d_has_mins: bool, c: int,
                   pair: bool, stacked: bool = False):
    """x [BM, K] bf16 (whole-K, constant index), qg/qu [(1,) K, BF] i8
    views of the fused gateup payload, sg/su [(1,) R, K/G, BF] scale(+min)
    views, qd [(1,) BF, C] i8 down payload tile, sd [(1,) R2, 16|BF/G, C]
    down scales (paired over two ff steps when `pair`), out [BM, C] f32,
    acco [BM, C] f32 VMEM scratch."""
    f = pl.program_id(1)

    @pl.when(f == 0)
    def _():
        acco_ref[:] = jnp.zeros_like(acco_ref)

    def qw(ref, sl):
        return ref[0, sl, :] if stacked else ref[sl, :]

    def sc(ref, r, gsl):
        return ref[0, r, gsl, :] if stacked else ref[r, gsl, :]

    # gate/up: full-K contraction in sub-tiles (same order as the gateup
    # kernel at BK = K, so mid is bit-identical)
    sub = min(_SUB, kk)
    ag = jnp.zeros((x_ref.shape[0], bf), jnp.float32)
    au = jnp.zeros((x_ref.shape[0], bf), jnp.float32)
    min_dot = has_mins and _MIN_DOT
    if min_dot:  # same op sequence as _tqmm_i8_kernel → stays bit-exact
        ag -= _min_corr(x_ref[:, :], sc(sg_ref, 1, slice(None)), group)
        au -= _min_corr(x_ref[:, :], sc(su_ref, 1, slice(None)), group)
    for j in range(-(-kk // sub)):
        w_sub = min(sub, kk - j * sub)
        sl = slice(j * sub, j * sub + w_sub)
        gsl = slice(j * sub // group, (j * sub + w_sub) // group)
        xs = x_ref[:, sl]
        for i, (qref, sref) in enumerate(((qg_ref, sg_ref), (qu_ref, su_ref))):
            w = qw(qref, sl).astype(jnp.bfloat16) * _expand_scales_sub(
                sc(sref, 0, gsl), group, bf).astype(jnp.bfloat16)
            if has_mins and not min_dot:
                w -= _expand_scales_sub(sc(sref, 1, gsl), group,
                                        bf).astype(jnp.bfloat16)
            d = jax.lax.dot_general(xs, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if i == 0:
                ag += d
            else:
                au += d

    gb = ag.astype(jnp.bfloat16)
    ub = au.astype(jnp.bfloat16)
    if act == "gelu":
        mid = jax.nn.gelu(gb.astype(jnp.float32),
                          approximate=True).astype(jnp.bfloat16) * ub
    elif act == "relu":
        mid = jnp.maximum(gb, 0) * ub
    else:
        # f32 sigmoid (Mosaic cannot lower a bf16 logistic), rounded before
        # the product — identical to models.llama._act
        sg_ = jax.lax.logistic(gb.astype(jnp.float32)).astype(jnp.bfloat16)
        mid = (gb * sg_) * ub

    # down projection: mid [BM, BF] @ dequant(qd [BF, C]) accumulated into
    # the f32 scratch in sequential BF-chunk order — the same 256-chunk
    # K-order the unfused _tqmm_i8 uses, so the f32 sum is bit-identical.
    # The C axis is chunked so the dequant temporaries stay bounded at
    # large C (a [sub, 4096] bf16 tile + its f32 expanded scales would be
    # ~5 MB per live iteration otherwise).
    sub2 = min(_SUB, bf)
    cc = min(512, c)
    half = bf // group  # paired block: rows [0, half) even f, [half, 2half) odd

    def dscale(r, g0, ng, csl):
        if not pair:
            return sc(sd_ref, r, slice(g0, g0 + ng))[:, csl]
        # both halves load statically; select on the traced f parity
        # (a traced slice start would not lower through Mosaic)
        lo = sc(sd_ref, r, slice(g0, g0 + ng))[:, csl]
        hi = sc(sd_ref, r, slice(half + g0, half + g0 + ng))[:, csl]
        return jnp.where((f % 2) == 0, lo, hi)

    d_min_dot = d_has_mins and _MIN_DOT
    if d_min_dot:  # one group-sum correction per ff step over all of C
        acco_ref[:] -= _min_corr(
            mid, dscale(1, 0, bf // group, slice(None)), group)
    for j in range(-(-bf // sub2)):
        w_sub = min(sub2, bf - j * sub2)
        dsl = slice(j * sub2, j * sub2 + w_sub)
        g0, ng = j * sub2 // group, w_sub // group
        for j2 in range(-(-c // cc)):
            csl = slice(j2 * cc, min((j2 + 1) * cc, c))
            w_c = csl.stop - csl.start
            dq = qd_ref[(0, dsl, csl) if stacked else (dsl, csl)].astype(
                jnp.bfloat16) * _expand_scales_sub(
                dscale(0, g0, ng, csl), group, w_c).astype(jnp.bfloat16)
            if d_has_mins and not d_min_dot:
                dq -= _expand_scales_sub(
                    dscale(1, g0, ng, csl), group, w_c).astype(jnp.bfloat16)
            acco_ref[:, csl] += jax.lax.dot_general(
                mid[:, dsl], dq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(f == pl.num_programs(1) - 1)
    def _():
        # qlinear's astype(x.dtype): the caller would cast the f32 down
        # output to bf16 anyway — rounding here keeps the out block half
        # the VMEM and stays bit-equal with the unfused path
        out_ref[:] = acco_ref[:].astype(out_ref.dtype)


def _pick_bf_mlp(ff: int, kk: int, c: int, m: int, rows: int, d_rows: int,
                 group: int, s_item: int) -> int:
    """ff tile for the fused MLP kernel under the scoped-VMEM model.
    Returns 0 when nothing fits (caller falls back to gateup + down)."""
    bm = m if m <= 256 else 256
    limit = 13 * 2**20 + 2**19
    for bf in (512, 256):
        if ff % bf or bf % group:
            continue
        s_sub = 8 if s_item == 4 else 16
        pair = (bf // group) % s_sub != 0
        if pair and ((bf // group) * 2 % s_sub or (ff // bf) % 2):
            continue
        sub = min(_SUB, kk)
        sub2 = min(_SUB, bf)
        cc = min(512, c)
        blocks = 2 * (
            2 * bm * kk                      # x whole-K bf16
            + 2 * kk * bf                    # qg + qu
            + bf * c                         # qd
            + 2 * rows * (kk // group) * s_item * bf   # sg + su
            + d_rows * (bf // group) * (2 if pair else 1) * s_item * c
            + 2 * bm * c                     # out bf16
        )
        acc = 4 * bm * c + 2 * 4 * bm * bf   # acco scratch + ag/au values
        temps = (2 * 9 * sub * bf            # gate/up dequant (2 live iters)
                 + 2 * 9 * sub2 * cc)        # down dequant (C-chunked)
        if blocks + acc + temps <= limit:
            return bf
    return 0


def qmm_mlp(x: jnp.ndarray, w_gu: QTensor, w_down: QTensor,
            act: str) -> Optional[jnp.ndarray]:
    """Fully-fused gated MLP from the fused [2ff, K] gateup QTensor and the
    [C, ff] down QTensor (both K-major i8).  Returns [.., C] bfloat16 (the
    residual add consumes bf16; keeping the output bf16 halves the streamed
    output bytes), or None when the kinds/shapes are unsupported."""
    K = x.shape[-1]
    if w_gu.kind != "i8t" or w_down.kind != "i8t":
        return None
    if w_gu.scales is None or w_down.scales is None:
        return None
    if not (w_gu.transposed and w_down.transposed):
        return None
    if (w_gu.layer is None) != (w_down.layer is None):
        return None
    if not (_stack_ok(w_gu) and _stack_ok(w_down)):
        return None
    N2, Kg = w_gu.shape
    C, ffd = w_down.shape
    if N2 % 2 or Kg != K:
        return None
    ff = N2 // 2
    if ffd != ff:
        return None
    G = w_gu.group
    if w_down.group != G:
        return None
    sgu, has_mins = kernel_scales(w_gu)    # [(L,) R, K/G, 2ff]
    sd, d_has_mins = kernel_scales(w_down)  # [(L,) R2, ff/G, C]
    rows, d_rows = sgu.shape[-3], sd.shape[-3]
    s_item = sgu.dtype.itemsize
    if sd.dtype.itemsize != s_item:
        return None
    s_sub = 8 if s_item == 4 else 16
    if (K % 32 or (K // G) % s_sub or ff % 128 or C % 128
            or K % (2 * G)):
        return None
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    BF = _pick_bf_mlp(ff, K, C, M, rows, d_rows, G, s_item)
    if BF == 0:
        return None
    pair = (BF // G) % s_sub != 0
    sd_rows = (BF // G) * (2 if pair else 1)

    x2 = x.reshape(M, K)
    BM = M if M <= 256 else 256
    Mp = M if M <= 256 else ((M + 255) // 256) * 256
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    grid = (Mp // BM, ff // BF)
    stacked = w_gu.layer is not None
    nblk = ff // BF
    kern = functools.partial(
        _mlp_i8_kernel, group=G, bf=BF, kk=K, act=act, has_mins=has_mins,
        d_has_mins=d_has_mins, c=C, pair=pair, stacked=stacked)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((Mp, C), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N2 * K + 2 * Mp * ff * C,
            bytes_accessed=(N2 * K + ff * C
                            + (N2 * (K // G) + C * (ff // G)) * s_item
                            + Mp * K * 2 + Mp * C * 2),
            transcendentals=Mp * ff,
        ),
        interpret=INTERPRET,
    )
    scratch = [pltpu.VMEM((BM, C), jnp.float32)]
    xb = x2.astype(jnp.bfloat16)
    sdiv = 2 if pair else 1
    if not stacked:
        y = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BM, K), lambda m, f: (m, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, BF), lambda m, f: (0, f),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, BF), lambda m, f: (0, f + nblk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, K // G, BF), lambda m, f: (0, 0, f),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, K // G, BF),
                             lambda m, f: (0, 0, f + nblk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BF, C), lambda m, f: (f, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d_rows, sd_rows, C),
                             lambda m, f, sdiv=sdiv: (0, f // sdiv, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BM, C), lambda m, f: (m, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
            **common,
        )(xb, w_gu.qw, w_gu.qw, sgu, sgu, w_down.qw, sd)
    else:
        lay = jnp.asarray(w_gu.layer, jnp.int32).reshape(1)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BM, K), lambda m, f, l: (m, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, BF), lambda m, f, l: (l[0], 0, f),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, BF), lambda m, f, l: (l[0], 0, f + nblk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, K // G, BF),
                             lambda m, f, l: (l[0], 0, 0, f),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, K // G, BF),
                             lambda m, f, l: (l[0], 0, 0, f + nblk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BF, C), lambda m, f, l: (l[0], f, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d_rows, sd_rows, C),
                             lambda m, f, l, sdiv=sdiv: (l[0], 0, f // sdiv, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BM, C), lambda m, f, l: (m, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        y = pl.pallas_call(lambda lay_ref, *refs: kern(*refs),
                           grid_spec=gs, **common)(lay, xb, w_gu.qw, w_gu.qw,
                                                   sgu, sgu, w_down.qw, sd)
    if Mp != M:
        y = y[:M]
    return y.reshape(*lead, C)


def _i8c_kernel(x_ref, qw_ref, out_ref, *, stacked: bool = False):
    """x_ref [BM, BK] bf16, qw_ref [BK, BN] i8 — ONE mixed bf16×int8 MXU
    dot, no dequant pass (the MXU consumes i8 natively; tools/cast_probe).
    The per-channel rescale is a rank-1 multiply outside the kernel."""

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jax.lax.dot_general(
        x_ref[:], qw_ref[0] if stacked else qw_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _tqmm_i8c(x: jnp.ndarray, w: QTensor) -> jnp.ndarray:
    """Per-channel int8 matmul (the mmq role,
    /root/reference/cpp/ggml/src/ggml-cuda/mmq.cu): y = (x @ qw) * s[n].
    Activations stay exact bf16 (no q8 activation pass — the mixed-operand
    MXU dot makes it unnecessary on TPU); the only loss is the per-channel
    weight quantization itself (quant/qtensor.channel_quantize)."""
    M, K = x.shape
    N = w.shape[0]
    BM = M if M <= 256 else 256
    limit = 13 * 2**20 + 2**19

    def vmem(bn, bk):
        return 2 * (2 * BM * bk + bn * bk + 4 * BM * bn) + 4 * BM * bn

    best = None
    for bk in _BK_CANDS:
        if bk > K or K % bk or bk % 256:
            continue
        for bn in _BN_CANDS:
            if bn > N or N % bn or vmem(bn, bk) > limit:
                continue
            steps = (N // bn) * (K // bk)
            key = (steps, -bn * bk)
            if best is None or key < best[0]:
                best = (key, bn, bk)
    if best is None:
        BN, BK = (N if N % 128 else 128), 256
    else:
        BN, BK = best[1], best[2]

    stacked = w.layer is not None
    common = dict(
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=N * K + M * K * 2 + M * N * 4,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )
    xb = x.astype(jnp.bfloat16)
    if not stacked:
        out = pl.pallas_call(
            _i8c_kernel,
            grid=(M // BM, N // BN, K // BK),
            in_specs=[
                pl.BlockSpec((BM, BK), lambda m, n, k: (m, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BK, BN), lambda m, n, k: (k, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BM, BN), lambda m, n, k: (m, n),
                                   memory_space=pltpu.VMEM),
            **common,
        )(xb, w.qw)
        return out * w.scales  # [1, N] per-channel rescale (fused by XLA)
    lay = jnp.asarray(w.layer, jnp.int32).reshape(1)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // BM, N // BN, K // BK),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda m, n, k, l: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, BN), lambda m, n, k, l: (l[0], k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda m, n, k, l: (m, n),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        lambda lay_ref, *refs: _i8c_kernel(*refs, stacked=True),
        grid_spec=gs, **common,
    )(lay, xb, w.qw)
    s = jax.lax.dynamic_index_in_dim(w.scales, w.layer, 0, keepdims=False)
    return out * s  # [1, N] per-channel rescale


def _stack_ok(w: QTensor) -> bool:
    """Stacked ([L, ...]) payloads need a traced layer view; 2-D need none."""
    return (w.layer is None) == (getattr(w.qw, "ndim", 2) == 2)


def _supported_i8c(w: QTensor, K: int) -> bool:
    if w.kind != "i8c" or w.scales is None:
        return False
    N = w.shape[0]
    return K == w.shape[1] and K % 256 == 0 and N % 128 == 0


def _supported_t(w: QTensor, K: int, M: int) -> bool:
    if w.kind not in ("i4t", "i8t") or w.scales is None:
        return False
    N = w.shape[0]
    G = w.group
    if K != w.shape[1] or K % (2 * G) != 0:
        return False
    pk = K // 2 if w.kind == "i4t" else K
    if pk % 32 != 0 or N % 128 != 0 or (pk // G) % 8 != 0:
        return False
    return True


def transposable(w: QTensor) -> bool:
    """True when the K-major kernel supports this tensor's shape — the
    loader transposes only then, so unsupported shapes keep the lane-major
    kernel instead of degrading to the dequantize fallback."""
    if w.kind not in ("i4p", "i8") or w.scales is None:
        return False
    from dataclasses import replace as _replace
    probe = _replace(w, kind=w.kind[:2] + "t")
    return _supported_t(probe, w.shape[1], 1)


def _supported(w: QTensor, K: int, M: int) -> bool:
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
    """x [..., K] @ W[N, K]^T → [..., N] float32.

    Decode (small M) and prefill (large M, M-tiled grid) both stream the
    weights quantized — the mmq.cu role.  Rows are padded to the M tile."""
    K = x.shape[-1]
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    if w.kind == "i8c" and _supported_i8c(w, K) and _stack_ok(w):
        fn = _tqmm_i8c
    elif (w.transposed and w.kind != "i8c" and _supported_t(w, K, M)
          and _stack_ok(w)):
        fn = _tqmm_i4 if w.kind == "i4t" else _tqmm_i8
    elif not w.transposed and _supported(w, K, M) and _stack_ok(w):
        fn = _qmm_i4 if w.kind == "i4p" else _qmm_i8
    else:
        wd = dequantize_qtensor(w, dtype=jnp.bfloat16)
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), wd,
            (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    x2 = x.reshape(M, K)
    Mp = M if M <= 256 else ((M + 255) // 256) * 256
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    y = fn(x2, w)
    if Mp != M:
        y = y[:M]
    return y.reshape(*lead, w.shape[0])
