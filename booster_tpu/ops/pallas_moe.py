"""Grouped (MoE) fused dequant-matmul: sort-based routed dispatch over
quantized expert weights.

The TPU redesign of GGML_OP_MUL_MAT_ID (/root/reference/cpp/ggml/include/
ggml.h:468, llm_build_moe_ffn llama.cpp): tokens are sorted by their routed
expert, group-padded so every BM-row tile belongs to exactly one expert, and
a scalar-prefetched tile→expert table steers each grid step's weight DMA to
that expert's quantized rows (megablox-style).  FLOPs scale with k/E of the
dense all-experts formulation and the expert weights stream 4/8-bit —
never materialized as a full bf16 stack.

Kernel bodies are shared with ops/pallas_qmm (same layout contract).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from booster_tpu.ops.pallas_qmm import (
    _pick_tiles,
    _qmm_i4_kernel,
    _qmm_i8_kernel,
)
from booster_tpu.quant.qtensor import QTensor, dequantize_qtensor, kernel_scales

INTERPRET = False  # flipped by tests for CPU interpret mode

_BM = int(_os.environ.get("BT_MOE_BM", "32"))  # rows per tile (group padding)


def route_pad(
    x: jnp.ndarray,  # [N, C] token activations
    top_idx: jnp.ndarray,  # [N, k] chosen expert per token
    E: int,
    bm: int = _BM,
):
    """Sort expanded (token, choice) rows by expert and scatter them into a
    group-padded buffer where each bm-row tile belongs to one expert.

    Returns (xp [Mp, C], pos [N*k] row positions, tile_expert [Mp/bm])."""
    N, k = top_idx.shape
    Nk = N * k
    Mp = ((Nk + E * bm) + bm - 1) // bm * bm  # static worst-case padding

    flat_e = top_idx.reshape(-1)
    order = jnp.argsort(flat_e, stable=True)  # [Nk] sorted row → expanded row
    se = flat_e[order]
    counts = jnp.zeros(E, jnp.int32).at[flat_e].add(1)
    padded = ((counts + bm - 1) // bm) * bm
    start = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(padded)])
    excl = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)])[:-1]
    rank = jnp.arange(Nk, dtype=jnp.int32) - excl[se]
    pos_sorted = start[se] + rank  # position of sorted row s in padded buffer

    xp = jnp.zeros((Mp, x.shape[1]), x.dtype).at[pos_sorted].set(x[order // k])
    # pos[r] for expanded row r (token r//k, choice r%k)
    pos = jnp.zeros(Nk, jnp.int32).at[order].set(pos_sorted)

    tile0 = jnp.arange(Mp // bm, dtype=jnp.int32) * bm
    tile_expert = jnp.clip(
        jnp.searchsorted(start[1:], tile0, side="right"), 0, E - 1
    ).astype(jnp.int32)
    return xp, pos, tile_expert


def grouped_qmm(
    xp: jnp.ndarray,  # [Mp, K] group-padded sorted rows (bm-aligned groups)
    w: QTensor,  # stacked expert weights [E*Ne, K]
    tile_expert: jnp.ndarray,  # [Mp/bm] i32
    E: int,
    bm: int = _BM,
) -> jnp.ndarray:
    """xp @ W[e(row)]^T → [Mp, Ne]; each bm-tile uses its expert's rows."""
    Mp, K = xp.shape
    Ne = w.shape[0] // E
    G = w.group

    if w.kind == "i4p":
        half = K // 2
        sg = half // G
        s3, has_mins = kernel_scales(w)  # [E*Ne, 2(+2), sg]
        _, BN, BB = _pick_tiles(Ne, half, bm, s3.shape[1], G)
        grid = (Mp // bm, Ne // BN, half // BB)
        x3 = xp.reshape(Mp, 2, half).astype(jnp.bfloat16)
        npe = Ne // BN  # weight tiles per expert

        def kern(te_ref, x_ref, qw_ref, s_ref, out_ref):
            _qmm_i4_kernel(x_ref, qw_ref, s_ref, out_ref, group=G, bb=BB,
                           has_mins=has_mins, zero=w.zero)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, 2, BB), lambda m, n, k, te: (m, 0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BN, BB),
                             lambda m, n, k, te: (te[m] * npe + n, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BN, s3.shape[1], sg),
                             lambda m, n, k, te: (te[m] * npe + n, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, BN), lambda m, n, k, te: (m, n),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kern,
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((Mp, Ne), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=INTERPRET,
        )(tile_expert, x3, w.qw, s3)

    if w.kind == "i8":
        sg = K // G
        s3, has_mins = kernel_scales(w)  # [E*Ne, 1(+1), sg]
        _, BN, BK = _pick_tiles(Ne, K, bm, s3.shape[1], G)
        grid = (Mp // bm, Ne // BN, K // BK)
        npe = Ne // BN

        def kern8(te_ref, x_ref, qw_ref, s_ref, out_ref):
            _qmm_i8_kernel(x_ref, qw_ref, s_ref, out_ref, group=G, bk=BK,
                           has_mins=has_mins)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, BK), lambda m, n, k, te: (m, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BN, BK),
                             lambda m, n, k, te: (te[m] * npe + n, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BN, s3.shape[1], sg),
                             lambda m, n, k, te: (te[m] * npe + n, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, BN), lambda m, n, k, te: (m, n),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kern8,
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((Mp, Ne), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=INTERPRET,
        )(tile_expert, xp.astype(jnp.bfloat16), w.qw, s3)

    # dense / unsupported formats: per-tile gather of bf16 expert rows
    wd = dequantize_qtensor(w, dtype=jnp.bfloat16).reshape(E, Ne, K)
    wt = wd[tile_expert]  # [Mp/bm, Ne, K]
    tile_bm = Mp // tile_expert.shape[0]
    x4 = xp.reshape(-1, tile_bm, K)  # [tiles, bm, K]
    return jnp.einsum(
        "tbk,tnk->tbn", x4.astype(jnp.bfloat16), wt,
        preferred_element_type=jnp.float32,
    ).reshape(Mp, Ne)


def moe_supported(lp: dict) -> bool:
    return all(
        isinstance(lp.get(n), QTensor) and lp[n].kind in ("i4p", "i8", "dense")
        for n in ("gate_exps", "up_exps", "down_exps")
    )


def moe_ffn_grouped(x: jnp.ndarray, lp: dict, cfg) -> jnp.ndarray:
    """Routed MoE FFN (llm_build_moe_ffn semantics: softmax over all experts,
    top-k, renormalize over the selected) with sort-based grouped dispatch."""
    from booster_tpu.models.llama import _act
    from booster_tpu.ops.linear import qlinear

    E, k = cfg.n_experts, cfg.n_experts_used
    B, T, C = x.shape
    N = B * T
    xf = x.reshape(N, C)

    from booster_tpu.models.llama import moe_route

    router_logits = qlinear(xf, lp["router"])  # [N, E]
    topv, topi = moe_route(router_logits, cfg)  # [N, k]

    xp, pos, tile_expert = route_pad(xf, topi, E)
    g = grouped_qmm(xp, lp["gate_exps"], tile_expert, E)
    u = grouped_qmm(xp, lp["up_exps"], tile_expert, E)
    h = (_act(g.astype(jnp.bfloat16), cfg.act) * u.astype(jnp.bfloat16))
    y = grouped_qmm(h, lp["down_exps"], tile_expert, E)  # [Mp, C]

    rows = y[pos].reshape(N, k, C)  # back to (token, choice) order
    out = jnp.sum(rows * topv[..., None], axis=1)
    return out.reshape(B, T, C).astype(x.dtype)
