"""Fused (quantized-)KV decode attention Pallas kernel.

One kernel per layer for the T=1 batched decode step, replacing the XLA
chain dequant(K) → dequant(V) → QK^T → mask → softmax → PV (~8 launches per
layer, each paying the dispatch floor — see ROUND1_NOTES) with a single
pallas_call.

The TPU analog of the reference's quantized-KV flash-attention instances
(/root/reference/cpp/ggml/src/ggml-cuda/fattn.cu, fattn-vec-f16.cuh q8_0 KV
specializations).  Redesigned rather than translated:

  - int8 KV is never dequantized to a [S, D] tile: the per-token scale is
    folded into *score space* (s = (q · k_int8) * ks[s]) and into the
    probability row before PV (p' = p * vs[s]) — the cast i8→bf16 feeds the
    MXU directly and the scale multiplies touch G×S elements instead of S×D.
  - flash-attention online softmax over S tiles keeps VMEM bounded for any
    context length; m/l/acc carry lives in scratch across the S grid dim.
  - GQA: the G = H/H_kv query heads of one KV head form the row block of
    each MXU dot.

Layouts (heads-major cache, ops/kv_cache.py):
  q   [B, Hkv, G, D]  bf16, already rope'd and pre-scaled by attn_scale
  k/v [B, Hkv, S, D]  int8 (with scales [B, Hkv, S] f32) or bf16 (scales None)
  lens [B, 1] i32     valid kv length per row (masked cols >= len)
  window [1, 1] i32   sliding window (cols < len - window masked); >= S → off
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# flipped to True by tests to run kernels in interpreter mode on CPU
INTERPRET = False

_BT = int(_os.environ.get("BT_ATTN_BT", "8"))  # batch rows per grid step
_ST = int(_os.environ.get("BT_ATTN_ST", "1024"))  # kv positions per grid step
# merged block-diagonal dot: one [bt*G, D] x [bt*ST, D]^T MXU dot per grid
# step instead of bt small unrolled dots (off-diagonal b-blocks are masked;
# scales stay in score space as a [1, bt*ST] lane-merged row)
_MERGED = _os.environ.get("BT_ATTN_MERGED", "1") != "0"

_NEG = -1e30


def _decode_attn_kernel(
    lay_ref,  # [1] i32 (scalar prefetch: layer index into the stacked cache)
    nv_ref,  # [B // BT, 2] i32 (scalar prefetch: [first, end) valid S tiles)
    q_ref,  # [BT, 1, G, D] bf16
    k_ref,  # [1, BT, 1, ST, D] i8|bf16 (leading 1 = layer block)
    v_ref,
    ks_ref,  # [1, BT, 1, 1, ST] f32 (or None — absent when not quantized)
    vs_ref,
    sk_ref,  # [BT, 1, 1, D] bf16 self-token k (or None — deferred-append)
    sv_ref,
    lens_ref,  # [BT, 1] i32 (SMEM): valid CACHE length (excl. self token)
    win_ref,  # [1, 1] i32 (SMEM)
    selfok_ref,  # [BT, 1] i32 (SMEM; or None): 1 = self token is live
    out_ref,  # [BT, 1, G, D] f32
    m_ref,  # scratch [BT, G, 1] f32
    l_ref,  # scratch [BT, G, 1] f32
    acc_ref,  # scratch [BT, G, D] f32
    *,
    bt: int,
    st: int,
    softcap: float,
    quantized: bool,
):
    s_idx = pl.program_id(2)
    ns = pl.num_programs(2)
    has_self = sk_ref is not None

    @pl.when(s_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    col0 = s_idx * st
    col = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, st), 1)  # [1, ST]
    win = win_ref[0, 0]

    # S tiles past every row's valid length — and, under a sliding window,
    # tiles before every row's window start — are steered to the nearest
    # live tile by the index maps (the repeated block index elides the DMA)
    # and their compute is skipped here: a step over a dead tile is ~free,
    # so decode cost tracks the live window, not the allocated cache.
    bi = pl.program_id(0)
    @pl.when((s_idx >= nv_ref[bi, 0]) & (s_idx < nv_ref[bi, 1]))
    def _():
        for b in range(bt):  # static unroll: all ref indices constant
            qb = q_ref[b, 0]  # [G, D] bf16
            kq = k_ref[0, b, 0].astype(jnp.bfloat16)  # cast; scale folded below
            s = jax.lax.dot_general(
                qb, kq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, ST]
            if quantized:
                s = s * ks_ref[0, b, 0]  # [1, ST] broadcast over G rows
            if softcap > 0.0:
                s = softcap * jnp.tanh(s / softcap)
            len_b = lens_ref[b, 0]
            # window: token at position p attends [p - win + 1, p]; with a
            # live self token the current position is len_b (not len_b - 1)
            lo = len_b - win + (selfok_ref[b, 0] if has_self else 0)
            valid = (col < len_b) & (col >= lo)  # [1, ST]
            s = jnp.where(valid, s, _NEG)

            m_prev = m_ref[b]  # [G, 1]
            l_prev = l_ref[b]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)  # [G, ST]
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            if quantized:
                p = p * vs_ref[0, b, 0]
            vq = v_ref[0, b, 0].astype(jnp.bfloat16)  # [ST, D]
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, D]
            acc_new = acc_ref[b] * alpha + pv
            m_ref[b] = m_new
            l_ref[b] = l_new
            acc_ref[b] = acc_new

    @pl.when(s_idx == ns - 1)
    def _():
        for b in range(bt):
            m_b, l_b, acc_b = m_ref[b], l_ref[b], acc_ref[b]
            if has_self:
                # deferred-append decode: the new token's k/v are not in the
                # cache yet — fold its (always-causal) self term in here,
                # mirroring the storage quantization so numerics match the
                # append-then-attend path
                def mirror(x):  # [1, D] f32 → storage round-trip
                    if not quantized:
                        return x.astype(jnp.bfloat16).astype(jnp.float32)
                    sc = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
                    qv = jnp.round(x / jnp.maximum(sc, 1e-12))
                    return qv * sc

                skb = mirror(sk_ref[b, 0].astype(jnp.float32))  # [1, D]
                svb = mirror(sv_ref[b, 0].astype(jnp.float32))
                qb = q_ref[b, 0]  # [G, D] bf16 (pre-scaled)
                s_self = jax.lax.dot_general(
                    qb.astype(jnp.float32), skb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [G, 1]
                if softcap > 0.0:
                    s_self = softcap * jnp.tanh(s_self / softcap)
                s_self = jnp.where(selfok_ref[b, 0] > 0, s_self, _NEG)
                m2 = jnp.maximum(m_b, s_self)
                alpha = jnp.exp(m_b - m2)
                p_self = jnp.exp(s_self - m2)  # [G, 1]
                l_b = l_b * alpha + p_self
                acc_b = acc_b * alpha + p_self * svb  # [G, D]
            out_ref[b, 0] = acc_b / jnp.maximum(l_b, 1e-30)


def _smem_cols(ref, col, bt: int, st: int, shape):
    """Expand per-b SMEM scalars ref[b, 0] to a vector over the merged
    bt*ST column axis (value at column c is ref[c // st, 0]) — bt scalar
    broadcast-selects, no gather."""
    blk = col // st  # [1, bt*st] (or [btG, 1] when expanding over rows)
    out = jnp.zeros(shape, jnp.int32)
    for b in range(bt):
        out = jnp.where(blk == b, ref[b, 0], out)
    return out


def _decode_attn_kernel_merged(
    lay_ref,  # [1] i32 (scalar prefetch)
    nv_ref,  # [B // BT, 2] i32 (scalar prefetch)
    q_ref,  # [BT, 1, G, D] bf16
    k_ref,  # [1, BT, 1, ST, D] i8|bf16
    v_ref,
    ks_ref,  # [1, BT, 1, 1, ST] f32 (or None)
    vs_ref,
    sk_ref,  # [BT, 1, 1, D] bf16 (or None — deferred-append self term)
    sv_ref,
    lens_ref,  # [BT, 1] i32 (SMEM)
    win_ref,  # [1, 1] i32 (SMEM)
    selfok_ref,  # [BT, 1] i32 (SMEM; or None)
    out_ref,  # [BT, 1, G, D] f32
    m_ref,  # scratch [BT*G, 1] f32
    l_ref,  # scratch [BT*G, 1] f32
    acc_ref,  # scratch [BT*G, D] f32
    *,
    bt: int,
    st: int,
    softcap: float,
    quantized: bool,
):
    """Merged-dot variant of _decode_attn_kernel: the bt batch rows of a
    grid step form ONE [bt*G, D] x [bt*ST, D]^T MXU dot whose off-diagonal
    b-blocks are masked to -inf (their exp contributes exact zeros to PV).
    Trades bt x wasted MXU FLOPs (sub-us at decode shapes) for 1 dot pair
    per step instead of bt — the per-b unroll was 30-50% of attention time
    at B=64 (ROUND2_NOTES).  The fattn tile-kernel role,
    /root/reference/cpp/ggml/src/ggml-cuda/fattn.cu."""
    s_idx = pl.program_id(2)
    ns = pl.num_programs(2)
    has_self = sk_ref is not None
    G, D = q_ref.shape[2], q_ref.shape[3]
    btG, btST = bt * G, bt * st

    @pl.when(s_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    col0 = pl.program_id(2) * st
    win = win_ref[0, 0]
    bi = pl.program_id(0)

    @pl.when((s_idx >= nv_ref[bi, 0]) & (s_idx < nv_ref[bi, 1]))
    def _():
        q2 = q_ref[:, 0].reshape(btG, D)  # bf16, leading-dim merge
        k2 = k_ref[0, :, 0].reshape(btST, D).astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q2, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [btG, btST]
        if quantized:
            # per-position k scale in score space: [bt, ST] lane-merged to
            # one row (sublane->lane merge; st >= 128 required, see gate)
            s = s * ks_ref[0, :, 0, 0].reshape(1, btST)
        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)
        ccol = jax.lax.broadcasted_iota(jnp.int32, (1, btST), 1)
        colb = ccol // st  # which batch row this column belongs to
        colpos = col0 + (ccol - colb * st)  # kv position of the column
        rowb = jax.lax.broadcasted_iota(jnp.int32, (btG, 1), 0) // G
        lens_c = _smem_cols(lens_ref, ccol, bt, st, (1, btST))
        ok_c = (_smem_cols(selfok_ref, ccol, bt, st, (1, btST))
                if has_self else 0)
        lo_c = lens_c - win + ok_c
        valid = ((colb == rowb) & (colpos < lens_c) & (colpos >= lo_c))
        s = jnp.where(valid, s, _NEG)

        m_prev = m_ref[:]  # [btG, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [btG, btST]; off-diagonal entries exact 0
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            p = p * vs_ref[0, :, 0, 0].reshape(1, btST)
        v2 = v_ref[0, :, 0].reshape(btST, D).astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [btG, D]
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(s_idx == ns - 1)
    def _():
        m_b, l_b, acc = m_ref[:], l_ref[:], acc_ref[:]
        if has_self:
            # deferred-append: fold the new token's (always-causal) self
            # term in, mirroring the storage quantization (see the unrolled
            # kernel).  One [btG, D] x [bt, D]^T dot; rows only see their
            # own b column, the rest are masked.
            sk2 = sk_ref[:, 0, 0].astype(jnp.float32)  # [bt, D]
            sv2 = sv_ref[:, 0, 0].astype(jnp.float32)

            def mirror(x):  # [bt, D] f32 -> storage round-trip
                if not quantized:
                    return x.astype(jnp.bfloat16).astype(jnp.float32)
                sc = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
                qv = jnp.round(x / jnp.maximum(sc, 1e-12))
                return qv * sc

            skq, svq = mirror(sk2), mirror(sv2)
            q2 = q_ref[:, 0].reshape(btG, D).astype(jnp.float32)
            s_self = jax.lax.dot_general(
                q2, skq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [btG, bt]
            if softcap > 0.0:
                s_self = softcap * jnp.tanh(s_self / softcap)
            scol = jax.lax.broadcasted_iota(jnp.int32, (1, bt), 1)
            rowb = jax.lax.broadcasted_iota(jnp.int32, (btG, 1), 0) // G
            ok_c = _smem_cols(selfok_ref, scol, bt, 1, (1, bt))
            s_self = jnp.where((scol == rowb) & (ok_c > 0), s_self, _NEG)
            m2 = jnp.maximum(m_b, jnp.max(s_self, axis=-1, keepdims=True))
            alpha = jnp.exp(m_b - m2)
            p_self = jnp.exp(s_self - m2)  # [btG, bt]; one live col per row
            l_b = l_b * alpha + jnp.sum(p_self, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p_self, svq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o = acc / jnp.maximum(l_b, 1e-30)  # [btG, D]
        for b in range(bt):
            out_ref[b, 0] = o[b * G:(b + 1) * G]


def _pick_bt(B: int, S: int, D: int, itemsize: int) -> tuple[int, int]:
    """Tile sizes: few grid steps, K+V tiles ≲ 2 MB each, double-buffered."""
    st = min(S, _ST)
    while S % st:
        st //= 2
    budget = 2 * 1024 * 1024
    bt = _BT
    while bt > 1 and (bt * st * D * itemsize > budget or B % bt != 0):
        bt //= 2
    while B % bt != 0:
        bt //= 2
    return max(bt, 1), st


_MERGED_LIMIT = 12 * 2**20  # scoped-VMEM budget for the merged kernel


def _vmem_merged(bt: int, st: int, D: int, G: int, itemsize: int) -> int:
    """Merged-kernel scoped-VMEM model: double-buffered K/V blocks, the
    i8→bf16 cast temporaries, and the [bt·G, bt·ST] score plane (f32 s +
    exp/where temps + bf16 p ≈ 2.5× its f32 bytes)."""
    kv = 2 * 2 * bt * st * D * itemsize
    casts = (2 * bt * st * D * 2) if itemsize == 1 else 0
    s_bytes = bt * G * bt * st * 4
    return kv + casts + int(2.5 * s_bytes) + 12 * bt * G * D


def _pick_bt_merged(B: int, S: int, D: int, G: int,
                    itemsize: int) -> tuple[int, int]:
    """(bt, st) for the merged kernel: minimize grid steps under the VMEM
    model; on ties prefer smaller bt (MXU waste in the merged dot scales
    with bt) then larger st.  st must stay lane-mergeable (≥128)."""
    best = None
    bt0 = _BT
    while B % bt0:
        bt0 //= 2
    bt = bt0
    while bt >= 1:
        # SMEM (bt, 1) blocks need bt % 8 == 0 or bt == B (Mosaic block gate)
        if B % bt == 0 and (bt == B or bt % 8 == 0):
            st = min(S, _ST)
            while S % st:
                st //= 2
            while st >= 128:
                if S % st == 0 and _vmem_merged(bt, st, D, G,
                                                itemsize) <= _MERGED_LIMIT:
                    steps = (B // bt) * (S // st)
                    key = (steps, bt, -st)
                    if best is None or key < best[0]:
                        best = (key, bt, st)
                    break  # larger st within budget dominates smaller
                st //= 2
        bt //= 2
    if best is None:
        return _pick_bt(B, S, D, itemsize)
    return best[1], best[2]


def decode_prep(
    kv_valid_len: jnp.ndarray,  # [B] i32
    window,  # traced i32 scalar or None
    *,
    B: int,
    S: int,
    D: int,
    itemsize: int,
    G: int = 0,
):
    """Layer-invariant operands of the decode-attention kernel: (lens, win,
    nv, bt, st).  Compute ONCE per forward and pass as `prep` — inside the
    layer scan these small fusions otherwise re-run every layer (3 extra
    launches/layer, tools/ablate_decode).  Pass G (= H // Hkv) so the tile
    pick matches the merged kernel's VMEM model."""
    if G and _MERGED:
        bt, st = _pick_bt_merged(B, S, D, G, itemsize)
    else:
        bt, st = _pick_bt(B, S, D, itemsize)
    lens = kv_valid_len.astype(jnp.int32).reshape(B, 1)
    win = (jnp.asarray(window, jnp.int32) if window is not None
           else jnp.int32(S + 1)).reshape(1, 1)
    # live S-tile range [first, end) per batch tile: end covers the longest
    # row (≥1 so the steered index stays in range); first is the earliest
    # sliding-window start across rows (0 when no window is active).
    lens_t = lens.reshape(B // bt, bt)
    nv_end = jnp.maximum(1, (jnp.max(lens_t, axis=1) + (st - 1)) // st)
    nv_first = jnp.minimum(
        jnp.min(jnp.maximum(lens_t - win[0, 0], 0), axis=1) // st, nv_end - 1)
    nv = jnp.stack([nv_first, nv_end], axis=1)
    return lens, win, nv, bt, st


def decode_attention_stacked(
    q: jnp.ndarray,  # [B, 1, H, D] (already roped), any float dtype
    k_cache: jnp.ndarray,  # [L, B, Hkv, S, D] int8 or bf16 (full stacked)
    v_cache: jnp.ndarray,
    k_scale,  # [L, B, Hkv, S, 1] f32 or None
    v_scale,
    layer,  # traced i32 scalar: layer slice to attend over
    kv_valid_len: jnp.ndarray,  # [B] i32
    scale: float,
    logit_softcap: float = 0.0,
    window=None,  # traced i32 scalar or None (no sliding window)
    prep=None,  # precomputed decode_prep(...) output (hoisted out of scan)
    self_kv=None,  # (k [B,Hkv,d], v [B,Hkv,d], ok [B]) — deferred append:
    # the new token's k/v are folded in as an in-kernel self term instead of
    # being read back from the cache (the write happens once per step for
    # ALL layers — ops/pallas_kv.kv_append_all_layers)
) -> jnp.ndarray:
    """Fused decode attention over one layer of the stacked cache; returns
    [B, 1, H, D] in q.dtype.  The layer is selected by the kernel's index
    maps (scalar prefetch), so the cache never passes through an XLA slice —
    per-layer slicing inside a scan materializes whole-slice layout copies
    every step (see tools/ablate_decode.py).

    Numerics match ops/attention.py's masked-softmax path to f32 rounding
    (verified in tests/test_pallas_attention.py, interpret mode)."""
    B, T, H, Dq = q.shape
    assert T == 1
    Hkv, S = k_cache.shape[2], k_cache.shape[3]
    D = k_cache.shape[4]  # storage dim (lane-padded: kv_cache.pad_head_dim)
    G = H // Hkv
    quantized = k_scale is not None
    L = k_cache.shape[0]

    qb = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    if Dq < D:
        # padded cache lanes hold exact zeros; zero-padded q keeps the
        # scores identical and PV writes zeros that are sliced off below
        qb = jnp.pad(qb, ((0, 0), (0, 0), (0, 0), (0, D - Dq)))
    # [B, 1, H, D] → [B, Hkv, G, D]: same row-major linearization (squeeze
    # the singleton, split H) — no transpose, no layout copy
    qb = qb.reshape(B, Hkv, G, D)

    if prep is None:
        prep = decode_prep(kv_valid_len, window, B=B, S=S, D=D,
                           itemsize=k_cache.dtype.itemsize, G=G)
    lens, win, nv, bt, st = prep
    grid = (B // bt, Hkv, S // st)
    # merged block-diagonal dot: needs a lane-mergeable st and the score
    # plane within the scoped-VMEM budget; otherwise the per-b unroll
    use_merged = (_MERGED and st % 128 == 0
                  and (bt == B or bt % 8 == 0)
                  and _vmem_merged(bt, st, D, G, k_cache.dtype.itemsize)
                  <= _MERGED_LIMIT)

    lay = jnp.asarray(layer, jnp.int32).reshape(1)

    def kv_idx(i, j, k, lay_ref, nv_ref):
        return (lay_ref[0], i, j, jnp.clip(k, nv_ref[i, 0], nv_ref[i, 1] - 1), 0)

    def sc_idx(i, j, k, lay_ref, nv_ref):
        return (lay_ref[0], i, j, 0,
                jnp.clip(k, nv_ref[i, 0], nv_ref[i, 1] - 1))

    in_specs = [
        pl.BlockSpec((bt, 1, G, D), lambda i, j, k, lay_ref, nv_ref: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt, 1, st, D), kv_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt, 1, st, D), kv_idx, memory_space=pltpu.VMEM),
    ]
    args = [qb, k_cache, v_cache]
    has_self = self_kv is not None
    if quantized:
        ks = k_scale.reshape(L, B, Hkv, 1, S)
        vs = v_scale.reshape(L, B, Hkv, 1, S)
        in_specs += [
            pl.BlockSpec((1, bt, 1, 1, st), sc_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, 1, 1, st), sc_idx, memory_space=pltpu.VMEM),
        ]
        args += [ks, vs]
    if has_self:
        sk, sv, self_ok = self_kv

        def _padd(a):  # [B, Hkv, d] → [B, Hkv, 1, D] (block minors (1, D))
            if a.shape[-1] < D:
                a = jnp.pad(a, ((0, 0),) * (a.ndim - 1)
                            + ((0, D - a.shape[-1]),))
            return a.astype(jnp.bfloat16).reshape(B, Hkv, 1, D)

        self_spec = pl.BlockSpec(
            (bt, 1, 1, D), lambda i, j, k, lay_ref, nv_ref: (i, j, 0, 0),
            memory_space=pltpu.VMEM)
        in_specs += [self_spec, self_spec]
        args += [_padd(sk), _padd(sv)]
    kernel = functools.partial(
        _adapt_refs,
        _decode_attn_kernel_merged if use_merged else _decode_attn_kernel,
        quantized, has_self)
    in_specs += [
        pl.BlockSpec((bt, 1), lambda i, j, k, lay_ref, nv_ref: (i, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda i, j, k, lay_ref, nv_ref: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    args += [lens, win]
    if has_self:
        in_specs += [pl.BlockSpec((bt, 1),
                                  lambda i, j, k, lay_ref, nv_ref: (i, 0),
                                  memory_space=pltpu.SMEM)]
        args += [self_ok.astype(jnp.int32).reshape(B, 1)]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, 1, G, D),
                               lambda i, j, k, lay_ref, nv_ref: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=(
            [
                pltpu.VMEM((bt * G, 1), jnp.float32),
                pltpu.VMEM((bt * G, 1), jnp.float32),
                pltpu.VMEM((bt * G, D), jnp.float32),
            ]
            if use_merged
            else [
                pltpu.VMEM((bt, G, 1), jnp.float32),
                pltpu.VMEM((bt, G, 1), jnp.float32),
                pltpu.VMEM((bt, G, D), jnp.float32),
            ]
        ),
    )
    out = pl.pallas_call(
        functools.partial(kernel, bt=bt, st=st, softcap=logit_softcap,
                          quantized=quantized),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * D,
            bytes_accessed=(2 * B * Hkv * S * D * k_cache.dtype.itemsize
                            + (8 * B * Hkv * S if quantized else 0)),
            transcendentals=B * H * S,
        ),
        interpret=INTERPRET,
    )(lay, nv, *args)

    # [B, Hkv, G, D] → [B, 1, H, D]: same linearization, no transpose
    out = out.reshape(B, 1, H, D)
    if Dq < D:
        out = out[..., :Dq]
    return out.astype(q.dtype)


def _prefill_attn_kernel(
    pos0_ref,  # [BH] i32 (scalar prefetch): first query position per row
    lens_ref,  # [BH] i32: valid kv length (cache rows + this chunk)
    win_ref,  # [1] i32: sliding window (>= S+T → off)
    nv_ref,  # [BH, NT, 2] i32: [first, end) live S tiles per query tile
    q_ref,  # [1, G, TT, D] bf16 (pre-scaled)
    k_ref,  # [1, ST, D] i8|bf16
    v_ref,
    ks_ref,  # [1, 1, ST] f32 (or None)
    vs_ref,
    out_ref,  # [1, G, TT, D] f32
    m_ref,  # scratch [G*TT, 1] f32
    l_ref,
    acc_ref,  # scratch [G*TT, D] f32
    *,
    tt: int,
    st: int,
    softcap: float,
    quantized: bool,
):
    """Chunked-prefill flash attention over a (quantized) cache: the T>1
    analog of the decode kernel (VERDICT r2 weak #6: the XLA path
    dequantized the WHOLE cache per 512-token chunk — O(S²/chunk) dequant
    traffic at long context).  Causality is positional: query row t attends
    cols ≤ pos0 + t; dead S tiles (beyond the tile's last query position,
    or before every row's sliding-window start) are steered + skipped.
    Reference role: prompt-processing flash-attn,
    /root/reference/cpp/ggml/src/ggml-cuda/fattn.cu."""
    bh = pl.program_id(0)
    ti = pl.program_id(1)
    s_idx = pl.program_id(2)
    ns = pl.num_programs(2)
    G, D = q_ref.shape[1], q_ref.shape[3]
    rows = G * tt

    @pl.when(s_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    col0 = s_idx * st

    @pl.when((s_idx >= nv_ref[bh, ti, 0]) & (s_idx < nv_ref[bh, ti, 1]))
    def _():
        q2 = q_ref[0].reshape(rows, D)
        k2 = k_ref[0].astype(jnp.bfloat16)  # [ST, D]
        s = jax.lax.dot_general(
            q2, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, ST]
        if quantized:
            s = s * ks_ref[0, 0].reshape(1, st)
        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)
        col = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, st), 1)
        t_row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % tt
        qpos = pos0_ref[bh] + ti * tt + t_row  # [rows, 1]
        lo = jnp.maximum(qpos - win_ref[0] + 1, 0)
        valid = (col <= qpos) & (col < lens_ref[bh]) & (col >= lo)
        s = jnp.where(valid, s, _NEG)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            p = p * vs_ref[0, 0].reshape(1, st)
        v2 = v_ref[0].astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(s_idx == ns - 1)
    def _():
        o = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        out_ref[0] = o.reshape(G, tt, D)


def prefill_attention(
    q: jnp.ndarray,  # [B, T, H, D] (already roped), any float dtype
    k_cache: jnp.ndarray,  # [B, Hkv, S, Dp] int8 or bf16 (post-append view)
    v_cache: jnp.ndarray,
    k_scale,  # [B, Hkv, S, 1] f32 or None
    v_scale,
    kv_valid_len: jnp.ndarray,  # [B] i32 (cache rows incl. this chunk)
    scale: float,
    logit_softcap: float = 0.0,
    window=None,  # traced i32 scalar or None
    pos0=None,  # [B] i32: position of query row 0 (pre-append cache length);
    # defaults to kv_valid_len - T (full-width rows)
) -> jnp.ndarray:
    """Fused chunked-prefill attention over the (quantized) cache; returns
    [B, T, H, D] in q.dtype.  Queries are assumed positionally contiguous:
    row b's query t sits at position pos0[b] + t — the standard
    chunked-prefill layout (callers with custom position maps use the XLA
    path)."""
    B, T, H, Dq = q.shape
    Hkv, S, D = k_cache.shape[1], k_cache.shape[2], k_cache.shape[3]
    G = H // Hkv
    quantized = k_scale is not None
    BH = B * Hkv

    tt = min(T, 256)
    while T % tt:
        tt //= 2
    st = min(S, 512)
    while S % st:
        st //= 2

    qb = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    if Dq < D:
        qb = jnp.pad(qb, ((0, 0), (0, 0), (0, 0), (0, D - Dq)))
    # [B, T, H, D] → [B, Hkv, G, T, D] (one transpose of the small q chunk)
    qb = qb.reshape(B, T, Hkv, G, D).transpose(0, 2, 3, 1, 4)
    qb = qb.reshape(BH, G, T, D)

    lens = jnp.repeat(kv_valid_len.astype(jnp.int32), Hkv)  # [BH]
    if pos0 is None:
        pos0 = kv_valid_len - T
    pos0 = jnp.repeat(jnp.asarray(pos0, jnp.int32), Hkv)  # first query pos
    win = (jnp.asarray(window, jnp.int32) if window is not None
           else jnp.int32(S + T)).reshape(1)
    NT = T // tt
    ti = jnp.arange(NT, dtype=jnp.int32)[None, :]
    last_q = jnp.minimum(pos0[:, None] + (ti + 1) * tt, lens[:, None])  # excl
    end = jnp.clip((last_q + st - 1) // st, 1, S // st)
    first_q = pos0[:, None] + ti * tt
    first = jnp.minimum(
        jnp.maximum(first_q - win[0] + 1, 0) // st, end - 1)
    nv = jnp.stack([first, end], axis=-1)  # [BH, NT, 2]

    kf = k_cache.reshape(BH, S, D)
    vf = v_cache.reshape(BH, S, D)

    def kv_idx(bh, ti_, si, pos0_ref, lens_ref, win_ref, nv_ref):
        return (bh, jnp.clip(si, nv_ref[bh, ti_, 0], nv_ref[bh, ti_, 1] - 1), 0)

    in_specs = [
        pl.BlockSpec((1, G, tt, D),
                     lambda bh, ti_, si, *_: (bh, 0, ti_, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, st, D), kv_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, st, D), kv_idx, memory_space=pltpu.VMEM),
    ]
    args = [qb, kf, vf]
    if quantized:
        def sc_idx(bh, ti_, si, pos0_ref, lens_ref, win_ref, nv_ref):
            return (bh, 0,
                    jnp.clip(si, nv_ref[bh, ti_, 0], nv_ref[bh, ti_, 1] - 1))

        ks = k_scale.reshape(BH, 1, S)
        vs = v_scale.reshape(BH, 1, S)
        in_specs += [
            pl.BlockSpec((1, 1, st), sc_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, st), sc_idx, memory_space=pltpu.VMEM),
        ]
        args += [ks, vs]

    def kern(pos0_ref, lens_ref, win_ref, nv_ref, *rest, **kw):
        it = list(rest)
        ks_ref = vs_ref = None
        if quantized:
            q_ref, k_ref, v_ref, ks_ref, vs_ref = it[:5]
            out_ref, m_ref, l_ref, acc_ref = it[5:]
        else:
            q_ref, k_ref, v_ref = it[:3]
            out_ref, m_ref, l_ref, acc_ref = it[3:]
        _prefill_attn_kernel(pos0_ref, lens_ref, win_ref, nv_ref, q_ref,
                             k_ref, v_ref, ks_ref, vs_ref, out_ref, m_ref,
                             l_ref, acc_ref, **kw)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(BH, NT, S // st),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, G, tt, D),
                               lambda bh, ti_, si, *_: (bh, 0, ti_, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G * tt, 1), jnp.float32),
            pltpu.VMEM((G * tt, 1), jnp.float32),
            pltpu.VMEM((G * tt, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(kern, tt=tt, st=st, softcap=logit_softcap,
                          quantized=quantized),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((BH, G, T, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * S * D,
            bytes_accessed=(2 * B * Hkv * S * D * k_cache.dtype.itemsize
                            * max(NT, 1)
                            + (8 * B * Hkv * S if quantized else 0)),
            transcendentals=B * H * T * S,
        ),
        interpret=INTERPRET,
    )(pos0, lens, win, nv, *args)

    # [BH, G, T, D] → [B, T, H, D]
    out = out.reshape(B, Hkv, G, T, D).transpose(0, 3, 1, 2, 4)
    out = out.reshape(B, T, H, D)
    if Dq < D:
        out = out[..., :Dq]
    return out.astype(q.dtype)


def prefill_supported(T: int, S: int, D: int, H: int, Hkv: int) -> bool:
    """Shape gate for prefill_attention: lane-aligned head dim, tileable
    cache, G*tt rows within scratch budget."""
    if T < 2 or H % Hkv != 0:
        return False
    if D % 128 != 0 or S % 128 != 0:
        return False
    G = H // Hkv
    tt = min(T, 256)
    while T % tt:
        tt //= 2
    if tt < 8:
        return False
    # score plane [G*tt, st] f32 + kv tiles within ~12 MB
    st = min(S, 512)
    return (G * tt * st * 4 * 2.5 + 4 * st * D * 2) < 12 * 2**20


def decode_attention(
    q: jnp.ndarray,  # [B, 1, H, D] (already roped), any float dtype
    k_cache: jnp.ndarray,  # [B, Hkv, S, D] int8 or bf16
    v_cache: jnp.ndarray,
    k_scale,  # [B, Hkv, S, 1] f32 or None
    v_scale,
    kv_valid_len: jnp.ndarray,  # [B] i32
    scale: float,
    logit_softcap: float = 0.0,
    window=None,  # traced i32 scalar or None (no sliding window)
) -> jnp.ndarray:
    """Single-layer-slice variant: an L=1 view over the stacked kernel."""
    return decode_attention_stacked(
        q, k_cache[None], v_cache[None],
        None if k_scale is None else k_scale[None],
        None if v_scale is None else v_scale[None],
        jnp.int32(0), kv_valid_len,
        scale=scale, logit_softcap=logit_softcap, window=window,
    )


def _adapt_refs(kernel, _quant, _self, lay_ref, nv_ref, *rest, **kw):
    """Map the variable positional ref list (scales/self operands optional)
    onto the full kernel signature, filling absent refs with None."""
    it = list(rest)
    q_ref, k_ref, v_ref = it[0], it[1], it[2]
    i = 3
    ks_ref = vs_ref = sk_ref = sv_ref = selfok_ref = None
    if _quant:
        ks_ref, vs_ref = it[i], it[i + 1]
        i += 2
    if _self:
        sk_ref, sv_ref = it[i], it[i + 1]
        i += 2
    lens_ref, win_ref = it[i], it[i + 1]
    i += 2
    if _self:
        selfok_ref = it[i]
        i += 1
    out_ref, m_ref, l_ref, acc_ref = it[i], it[i + 1], it[i + 2], it[i + 3]
    kernel(lay_ref, nv_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, sk_ref,
           sv_ref, lens_ref, win_ref, selfok_ref, out_ref, m_ref, l_ref,
           acc_ref, **kw)
