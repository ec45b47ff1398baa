"""Fused KV-cache append kernel (decode T=1).

The XLA path for a quantized cache costs ~10 ops per layer per step
(amax/round/cast for k and v + 4 dynamic_update_slices for payloads and
scales) — measured as the entire int8-vs-bf16 decode gap (ROUND2_NOTES).
This kernel does quantize + append in ONE launch per layer: the caches stay
in HBM (memory_space ANY) and only a small aligned window around each slot's
write offset moves — read-modify-write, because Mosaic requires DMA slice
offsets provably aligned to the (8, 128) tiling.

The cache head dim is lane-padded to a multiple of 128 by the storage layer
(ops/kv_cache.pad_head_dim) — narrower new rows arrive zero-padded, so the
window DMAs are always tile-aligned and no D=64 lane-pairing reshape (a
layout-transposing copy of the whole slice) is ever needed.

Rows after the write offset inside the window are future positions (never
read: attention masks cols >= kv_valid) and are clobbered with broadcast
copies; rows before it are preserved by the read-modify-write.

Reference analog: the ggml_cpy(K/V, cache view) nodes of llm_build_kv
(/root/reference/cpp/src/llama.cpp llm_build_kv_store) — redesigned: no
cache-sized tensor ever moves, per-slot offsets come from SMEM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False

_WIN = 8  # payload window (sublane tiling)
_SWIN = 128  # scale window (lane tiling)


def _rmw_payload(cref, l, b, off, new_hd, win_s, sem):
    """RMW an aligned [H, _WIN, D] window: rows >= off get `new` [H, D]
    (future rows clobbered with copies — never read past kv_valid).

    The new row arrives [H, D] (no middle singleton: Mosaic rejects the
    middle-dim-inserting reshape/broadcast) and is written with _WIN
    predicated static-row stores."""
    off_al = pl.multiple_of((off // _WIN) * _WIN, _WIN)
    rd = pltpu.make_async_copy(cref.at[l, b, :, pl.ds(off_al, _WIN), :], win_s, sem)
    rd.start()
    rd.wait()
    new_c = new_hd.astype(win_s.dtype)
    rel = off - off_al
    for w in range(_WIN):  # static unroll: all store indices constant
        @pl.when(w >= rel)
        def _():
            win_s[:, w, :] = new_c
    wr = pltpu.make_async_copy(win_s, cref.at[l, b, :, pl.ds(off_al, _WIN), :], sem)
    wr.start()
    wr.wait()


def _rmw_scale(sref, l, b, off, new_h1, win_s, sem):
    """RMW an aligned [H, _SWIN] lane window of the [L, B, H, S] scale plane."""
    off_al = pl.multiple_of((off // _SWIN) * _SWIN, _SWIN)
    rd = pltpu.make_async_copy(sref.at[l, b, :, pl.ds(off_al, _SWIN)], win_s, sem)
    rd.start()
    rd.wait()
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _SWIN), 1)
    keep_new = lane >= (off - off_al)
    win_s[:] = jnp.where(keep_new, new_h1, win_s[:])
    wr = pltpu.make_async_copy(win_s, sref.at[l, b, :, pl.ds(off_al, _SWIN)], sem)
    wr.start()
    wr.wait()


def _append_kernel_quant(
    lay_ref,  # [1, 1] i32 (SMEM): layer index into the stacked cache
    off_ref,  # [B, 1] i32 (SMEM)
    knew_ref,  # [1, H, D] f32/bf16 (VMEM block, grid b)
    vnew_ref,
    kc_in, vc_in, ks_in, vs_in,  # aliased inputs (ANY) — same buffers as out
    kc_ref, vc_ref,  # [L, B, H, S, D] i8 (ANY)
    ks_ref, vs_ref,  # [L, B, H, S] f32 (ANY)
    kwin, vwin, swin, sem,
    *,
    S: int = 0,
):
    b = pl.program_id(0)
    l = lay_ref[0, 0]
    off = jnp.minimum(off_ref[b, 0], S - 1)  # dynamic_update_slice clamping

    def quantize(new_ref):
        x2 = new_ref[0].astype(jnp.float32)  # [H, D]
        scale2 = jnp.max(jnp.abs(x2), axis=-1, keepdims=True) / 127.0
        q2 = jnp.round(x2 / jnp.maximum(scale2, 1e-12)).astype(jnp.int8)
        return q2, scale2

    kq, ksc = quantize(knew_ref)
    vq, vsc = quantize(vnew_ref)
    _rmw_payload(kc_ref, l, b, off, kq, kwin, sem)
    _rmw_payload(vc_ref, l, b, off, vq, vwin, sem)
    _rmw_scale(ks_ref, l, b, off, ksc, swin, sem)
    _rmw_scale(vs_ref, l, b, off, vsc, swin, sem)


def _append_kernel_plain(
    lay_ref, off_ref, knew_ref, vnew_ref,
    kc_in, vc_in,
    kc_ref, vc_ref,
    win, sem,
    *,
    S: int = 0,
):
    b = pl.program_id(0)
    l = lay_ref[0, 0]
    off = jnp.minimum(off_ref[b, 0], S - 1)
    _rmw_payload(kc_ref, l, b, off, knew_ref[0], win, sem)  # [H, D]
    _rmw_payload(vc_ref, l, b, off, vnew_ref[0], win, sem)


def _pad_new(new, width):
    d = new.shape[-1]
    if d == width:
        return new
    return jnp.pad(new, ((0, 0),) * (new.ndim - 1) + ((0, width - d),))


def kv_append_decode_stacked(
    k_all,  # [L, B, H, S, D] full stacked cache (i8 or bf16), D % 128 == 0
    v_all,
    new_k,  # [B, 1, H, d], d <= D (zero-padded to D here)
    new_v,
    offsets,  # [B] i32
    layer,  # traced i32 scalar: which layer slice to write
    k_scale_all=None,  # [L, B, H, S, 1] f32 when quantized
    v_scale_all=None,
):
    """Write one token per slot into layer `layer` of the stacked cache —
    one kernel launch, cache buffers aliased in place (memory_space ANY).

    Taking the FULL stacked cache (instead of a per-layer slice) keeps the
    cache out of XLA's scan slicing (no per-layer slice materialization);
    the layer index rides SMEM."""
    import functools

    L, B, H, S, D = k_all.shape
    assert D % 128 == 0, (
        "cache head dim must be lane-padded (ops/kv_cache.pad_head_dim)")
    assert v_all.shape[-1] == D, "MLA (D_k != D_v) uses the XLA append path"
    quantized = k_scale_all is not None
    # [B, 1, H, D] → [B, H, D]: squeezing the leading singleton is layout-
    # preserving (minor (H, D) tiles unchanged) — unlike the [B, H, 1, D]
    # transpose, which re-tiles to (1, D) minors and cost a real copy per
    # layer per step
    kn = _pad_new(new_k, D).reshape(B, H, D)
    vn = _pad_new(new_v, D).reshape(B, H, D)
    off2 = offsets.astype(jnp.int32).reshape(B, 1)
    lay2 = jnp.asarray(layer, jnp.int32).reshape(1, 1)

    def new_block(d):
        return pl.BlockSpec((1, H, d), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem_spec = pl.BlockSpec((B, 1), lambda b: (0, 0),
                             memory_space=pltpu.SMEM)
    lay_spec = pl.BlockSpec((1, 1), lambda b: (0, 0),
                            memory_space=pltpu.SMEM)

    if quantized:
        ks3 = k_scale_all.reshape(L, B, H, S)
        vs3 = v_scale_all.reshape(L, B, H, S)
        out = pl.pallas_call(
            functools.partial(_append_kernel_quant, S=S),
            grid=(B,),
            in_specs=[lay_spec, smem_spec, new_block(D), new_block(D),
                      any_spec, any_spec, any_spec, any_spec],
            out_specs=(any_spec, any_spec, any_spec, any_spec),
            out_shape=(
                jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
                jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
                jax.ShapeDtypeStruct(ks3.shape, jnp.float32),
                jax.ShapeDtypeStruct(vs3.shape, jnp.float32),
            ),
            input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
            scratch_shapes=[
                pltpu.VMEM((H, _WIN, D), jnp.int8),
                pltpu.VMEM((H, _WIN, D), jnp.int8),
                pltpu.VMEM((H, _SWIN), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=INTERPRET,
        )(lay2, off2, kn, vn, k_all, v_all, ks3, vs3)
        k, v, ks, vs = out
        return (k, v,
                ks.reshape(L, B, H, S, 1), vs.reshape(L, B, H, S, 1))

    k, v = pl.pallas_call(
        functools.partial(_append_kernel_plain, S=S),
        grid=(B,),
        in_specs=[lay_spec, smem_spec, new_block(D), new_block(D),
                  any_spec, any_spec],
        out_specs=(any_spec, any_spec),
        out_shape=(
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ),
        input_output_aliases={4: 0, 5: 1},
        scratch_shapes=[
            pltpu.VMEM((H, _WIN, D), k_all.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(lay2, off2, kn, vn, k_all, v_all)
    return k, v, None, None


def _append_all_kernel_quant(
    off_ref,  # [B, 1] i32 (SMEM)
    knew_ref,  # [L, 1, H, D] f32/bf16 (VMEM block, grid b)
    vnew_ref,
    kc_in, vc_in, ks_in, vs_in,  # aliased inputs (ANY)
    kc_ref, vc_ref,  # [L, B, H, S, D] i8 (ANY)
    ks_ref, vs_ref,  # [L, B, H, S] f32 (ANY)
    kwin, vwin, kswin, vswin, sem,
    *,
    S: int = 0,
):
    b = pl.program_id(0)
    off = jnp.minimum(off_ref[b, 0], S - 1)

    def quantize(new_ref):
        x = new_ref[:, 0].astype(jnp.float32)  # [L, H, D]
        scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0  # [L,H,1]
        q = jnp.round(x / jnp.maximum(scale, 1e-12)).astype(jnp.int8)
        return q, scale

    kq, ksc = quantize(knew_ref)
    vq, vsc = quantize(vnew_ref)
    _rmw_payload_all(kc_ref, b, off, kq, kwin, sem)
    _rmw_payload_all(vc_ref, b, off, vq, vwin, sem)
    _rmw_scale_all(ks_ref, b, off, ksc, kswin, sem)
    _rmw_scale_all(vs_ref, b, off, vsc, vswin, sem)


def _append_all_kernel_plain(
    off_ref, knew_ref, vnew_ref,
    kc_in, vc_in,
    kc_ref, vc_ref,
    kwin, vwin, sem,
    *,
    S: int = 0,
):
    b = pl.program_id(0)
    off = jnp.minimum(off_ref[b, 0], S - 1)
    _rmw_payload_all(kc_ref, b, off, knew_ref[:, 0], kwin, sem)
    _rmw_payload_all(vc_ref, b, off, vnew_ref[:, 0], vwin, sem)


def _rmw_payload_all(cref, b, off, new_lhd, win_s, sem):
    """RMW one slot's aligned [L, H, _WIN, D] window across ALL layers in a
    single DMA box (the per-slot write offset is the same for every layer)."""
    off_al = pl.multiple_of((off // _WIN) * _WIN, _WIN)
    rd = pltpu.make_async_copy(
        cref.at[:, b, :, pl.ds(off_al, _WIN), :], win_s, sem)
    rd.start()
    rd.wait()
    new_c = new_lhd.astype(win_s.dtype)  # [L, H, D]
    rel = off - off_al
    for w in range(_WIN):
        @pl.when(w >= rel)
        def _():
            win_s[:, :, w, :] = new_c
    wr = pltpu.make_async_copy(
        win_s, cref.at[:, b, :, pl.ds(off_al, _WIN), :], sem)
    wr.start()
    wr.wait()


def _rmw_scale_all(sref, b, off, new_lh1, win_s, sem):
    """RMW one slot's aligned [L, H, _SWIN] scale window across all layers."""
    off_al = pl.multiple_of((off // _SWIN) * _SWIN, _SWIN)
    rd = pltpu.make_async_copy(sref.at[:, b, :, pl.ds(off_al, _SWIN)], win_s, sem)
    rd.start()
    rd.wait()
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _SWIN), 2)
    keep_new = lane >= (off - off_al)
    win_s[:] = jnp.where(keep_new, new_lh1, win_s[:])
    wr = pltpu.make_async_copy(win_s, sref.at[:, b, :, pl.ds(off_al, _SWIN)], sem)
    wr.start()
    wr.wait()


def kv_append_all_layers(
    k_all,  # [L, B, H, S, D] full stacked cache (i8 or bf16), D % 128 == 0
    v_all,
    new_k,  # [L, B, H, d], d <= D (zero-padded to D here)
    new_v,
    offsets,  # [B] i32 (same write position for every layer)
    k_scale_all=None,  # [L, B, H, S, 1] f32 when quantized
    v_scale_all=None,
):
    """Deferred decode append: write one token per slot into EVERY layer of
    the stacked cache in one kernel launch (one [L, H, _WIN, D] DMA box per
    slot instead of one window per slot PER LAYER — the per-layer append was
    DMA-latency bound at ~100 µs/layer, tools/kernel_micro.py).

    Pairs with decode_attention_stacked(self_kv=...): attention folds the
    new token in as an in-kernel self term, the scan collects the per-layer
    rows, and this kernel lands them all after the scan."""
    import functools

    L, B, H, S, D = k_all.shape
    assert D % 128 == 0, (
        "cache head dim must be lane-padded (ops/kv_cache.pad_head_dim)")
    assert v_all.shape[-1] == D
    quantized = k_scale_all is not None
    kn = _pad_new(new_k, D).reshape(L, B, H, D)
    vn = _pad_new(new_v, D).reshape(L, B, H, D)
    off2 = offsets.astype(jnp.int32).reshape(B, 1)

    new_block = pl.BlockSpec((L, 1, H, D), lambda b: (0, b, 0, 0),
                             memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem_spec = pl.BlockSpec((B, 1), lambda b: (0, 0),
                             memory_space=pltpu.SMEM)

    if quantized:
        ks3 = k_scale_all.reshape(L, B, H, S)
        vs3 = v_scale_all.reshape(L, B, H, S)
        out = pl.pallas_call(
            functools.partial(_append_all_kernel_quant, S=S),
            grid=(B,),
            in_specs=[smem_spec, new_block, new_block,
                      any_spec, any_spec, any_spec, any_spec],
            out_specs=(any_spec, any_spec, any_spec, any_spec),
            out_shape=(
                jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
                jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
                jax.ShapeDtypeStruct(ks3.shape, jnp.float32),
                jax.ShapeDtypeStruct(vs3.shape, jnp.float32),
            ),
            input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
            scratch_shapes=[
                pltpu.VMEM((L, H, _WIN, D), jnp.int8),
                pltpu.VMEM((L, H, _WIN, D), jnp.int8),
                pltpu.VMEM((L, H, _SWIN), jnp.float32),
                pltpu.VMEM((L, H, _SWIN), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=INTERPRET,
        )(off2, kn, vn, k_all, v_all, ks3, vs3)
        k, v, ks, vs = out
        return (k, v,
                ks.reshape(L, B, H, S, 1), vs.reshape(L, B, H, S, 1))

    k, v = pl.pallas_call(
        functools.partial(_append_all_kernel_plain, S=S),
        grid=(B,),
        in_specs=[smem_spec, new_block, new_block, any_spec, any_spec],
        out_specs=(any_spec, any_spec),
        out_shape=(
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ),
        input_output_aliases={3: 0, 4: 1},
        scratch_shapes=[
            pltpu.VMEM((L, H, _WIN, D), k_all.dtype),
            pltpu.VMEM((L, H, _WIN, D), v_all.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(off2, kn, vn, k_all, v_all)
    return k, v, None, None


def kv_append_decode(
    layer_k,  # [B, H, S, D] cache slice (i8 or bf16), D % 128 == 0
    layer_v,
    new_k,  # [B, 1, H, d], d <= D
    new_v,
    offsets,  # [B] i32
    layer_k_scale=None,  # [B, H, S, 1] f32 when quantized
    layer_v_scale=None,
):
    """Single-layer-slice variant: an L=1 view over the stacked kernel."""
    out = kv_append_decode_stacked(
        layer_k[None], layer_v[None], new_k, new_v, offsets,
        jnp.int32(0),
        None if layer_k_scale is None else layer_k_scale[None],
        None if layer_v_scale is None else layer_v_scale[None],
    )
    k, v, ks, vs = out
    return (k[0], v[0],
            None if ks is None else ks[0],
            None if vs is None else vs[0])


# ---------------- paged pool (table-steered) deferred append ----------------

def _page_target(tbl_ref, off_ref, b, P: int, MAXP: int):
    """(physical page, in-page offset) for slot b; positions past the table
    range divert to physical page 0 — the reserved scratch page (same
    contract as ops/paged_kv.append_paged_layer)."""
    off = off_ref[b, 0]
    lp = off // P
    in_range = lp < MAXP
    page = jnp.where(in_range, tbl_ref[b, jnp.minimum(lp, MAXP - 1)], 0)
    o = jnp.where(in_range, off % P, 0)
    return page, o


def _append_all_kernel_paged_quant(
    tbl_ref,  # [B, MAXP] i32 (SMEM)
    off_ref,  # [B, 1] i32 (SMEM)
    knew_ref,  # [L, 1, Hkv, D] f32/bf16 (VMEM block, grid b)
    vnew_ref,
    kc_in, vc_in, ks_in, vs_in,  # aliased inputs (ANY)
    kc_ref, vc_ref,  # [L, Np, Hkv, P, D] i8 (ANY)
    ks_ref, vs_ref,  # [L, Np, Hkv, P] f32 (ANY)
    kwin, vwin, kswin, vswin, sem,
    *,
    P: int = 0,
    MAXP: int = 0,
):
    b = pl.program_id(0)
    page, o = _page_target(tbl_ref, off_ref, b, P, MAXP)

    def quantize(new_ref):
        x = new_ref[:, 0].astype(jnp.float32)  # [L, Hkv, D]
        scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
        q = jnp.round(x / jnp.maximum(scale, 1e-12)).astype(jnp.int8)
        return q, scale

    kq, ksc = quantize(knew_ref)
    vq, vsc = quantize(vnew_ref)
    # the dense all-layer RMW helpers index dim 1 generically —
    # (batch b) there, (physical page) here
    _rmw_payload_all(kc_ref, page, o, kq, kwin, sem)
    _rmw_payload_all(vc_ref, page, o, vq, vwin, sem)
    _rmw_scale_all(ks_ref, page, o, ksc, kswin, sem)
    _rmw_scale_all(vs_ref, page, o, vsc, vswin, sem)


def _append_all_kernel_paged_plain(
    tbl_ref, off_ref, knew_ref, vnew_ref,
    kc_in, vc_in,
    kc_ref, vc_ref,
    kwin, vwin, sem,
    *,
    P: int = 0,
    MAXP: int = 0,
):
    b = pl.program_id(0)
    page, o = _page_target(tbl_ref, off_ref, b, P, MAXP)
    _rmw_payload_all(kc_ref, page, o, knew_ref[:, 0], kwin, sem)
    _rmw_payload_all(vc_ref, page, o, vnew_ref[:, 0], vwin, sem)


def kv_append_all_layers_paged(
    pool_k,  # [L, Np, Hkv, P, D] whole stacked page pool, D % 128 == 0
    pool_v,
    new_k,  # [L, B, Hkv, d] one decode token per slot, all layers
    new_v,
    offsets,  # [B] i32 logical write positions (slot lengths)
    table,  # [B, MAXP] i32
    pool_ks=None,  # [L, Np, Hkv, P, 1] f32 when quantized
    pool_vs=None,
):
    """Deferred decode append into the paged pool: ONE kernel launch lands
    every layer's new row through the page table (the Pallas sibling of
    ops/paged_kv.paged_append_all_layers, whose XLA scatter cost ~1.0 ms
    in-situ at the 64-stream bench shape vs 0.07 ms for the dense fused
    append — tools/paged_residual.py r5).  Pools stay in HBM (ANY) and only
    a [L, Hkv, _WIN, D] aligned window per slot moves.

    Rows past the write offset inside the window are the slot's own future
    positions (page sharing is full-prefix-page only) and are clobbered,
    exactly like the dense kernel."""
    import functools

    L, Np, Hkv, P, D = pool_k.shape
    assert D % 128 == 0 and P % _SWIN == 0, (
        "paged fused append needs lane-padded head dims and P % 128 == 0")
    assert pool_v.shape[-1] == D, "MLA pools use the XLA scatter path"
    B = offsets.shape[0]
    MAXP = table.shape[1]
    quantized = pool_ks is not None
    kn = _pad_new(new_k, D).reshape(L, B, Hkv, D)
    vn = _pad_new(new_v, D).reshape(L, B, Hkv, D)
    off2 = offsets.astype(jnp.int32).reshape(B, 1)
    tbl2 = table.astype(jnp.int32)

    new_block = pl.BlockSpec((L, 1, Hkv, D), lambda b: (0, b, 0, 0),
                             memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    off_spec = pl.BlockSpec((B, 1), lambda b: (0, 0),
                            memory_space=pltpu.SMEM)
    tbl_spec = pl.BlockSpec((B, MAXP), lambda b: (0, 0),
                            memory_space=pltpu.SMEM)

    if quantized:
        ks4 = pool_ks.reshape(L, Np, Hkv, P)
        vs4 = pool_vs.reshape(L, Np, Hkv, P)
        out = pl.pallas_call(
            functools.partial(_append_all_kernel_paged_quant, P=P,
                              MAXP=MAXP),
            grid=(B,),
            in_specs=[tbl_spec, off_spec, new_block, new_block,
                      any_spec, any_spec, any_spec, any_spec],
            out_specs=(any_spec, any_spec, any_spec, any_spec),
            out_shape=(
                jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
                jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
                jax.ShapeDtypeStruct(ks4.shape, jnp.float32),
                jax.ShapeDtypeStruct(vs4.shape, jnp.float32),
            ),
            input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
            scratch_shapes=[
                pltpu.VMEM((L, Hkv, _WIN, D), jnp.int8),
                pltpu.VMEM((L, Hkv, _WIN, D), jnp.int8),
                pltpu.VMEM((L, Hkv, _SWIN), jnp.float32),
                pltpu.VMEM((L, Hkv, _SWIN), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=INTERPRET,
        )(tbl2, off2, kn, vn, pool_k, pool_v, ks4, vs4)
        k, v, ks, vs = out
        return (k, v,
                ks.reshape(L, Np, Hkv, P, 1), vs.reshape(L, Np, Hkv, P, 1))

    k, v = pl.pallas_call(
        functools.partial(_append_all_kernel_paged_plain, P=P, MAXP=MAXP),
        grid=(B,),
        in_specs=[tbl_spec, off_spec, new_block, new_block,
                  any_spec, any_spec],
        out_specs=(any_spec, any_spec),
        out_shape=(
            jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
            jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
        ),
        input_output_aliases={4: 0, 5: 1},
        scratch_shapes=[
            pltpu.VMEM((L, Hkv, _WIN, D), pool_k.dtype),
            pltpu.VMEM((L, Hkv, _WIN, D), pool_v.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(tbl2, off2, kn, vn, pool_k, pool_v)
    return k, v, None, None
