"""Fused KV-cache append kernel (decode T=1).

The XLA path for a quantized cache costs ~10 ops per layer per step
(amax/round/cast for k and v + 4 dynamic_update_slices for payloads and
scales) — measured as the entire int8-vs-bf16 decode gap (ROUND2_NOTES).
This kernel does quantize + append in ONE launch per layer: the caches stay
in HBM (memory_space ANY) and only a small aligned window around each slot's
write offset moves — read-modify-write, because Mosaic requires DMA slice
offsets provably aligned to the (8, 128) tiling.

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


def _rmw_payload(cref, b, off, new_h1d, win_s, sem):
    """RMW an aligned [H, _WIN, D] window: rows >= off get `new` [H, 1, D]
    (future rows clobbered with copies — never read past kv_valid)."""
    off_al = pl.multiple_of((off // _WIN) * _WIN, _WIN)
    rd = pltpu.make_async_copy(cref.at[b, :, pl.ds(off_al, _WIN), :], win_s, sem)
    rd.start()
    rd.wait()
    row = jax.lax.broadcasted_iota(jnp.int32, (1, _WIN, 1), 1)
    keep_new = row >= (off - off_al)
    H, _, D = new_h1d.shape
    new_w = jnp.broadcast_to(new_h1d, (H, _WIN, D))
    win_s[:] = jnp.where(keep_new, new_w.astype(win_s.dtype), win_s[:])
    wr = pltpu.make_async_copy(win_s, cref.at[b, :, pl.ds(off_al, _WIN), :], sem)
    wr.start()
    wr.wait()


def _rmw_payload_paired(cref2, b, off, new_h1d, win_s, sem):
    """D=64 variant: the cache is viewed as [B, H, S/2, 128] (two adjacent
    positions share a 128-lane row).  Row off//2's OTHER half is past data —
    preserved by the RMW; strictly later rows are clobbered."""
    half = off % 2
    prow = off // 2
    prow_al = pl.multiple_of((prow // _WIN) * _WIN, _WIN)
    rd = pltpu.make_async_copy(cref2.at[b, :, pl.ds(prow_al, _WIN), :], win_s, sem)
    rd.start()
    rd.wait()
    row = prow_al + jax.lax.broadcasted_iota(jnp.int32, (1, _WIN, 128), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _WIN, 128), 2) // 64
    new_mask = (row > prow) | ((row == prow) & (lane == half))
    new128 = jnp.concatenate([new_h1d, new_h1d], axis=-1)  # [H, 1, 128]
    H = new_h1d.shape[0]
    win_s[:] = jnp.where(new_mask,
                         jnp.broadcast_to(new128, (H, _WIN, 128)).astype(win_s.dtype),
                         win_s[:])
    wr = pltpu.make_async_copy(win_s, cref2.at[b, :, pl.ds(prow_al, _WIN), :], sem)
    wr.start()
    wr.wait()


def _rmw_scale(sref, b, off, new_h1, win_s, sem):
    """RMW an aligned [H, _SWIN] lane window of the [B, H, S] scale plane."""
    off_al = pl.multiple_of((off // _SWIN) * _SWIN, _SWIN)
    rd = pltpu.make_async_copy(sref.at[b, :, pl.ds(off_al, _SWIN)], win_s, sem)
    rd.start()
    rd.wait()
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _SWIN), 1)
    keep_new = lane >= (off - off_al)
    win_s[:] = jnp.where(keep_new, new_h1, win_s[:])
    wr = pltpu.make_async_copy(win_s, sref.at[b, :, pl.ds(off_al, _SWIN)], sem)
    wr.start()
    wr.wait()


def _append_kernel_quant(
    off_ref,  # [B, 1] i32 (SMEM)
    knew_ref,  # [1, H, 1, D] f32/bf16 (VMEM block, grid b)
    vnew_ref,
    kc_in, vc_in, ks_in, vs_in,  # aliased inputs (ANY) — same buffers as out
    kc_ref, vc_ref,  # [B, H, S, D] i8 (ANY); [B, H, S/2, 128] when paired
    ks_ref, vs_ref,  # [B, H, S] f32 (ANY)
    kwin, vwin, swin, sem,
    *,
    paired: bool = False,
    S: int = 0,
):
    b = pl.program_id(0)
    off = jnp.minimum(off_ref[b, 0], S - 1)  # dynamic_update_slice clamping

    def quantize(new_ref):
        # two load shapes (3-D for the window write, 2-D for the scale row)
        # sidestep Mosaic's unsupported value reshapes
        x3 = new_ref[0].astype(jnp.float32)  # [H, 1, D]
        x2 = new_ref[0, :, 0, :].astype(jnp.float32)  # [H, D]
        scale3 = jnp.max(jnp.abs(x3), axis=-1, keepdims=True) / 127.0
        q3 = jnp.round(x3 / jnp.maximum(scale3, 1e-12)).astype(jnp.int8)
        scale2 = jnp.max(jnp.abs(x2), axis=-1, keepdims=True) / 127.0
        return q3, scale2

    kq, ksc = quantize(knew_ref)
    vq, vsc = quantize(vnew_ref)
    if paired:
        _rmw_payload_paired(kc_ref, b, off, kq, kwin, sem)
        _rmw_payload_paired(vc_ref, b, off, vq, vwin, sem)
    else:
        _rmw_payload(kc_ref, b, off, kq, kwin, sem)
        _rmw_payload(vc_ref, b, off, vq, vwin, sem)
    _rmw_scale(ks_ref, b, off, ksc, swin, sem)
    _rmw_scale(vs_ref, b, off, vsc, swin, sem)


def _append_kernel_plain(
    off_ref, knew_ref, vnew_ref,
    kc_in, vc_in,
    kc_ref, vc_ref,
    win, sem,
    *,
    paired: bool = False,
    S: int = 0,
):
    b = pl.program_id(0)
    off = jnp.minimum(off_ref[b, 0], S - 1)
    if paired:
        _rmw_payload_paired(kc_ref, b, off, knew_ref[0], win, sem)
        _rmw_payload_paired(vc_ref, b, off, vnew_ref[0], win, sem)
    else:
        _rmw_payload(kc_ref, b, off, knew_ref[0], win, sem)
        _rmw_payload(vc_ref, b, off, vnew_ref[0], win, sem)


def kv_append_decode(
    layer_k,  # [B, H, S, D] cache slice (i8 or bf16)
    layer_v,
    new_k,  # [B, 1, H, D]
    new_v,
    offsets,  # [B] i32
    layer_k_scale=None,  # [B, H, S, 1] f32 when quantized
    layer_v_scale=None,
):
    """Returns updated (k, v, k_scale, v_scale) — one kernel launch."""
    import functools

    B, H, S, D = layer_k.shape
    quantized = layer_k_scale is not None
    paired = D == 64  # pair adjacent positions into 128-lane rows
    kc = layer_k.reshape(B, H, S // 2, 128) if paired else layer_k
    vc = layer_v.reshape(B, H, S // 2, 128) if paired else layer_v
    kn = new_k.transpose(0, 2, 1, 3)  # [B, H, 1, D]
    vn = new_v.transpose(0, 2, 1, 3)
    off2 = offsets.astype(jnp.int32).reshape(B, 1)
    win_d = 128 if paired else D

    new_block = pl.BlockSpec((1, H, 1, D), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem_spec = pl.BlockSpec((B, 1), lambda b: (0, 0),
                             memory_space=pltpu.SMEM)

    if quantized:
        ks3 = layer_k_scale.reshape(B, H, S)
        vs3 = layer_v_scale.reshape(B, H, S)
        out = pl.pallas_call(
            functools.partial(_append_kernel_quant, paired=paired, S=S),
            grid=(B,),
            in_specs=[smem_spec, new_block, new_block,
                      any_spec, any_spec, any_spec, any_spec],
            out_specs=(any_spec, any_spec, any_spec, any_spec),
            out_shape=(
                jax.ShapeDtypeStruct(kc.shape, kc.dtype),
                jax.ShapeDtypeStruct(vc.shape, vc.dtype),
                jax.ShapeDtypeStruct(ks3.shape, jnp.float32),
                jax.ShapeDtypeStruct(vs3.shape, jnp.float32),
            ),
            input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
            scratch_shapes=[
                pltpu.VMEM((H, _WIN, win_d), jnp.int8),
                pltpu.VMEM((H, _WIN, win_d), jnp.int8),
                pltpu.VMEM((H, _SWIN), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=INTERPRET,
        )(off2, kn, vn, kc, vc, ks3, vs3)
        k, v, ks, vs = out
        return (k.reshape(B, H, S, D), v.reshape(B, H, S, D),
                ks.reshape(B, H, S, 1), vs.reshape(B, H, S, 1))

    k, v = pl.pallas_call(
        functools.partial(_append_kernel_plain, paired=paired, S=S),
        grid=(B,),
        in_specs=[smem_spec, new_block, new_block, any_spec, any_spec],
        out_specs=(any_spec, any_spec),
        out_shape=(
            jax.ShapeDtypeStruct(kc.shape, kc.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
        ),
        input_output_aliases={3: 0, 4: 1},
        scratch_shapes=[
            pltpu.VMEM((H, _WIN, win_d), layer_k.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(off2, kn, vn, kc, vc)
    return k.reshape(B, H, S, D), v.reshape(B, H, S, D), None, None
