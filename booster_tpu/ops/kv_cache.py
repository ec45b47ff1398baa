"""KV cache: static-shape per-slot ring buffers, layer-stacked for lax.scan.

Design: the reference keeps one contiguous cell array with per-seq bookkeeping
(llama_kv_cache, /root/reference/cpp/src/llama.cpp:2495-2540; slot search
:3028).  TPU-native redesign: a statically-shaped [L, B, S, H_kv, D] tensor
per (k, v), with per-slot write offsets — no dynamic slot search inside jit;
the serving scheduler assigns slots.  Optional int8 quantization (the
type_k/type_v analog) stores payload + per-(token, head) scales.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def pad_head_dim(d: int) -> int:
    """Storage head dim: the next multiple of 128 lanes.

    TPU tiled layouts already pad the minor dim of every HBM array to 128
    lanes, so storing D=64 (or 80/96/192…) caches at the padded width costs
    ZERO extra HBM — but it makes the logical shape match the physical one,
    which removes the per-layer layout-transposing copies XLA otherwise
    inserts around the Pallas kernels (measured 4×8.4 MB/layer on the 1.1B
    decode step — tools/ablate_decode.py) and lets the aligned RMW window
    DMAs in ops/pallas_kv.py work without the D=64 lane-pairing dance.
    Padding lanes hold exact zeros: appends write zero-padded rows, so
    q_pad·K_pad adds 0·0 terms and P·V_pad yields zeros that are sliced off.
    """
    return ((d + 127) // 128) * 128


@partial(jax.jit, static_argnames=("cls", "fields"))
def _zeros_cache(cls, fields):
    """Build a zeroed cache's arrays as ONE compiled computation."""
    return cls(**{name: jnp.zeros(shape, dt) for name, shape, dt in fields})


@dataclass
class KVCache:
    """Pytree: k/v [L, B, H_kv, S, Dc] (+ scales when quantized), lengths [B].

    Heads-major layout: attention consumes [B, H, S, Dc] directly — no
    per-step transposes of the whole cache (each saved kernel matters, see
    ROUND1_NOTES on per-kernel overhead).  Dc = pad_head_dim(D): the head
    dim is stored lane-padded with zeros (see pad_head_dim)."""

    k: jnp.ndarray
    v: jnp.ndarray
    lengths: jnp.ndarray  # [B] int32: tokens already stored per slot
    k_scale: Optional[jnp.ndarray] = None  # [L, B, H_kv, S, 1] f32 when int8
    v_scale: Optional[jnp.ndarray] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @classmethod
    def create(
        cls,
        n_layers: int,
        batch: int,
        max_len: int,
        n_kv_heads: int,
        head_dim: int,
        dtype=jnp.bfloat16,
        quantized: bool = False,
        head_dim_v: int = 0,  # 0 → head_dim (MLA: v dim ≠ qk dim)
    ) -> "KVCache":
        dv = head_dim_v or head_dim
        k_shape = (n_layers, batch, n_kv_heads, max_len, pad_head_dim(head_dim))
        v_shape = (n_layers, batch, n_kv_heads, max_len, pad_head_dim(dv))
        # one jitted executable builds every field: N separate jnp.zeros
        # calls are N device dispatches, each a full round-trip through the
        # axon tunnel — this alloc sat in the measured TTFT path
        if quantized:
            return _zeros_cache(
                cls, (("k", k_shape, jnp.int8), ("v", v_shape, jnp.int8),
                      ("lengths", (batch,), jnp.int32),
                      ("k_scale", k_shape[:-1] + (1,), jnp.float32),
                      ("v_scale", v_shape[:-1] + (1,), jnp.float32)))
        return _zeros_cache(
            cls, (("k", k_shape, dtype), ("v", v_shape, dtype),
                  ("lengths", (batch,), jnp.int32)))


def _quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(token, head) symmetric int8: x [B,T,H,D] → (q, scale[B,T,H,1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = amax / 127.0
    q = jnp.round(x.astype(jnp.float32) / jnp.maximum(scale, 1e-12)).astype(jnp.int8)
    return q, scale


def _use_fused_append() -> bool:
    import os

    if os.environ.get("BT_FUSED_KV", "1") == "0":
        return False
    from booster_tpu.ops.linear import use_pallas
    from booster_tpu.ops.pallas_kv import INTERPRET

    return use_pallas() or INTERPRET


def update_layer(
    layer_k: jnp.ndarray,  # [B, H, S, D] (cache slice for one layer)
    layer_v: jnp.ndarray,
    new_k: jnp.ndarray,  # [B, T, H, D]
    new_v: jnp.ndarray,
    offsets: jnp.ndarray,  # [B] int32 write positions
    layer_k_scale: Optional[jnp.ndarray] = None,  # [B, H, S, 1]
    layer_v_scale: Optional[jnp.ndarray] = None,
):
    """Write new tokens at per-slot offsets; returns updated slices.

    The cache head dim may be lane-padded (pad_head_dim); narrower new rows
    are zero-padded to the storage width before the write."""
    def _padd(new, width):
        d = new.shape[-1]
        if d == width:
            return new
        return jnp.pad(new, ((0, 0),) * (new.ndim - 1) + ((0, width - d),))

    new_k = _padd(new_k, layer_k.shape[-1])
    new_v = _padd(new_v, layer_v.shape[-1])
    if (new_k.shape[1] == 1 and layer_k.shape[2] % 128 == 0
            and layer_k.shape[3] == layer_v.shape[3]  # MLA: D_k ≠ D_v
            and layer_k.shape[3] % 128 == 0
            and _use_fused_append()):
        from booster_tpu.ops.pallas_kv import kv_append_decode

        return kv_append_decode(
            layer_k, layer_v, new_k, new_v, offsets,
            layer_k_scale, layer_v_scale,
        )
    new_k = new_k.transpose(0, 2, 1, 3)  # → [B, H, T, D]
    new_v = new_v.transpose(0, 2, 1, 3)

    if layer_k_scale is not None:
        qk, sk = _quantize_kv(new_k)
        qv, sv = _quantize_kv(new_v)

        def write_row(cache, scale_cache, q, s, off):
            cache = jax.lax.dynamic_update_slice(cache, q, (0, off, 0))
            scale_cache = jax.lax.dynamic_update_slice(scale_cache, s, (0, off, 0))
            return cache, scale_cache

        layer_k, layer_k_scale = jax.vmap(write_row)(layer_k, layer_k_scale, qk, sk, offsets)
        layer_v, layer_v_scale = jax.vmap(write_row)(layer_v, layer_v_scale, qv, sv, offsets)
        return layer_k, layer_v, layer_k_scale, layer_v_scale

    def write_row(cache, new, off):
        return jax.lax.dynamic_update_slice(cache, new.astype(cache.dtype), (0, off, 0))

    layer_k = jax.vmap(write_row)(layer_k, new_k, offsets)
    layer_v = jax.vmap(write_row)(layer_v, new_v, offsets)
    return layer_k, layer_v, None, None


def dequant_kv(q: jnp.ndarray, scale: Optional[jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    if scale is None:
        return q.astype(dtype)
    return (q.astype(jnp.float32) * scale).astype(dtype)


def _rot_delta(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, style: str):
    """Rotate the first 2·len(cos) dims of [..., D] by a fixed angle."""
    d_rot = 2 * cos.shape[-1]
    xr = x[..., :d_rot]
    x_pass = x[..., d_rot:]
    if style == "norm":
        x0, x1 = xr[..., 0::2], xr[..., 1::2]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rotated = jnp.stack([r0, r1], axis=-1).reshape(xr.shape)
    elif style == "neox":
        half = d_rot // 2
        x0, x1 = xr[..., :half], xr[..., half:]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rotated = jnp.concatenate([r0, r1], axis=-1)
    else:
        return x
    if x_pass.shape[-1]:
        return jnp.concatenate([rotated, x_pass], axis=-1)
    return rotated


@partial(jax.jit, static_argnames=("style",), donate_argnames=("cache",))
def shift_slot_cache(
    cache: KVCache,
    slot,  # traced i32 scalar
    n_keep,  # traced i32: tokens kept verbatim at the front
    n_discard,  # traced i32: tokens dropped after the kept prefix
    inv_freq: jnp.ndarray,  # [D_rot/2] effective rope frequencies
    style: str,
) -> KVCache:
    """In-cache context shift for one slot (reference behavior:
    llama_kv_cache_seq_rm + seq_add, bridge.cpp:487-507, realized like the
    K-shift graph llama.cpp:13771): compact the kept entries to the front and
    rotate the moved K entries by -n_discard so their rope positions are
    exact at the new locations.  V carries no positional encoding.  No
    re-prefill, no recompute."""
    S = cache.max_len
    length = cache.lengths[slot]
    i = jnp.arange(S)
    src = jnp.clip(jnp.where(i < n_keep, i, i + n_discard), 0, S - 1)
    moved = (i >= n_keep)[:, None]  # [S, 1] → broadcast over D

    ang = -n_discard.astype(jnp.float32) * inv_freq  # [D_rot/2]
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    k_row = jnp.take(cache.k[:, slot], src, axis=2)  # [L, H, S, D]
    v_row = jnp.take(cache.v[:, slot], src, axis=2)
    if cache.quantized:
        ks_row = jnp.take(cache.k_scale[:, slot], src, axis=2)  # [L, H, S, 1]
        vs_row = jnp.take(cache.v_scale[:, slot], src, axis=2)
        kf = k_row.astype(jnp.float32) * ks_row
        kf = jnp.where(moved, _rot_delta(kf, cos, sin, style), kf)
        # requantize the rotated row (per token, head)
        amax = jnp.max(jnp.abs(kf), axis=-1, keepdims=True)
        new_ks = amax / 127.0
        new_k = jnp.round(kf / jnp.maximum(new_ks, 1e-12)).astype(jnp.int8)
        return KVCache(
            k=cache.k.at[:, slot].set(new_k),
            v=cache.v.at[:, slot].set(v_row),
            lengths=cache.lengths.at[slot].add(-n_discard),
            k_scale=cache.k_scale.at[:, slot].set(new_ks),
            v_scale=cache.v_scale.at[:, slot].set(vs_row),
        )
    kf = k_row.astype(jnp.float32)
    kf = jnp.where(moved, _rot_delta(kf, cos, sin, style), kf)
    return KVCache(
        k=cache.k.at[:, slot].set(kf.astype(cache.k.dtype)),
        v=cache.v.at[:, slot].set(v_row),
        lengths=cache.lengths.at[slot].add(-n_discard),
        k_scale=None,
        v_scale=None,
    )


def _flatten(c: KVCache):
    return (c.k, c.v, c.lengths, c.k_scale, c.v_scale), None


def _unflatten(aux, children):
    return KVCache(*children)


jax.tree_util.register_pytree_node(KVCache, _flatten, _unflatten)
