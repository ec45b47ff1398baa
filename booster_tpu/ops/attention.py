"""Attention over the KV cache (GQA, causal + sliding-window masks, softcap).

XLA einsum formulation with f32 softmax; the Pallas flash/paged-attention
kernels (ops/pallas_attention.py) replace this on TPU for long contexts.

Reference analog: llm_build_kqv (/root/reference/cpp/src/llama.cpp:8188-8280)
with the flash-attn / KQ-softmax paths.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def attention(
    q: jnp.ndarray,  # [B, T, H, D] (already roped)
    k_cache: jnp.ndarray,  # [B, S, H_kv, D]
    v_cache: jnp.ndarray,  # [B, S, H_kv, D]
    q_positions: jnp.ndarray,  # [B, T] absolute position of each query token
    kv_valid_len: jnp.ndarray,  # [B] number of valid kv entries (incl. new)
    scale: float,
    logit_softcap: float = 0.0,
    sliding_window=None,  # int32 scalar (traced ok); None disables
) -> jnp.ndarray:
    """Returns [B, T, H, D].  kv index j attends iff j <= q_pos and
    j < kv_valid_len and (no window or q_pos - j < window)."""
    B, T, H, D = q.shape
    S = k_cache.shape[1]
    Hkv = k_cache.shape[2]
    groups = H // Hkv

    qf = q.astype(jnp.float32) * scale
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)

    # [B, Hkv, G, T, D] x [B, Hkv, S, D] → [B, Hkv, G, T, S]
    qg = qf.reshape(B, T, Hkv, groups, D).transpose(0, 2, 3, 1, 4)
    scores = jnp.einsum("bhgtd,bhsd->bhgts", qg, kf.transpose(0, 2, 1, 3))

    if logit_softcap > 0.0:
        scores = logit_softcap * jnp.tanh(scores / logit_softcap)

    kv_idx = jnp.arange(S)[None, None, :]  # [1, 1, S]
    qpos = q_positions[:, :, None]  # [B, T, 1]
    mask = (kv_idx <= qpos) & (kv_idx < kv_valid_len[:, None, None])
    if sliding_window is not None:
        mask &= kv_idx > qpos - sliding_window
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgts,bhsd->bhgtd", probs, vf.transpose(0, 2, 1, 3))
    out = out.transpose(0, 3, 1, 2, 4).reshape(B, T, H, D)
    return out.astype(q.dtype)
