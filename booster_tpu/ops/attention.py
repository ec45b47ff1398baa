"""Attention over the KV cache (GQA, causal + sliding-window masks, softcap).

XLA einsum formulation with f32 softmax — the correctness baseline and the
prefill path.  The fused (quantized-KV) decode attention Pallas kernel lives
in ops/pallas_attention.py and replaces this on TPU for batched decode.

Reference analog: llm_build_kqv (/root/reference/cpp/src/llama.cpp:8188-8280)
with the flash-attn / KQ-softmax paths.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def alibi_slopes(n_heads: int, max_bias: float) -> jnp.ndarray:
    """Per-head ALiBi slopes (ggml soft_max_ext formula: m0^(h+1) for the
    first pow2 heads, m1^(2(h-n2)+1) beyond)."""
    import math

    n2 = 2 ** math.floor(math.log2(n_heads))
    m0 = 2.0 ** (-max_bias / n2)
    m1 = 2.0 ** (-(max_bias / 2.0) / n2)
    s = [m0 ** (h + 1) for h in range(n2)] + [
        m1 ** (2 * (h - n2) + 1) for h in range(n2, n_heads)
    ]
    return jnp.asarray(s, jnp.float32)


def build_mask(q_positions, kv_valid_len, S: int, sliding_window=None):
    """[B, T, S] attention mask (position-only: hoistable out of layer scans)."""
    kv_idx = jnp.arange(S)[None, None, :]
    qpos = q_positions[:, :, None]
    mask = (kv_idx <= qpos) & (kv_idx < kv_valid_len[:, None, None])
    if sliding_window is not None:
        mask = mask & (kv_idx > qpos - sliding_window)
    return mask

# materialized-score budget above which the online-softmax chunked path runs
_CHUNK_THRESHOLD = 32 * 1024 * 1024  # elements in [B, H, T, S]
_KV_CHUNK = 512


def attention(
    q: jnp.ndarray,  # [B, T, H, D] (already roped)
    k_cache: jnp.ndarray,  # [B, H_kv, S, D] (heads-major cache layout)
    v_cache: jnp.ndarray,  # [B, H_kv, S, D]
    q_positions: jnp.ndarray,  # [B, T] absolute position of each query token
    kv_valid_len: jnp.ndarray,  # [B] number of valid kv entries (incl. new)
    scale: float,
    logit_softcap: float = 0.0,
    sliding_window=None,  # int32 scalar (traced ok); None disables
    mask=None,  # [B, T, S] bool precomputed (hoisted out of the layer scan)
    alibi_slopes=None,  # [H] f32: adds -slope_h·(q_pos − j) to scores (mpt)
) -> jnp.ndarray:
    """Returns [B, T, H, D].  kv index j attends iff j <= q_pos and
    j < kv_valid_len and (no window or q_pos - j < window)."""
    B, T, H, D = q.shape
    Hkv = k_cache.shape[1]
    S = k_cache.shape[2]
    groups = H // Hkv

    if (B * H * T * S > _CHUNK_THRESHOLD and S % _KV_CHUNK == 0
            and alibi_slopes is None):
        return _attention_chunked(
            q, k_cache, v_cache, q_positions, kv_valid_len, scale,
            logit_softcap, sliding_window,
        )

    # matmuls run on bf16 inputs with f32 accumulation (casting the whole
    # cache to f32 costs more VPU time than the attention itself at high B)
    qf = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    kf = k_cache.astype(jnp.bfloat16)
    vf = v_cache.astype(jnp.bfloat16)

    # [B, Hkv, G, T, D] x [B, Hkv, S, D] → [B, Hkv, G, T, S]
    qg = qf.reshape(B, T, Hkv, groups, D).transpose(0, 2, 3, 1, 4)
    scores = jnp.einsum(
        "bhgtd,bhsd->bhgts", qg, kf,
        preferred_element_type=jnp.float32,
    )

    if logit_softcap > 0.0:
        scores = logit_softcap * jnp.tanh(scores / logit_softcap)

    if alibi_slopes is not None:
        # bias = -slope_h · |q_pos − j| (llama_set_inputs alibi mask rows)
        dist = jnp.abs(
            q_positions[:, None, :, None].astype(jnp.float32)
            - jnp.arange(S, dtype=jnp.float32)[None, None, None, :]
        )  # [B, 1, T, S]
        slopes = alibi_slopes.reshape(Hkv, groups)[None, :, :, None, None]
        scores = scores - slopes * dist[:, :, None, :, :]

    if mask is None:
        mask = build_mask(q_positions, kv_valid_len, S, sliding_window)
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
    out = jnp.einsum(
        "bhgts,bhsd->bhgtd", probs, vf,
        preferred_element_type=jnp.float32,
    )
    out = out.transpose(0, 3, 1, 2, 4).reshape(B, T, H, -1)
    return out.astype(q.dtype)


def _attention_chunked(
    q: jnp.ndarray,  # [B, T, H, D]
    k_cache: jnp.ndarray,  # [B, H_kv, S, D]
    v_cache: jnp.ndarray,
    q_positions: jnp.ndarray,  # [B, T]
    kv_valid_len: jnp.ndarray,  # [B]
    scale: float,
    logit_softcap: float = 0.0,
    sliding_window=None,
) -> jnp.ndarray:
    """Online-softmax attention over KV chunks (flash-attention recurrence in
    XLA): peak memory O(B·H·T·CHUNK) instead of O(B·H·T·S).  Numerics match
    the dense path to f32 rounding."""
    B, T, H, D = q.shape
    Hkv = k_cache.shape[1]
    S = k_cache.shape[2]
    groups = H // Hkv
    C = _KV_CHUNK
    n_chunks = S // C

    qf = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    qf = qf.reshape(B, T, Hkv, groups, D).transpose(0, 2, 3, 1, 4)  # [B,Hkv,G,T,D]
    kf = k_cache.astype(jnp.bfloat16)  # already [B, Hkv, S, D]
    vf = v_cache.astype(jnp.bfloat16)
    qpos = q_positions[:, :, None]  # [B, T, 1]

    def body(carry, c_idx):
        m, l, acc = carry
        start = c_idx * C
        kc = jax.lax.dynamic_slice_in_dim(kf, start, C, axis=2)
        vc = jax.lax.dynamic_slice_in_dim(vf, start, C, axis=2)
        s_chunk = jnp.einsum("bhgtd,bhsd->bhgts", qf, kc,
                             preferred_element_type=jnp.float32)
        if logit_softcap > 0.0:
            s_chunk = logit_softcap * jnp.tanh(s_chunk / logit_softcap)
        kv_idx = start + jnp.arange(C)[None, None, :]
        mask = (kv_idx <= qpos) & (kv_idx < kv_valid_len[:, None, None])
        if sliding_window is not None:
            mask &= kv_idx > qpos - sliding_window
        s_chunk = jnp.where(mask[:, None, None, :, :], s_chunk, NEG_INF)

        m_new = jnp.maximum(m, s_chunk.max(axis=-1))
        p = jnp.exp(s_chunk - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhgts,bhsd->bhgtd", p.astype(jnp.bfloat16), vc,
            preferred_element_type=jnp.float32,
        )
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((B, Hkv, groups, T), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, Hkv, groups, T), jnp.float32)
    acc0 = jnp.zeros((B, Hkv, groups, T, v_cache.shape[-1]), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), jnp.arange(n_chunks))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    out = out.transpose(0, 3, 1, 2, 4).reshape(B, T, H, -1)
    return out.astype(q.dtype)
