"""BERT-family encoder forward (embedding models).

Reference: build_bert (/root/reference/cpp/src/llama.cpp:9746) — bidirectional
attention, post-norm residuals (attn_output_norm / layer_output_norm), token
type + learned position embeddings, mean/CLS pooling
(llama_pooling_type, llama.cpp:17088).  The same builder also covers
nomic-bert (neox rope instead of learned positions, gated silu FFN, GQA)
and jina-bert-v2 (ALiBi attention, gated gelu FFN with down bias, optional
q/k LayerNorms + attn_norm_2) — reproduced here via the same conditionals.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from booster_tpu.models.config import ModelConfig
from booster_tpu.models.llama import _act, layer_norm
from booster_tpu.ops.linear import qlinear

POOL_NONE = 0
POOL_MEAN = 1
POOL_CLS = 2


@partial(jax.jit, static_argnames=("cfg", "pooling"))
def encode(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T] int32 (right-padded)
    n_valid: Optional[jnp.ndarray] = None,  # [B] real token counts
    pooling: int = POOL_MEAN,
) -> jnp.ndarray:
    """Returns [B, C] pooled embeddings (or [B, T, C] with POOL_NONE)."""
    from booster_tpu.ops.attention import alibi_slopes
    from booster_tpu.ops.rope import apply_rope_tables, rope_tables

    B, T = tokens.shape
    H, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    eps = cfg.rms_eps
    if n_valid is None:
        n_valid = jnp.full(B, T, jnp.int32)
    mask = jnp.arange(T)[None, :] < n_valid[:, None]  # [B, T]

    x = params["tok_embd"][tokens].astype(jnp.float32)
    if "token_types" in params:  # type id 0 for single-segment input
        x = x + params["token_types"][0][None, None, :].astype(jnp.float32)
    if "pos_embd" in params:
        x = x + params["pos_embd"][jnp.arange(T)][None, :, :].astype(jnp.float32)
    x = layer_norm(x, params["tok_norm"], params.get("tok_norm_b"), eps)
    x = x.astype(jnp.bfloat16)

    attn_bias = jnp.where(mask, 0.0, -1e30)[:, None, None, :]  # [B,1,1,T]
    if cfg.alibi_max_bias > 0:  # jina-bert-v2
        slopes = alibi_slopes(H, cfg.alibi_max_bias)
        attn_bias = attn_bias + (
            slopes[None, :, None, None]
            * jnp.arange(T, dtype=jnp.float32)[None, None, None, :]
        )
    rope_cs = None
    if cfg.arch == "nomic-bert":  # rope replaces learned positions
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
        rope_cs = rope_tables(pos, params["rope"]["inv_freq"],
                              params["rope"]["mscale"])

    def body(x, lp):
        if "wqkv" in lp:  # nomic fused projection (loader keeps it fused)
            qkv = qlinear(x, lp["wqkv"])
            d_q, d_kv = H * D, Hkv * D
            q = qkv[..., :d_q]
            k = qkv[..., d_q : d_q + d_kv]
            v = qkv[..., d_q + d_kv :]
        else:
            q = qlinear(x, lp["wq"], lp.get("bq"))
            k = qlinear(x, lp["wk"], lp.get("bk"))
            v = qlinear(x, lp["wv"], lp.get("bv"))
        if "q_norm" in lp:  # jina: LayerNorm over the flat projection
            q = layer_norm(q, lp["q_norm"], lp.get("q_norm_b"), eps)
            k = layer_norm(k, lp["k_norm"], lp.get("k_norm_b"), eps)
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, Hkv, D)
        v = v.reshape(B, T, Hkv, D)
        if rope_cs is not None:
            q = apply_rope_tables(q, *rope_cs, cfg.rope_style)
            k = apply_rope_tables(k, *rope_cs, cfg.rope_style)
        if Hkv != H:  # nomic GQA
            k = jnp.repeat(k, H // Hkv, axis=2)
            v = jnp.repeat(v, H // Hkv, axis=2)
        scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.bfloat16),
                            k.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        scores = scores / (D ** 0.5) + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        ctx = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        attn = qlinear(ctx.reshape(B, T, H * D).astype(x.dtype),
                       lp["wo"], lp.get("bo"))
        x = layer_norm(x + attn, lp["attn_out_norm"],
                       lp.get("attn_out_norm_b"), eps).astype(jnp.bfloat16)
        if "attn_norm_2" in lp:  # jina optional second norm
            x = layer_norm(x, lp["attn_norm_2"], lp.get("attn_norm_2_b"),
                           eps).astype(jnp.bfloat16)
        if "w_gateup" in lp:  # gated FFN, loader-fused gate+up rows
            gu = qlinear(x, lp["w_gateup"])
            ff = gu.shape[-1] // 2
            ffn = qlinear(_act(gu[..., :ff], cfg.act) * gu[..., ff:],
                          lp["w_down"], lp.get("b_down"))
        elif "w_gate" in lp:  # nomic (silu) / jina (gelu) gated FFN
            g = _act(qlinear(x, lp["w_gate"]), cfg.act)
            ffn = qlinear(g * qlinear(x, lp["w_up"]), lp["w_down"],
                          lp.get("b_down"))
        else:  # bert: up → gelu → down, all biased
            up = qlinear(x, lp["w_up"], lp.get("b_up"))
            ffn = qlinear(_act(up, cfg.act), lp["w_down"], lp.get("b_down"))
        x = layer_norm(x + ffn, lp["layer_out_norm"],
                       lp.get("layer_out_norm_b"), eps).astype(jnp.bfloat16)
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])

    if pooling == POOL_CLS:
        return x[:, 0, :].astype(jnp.float32)
    if pooling == POOL_MEAN:
        m = mask[:, :, None].astype(jnp.float32)
        return (x.astype(jnp.float32) * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
    return x.astype(jnp.float32)


def embed_texts(model, texts: list[str], pooling: int = POOL_MEAN):
    """Tokenize + encode a batch of texts; returns [N, C] numpy."""
    import numpy as np

    ids = [model.tokenizer.encode(t) for t in texts]
    T = max(max(len(i) for i in ids), 1)
    toks = np.zeros((len(ids), T), np.int32)
    nv = np.zeros(len(ids), np.int32)
    for r, i in enumerate(ids):
        toks[r, : len(i)] = i
        nv[r] = len(i)
    out = encode(model.params, model.cfg, jnp.asarray(toks),
                 jnp.asarray(nv), pooling)
    return np.asarray(out)
