"""BERT-family encoder forward (embedding models).

Reference: build_bert (/root/reference/cpp/src/llama.cpp:9746) — bidirectional
attention, post-norm residuals (attn_output_norm / layer_output_norm), token
type + learned position embeddings, mean/CLS pooling
(llama_pooling_type, llama.cpp:17088).
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
    B, T = tokens.shape
    H, D = cfg.n_heads, cfg.head_dim
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

    def body(x, lp):
        q = qlinear(x, lp["wq"], lp.get("bq")).reshape(B, T, H, D)
        k = qlinear(x, lp["wk"], lp.get("bk")).reshape(B, T, H, D)
        v = qlinear(x, lp["wv"], lp.get("bv")).reshape(B, T, H, D)
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
