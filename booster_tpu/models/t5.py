"""T5 encoder forward (llama_encode_internal analog).

Reference: build_t5_encoder (/root/reference/cpp/src/llama.cpp:13210),
enc.* tensor names (:1253-1262).  Bidirectional attention with learned
relative-position bucket biases (shared from block 0), T5 RMSNorm (pre-norm,
plain rms), unscaled attention, relu or gated FFN.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from booster_tpu.models.config import ModelConfig
from booster_tpu.models.llama import rms_norm
from booster_tpu.ops.linear import qlinear


def relative_buckets(T: int, num_buckets: int, max_dist: int) -> np.ndarray:
    """[T, T] bucket ids for (query i, key j), bidirectional T5 formula."""
    ctx = np.arange(T)
    rel = ctx[None, :] - ctx[:, None]  # j - i
    nb = num_buckets // 2
    ret = (rel > 0).astype(np.int64) * nb
    n = np.abs(rel)
    max_exact = nb // 2
    is_small = n < max_exact
    with np.errstate(divide="ignore"):
        val_large = max_exact + (
            np.log(np.maximum(n, 1) / max_exact)
            / np.log(max_dist / max_exact) * (nb - max_exact)
        ).astype(np.int64)
    val_large = np.minimum(val_large, nb - 1)
    return ret + np.where(is_small, n, val_large)


@partial(jax.jit, static_argnames=("cfg",))
def encode(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T]
    n_valid: Optional[jnp.ndarray] = None,  # [B]
) -> jnp.ndarray:
    """Returns [B, T, C] encoder hidden states (final-norm applied)."""
    B, T = tokens.shape
    H, D = cfg.n_heads, cfg.head_dim
    if n_valid is None:
        n_valid = jnp.full(B, T, jnp.int32)
    mask = jnp.arange(T)[None, :] < n_valid[:, None]
    attn_bias = jnp.where(mask, 0.0, -1e30)[:, None, None, :]  # [B,1,1,T]

    # relative position bias, shared across layers (block-0 table)
    buckets = jnp.asarray(relative_buckets(T, cfg.rel_buckets, cfg.rel_max_dist))
    rel_b = params["rel_b"]  # [n_buckets, H]
    pos_bias = rel_b[buckets].transpose(2, 0, 1)[None]  # [1, H, T, T]

    x = params["tok_embd"][tokens].astype(jnp.bfloat16)

    def body(x, lp):
        h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q = qlinear(h, lp["wq"]).reshape(B, T, H, D)
        k = qlinear(h, lp["wk"]).reshape(B, T, H, D)
        v = qlinear(h, lp["wv"]).reshape(B, T, H, D)
        scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.bfloat16),
                            k.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        scores = scores + pos_bias + attn_bias  # unscaled (T5)
        probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        ctx = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        x = x + qlinear(ctx.reshape(B, T, H * D).astype(x.dtype), lp["wo"])
        h = rms_norm(x, lp["ffn_norm"], cfg.rms_eps)
        if "w_gate" in lp:  # gated (t5 v1.1): act(gate) * up
            from booster_tpu.models.llama import _act

            ff = _act(qlinear(h, lp["w_gate"]), cfg.act) * qlinear(h, lp["w_up"])
        else:  # relu
            ff = jax.nn.relu(qlinear(h, lp["w_up"]).astype(jnp.float32)
                             ).astype(x.dtype)
        x = x + qlinear(ff.astype(x.dtype), lp["w_down"])
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return rms_norm(x, params["output_norm"], cfg.rms_eps).astype(jnp.float32)
