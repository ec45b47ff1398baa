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
    # full t5: the encoder stack lives under enc_layers/enc_norm and the
    # main layers/output_norm keys hold the decoder (llama.cpp dec.* names)
    enc_layers = params.get("enc_layers", params.get("layers"))
    enc_norm = params.get("enc_norm", params.get("output_norm"))

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

    x, _ = jax.lax.scan(body, x, enc_layers)
    return rms_norm(x, enc_norm, cfg.rms_eps).astype(jnp.float32)


# ---------------------------------------------------------------------------
# decoder (llama.cpp build_t5 decoder half, :13377) — causal self-attention
# with its own relative bias table + cross-attention over the encoder output
# ---------------------------------------------------------------------------


def _causal_buckets_jnp(pos, n_pos: int, num_buckets: int, max_dist: int):
    """[n_pos] bucket ids for query at `pos` vs keys 0..n_pos-1, causal T5
    formula (bidirectional=False: full num_buckets, n = max(i - j, 0))."""
    import math

    j = jnp.arange(n_pos)
    n = jnp.maximum(pos - j, 0)
    max_exact = num_buckets // 2
    val_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_dist / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return jnp.where(n < max_exact, n, val_large)


@partial(jax.jit, static_argnames=("cfg",))
def cross_kv(params: dict, cfg: ModelConfig, enc_out: jnp.ndarray):
    """Precompute per-layer cross-attention K/V from the encoder output.

    enc_out [B, S, C] → (K, V) each [L, B, S, H, D]; computed once per
    request, reused by every decode step."""
    B, S, _ = enc_out.shape
    H, D = cfg.n_heads, cfg.head_dim
    h = enc_out.astype(jnp.bfloat16)

    def body(_, lp):
        k = qlinear(h, lp["wk_x"]).reshape(B, S, H, D)
        v = qlinear(h, lp["wv_x"]).reshape(B, S, H, D)
        return None, (k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))

    _, (k, v) = jax.lax.scan(body, None, params["layers"])
    return k, v


@partial(jax.jit, static_argnames=("cfg",),
         donate_argnames=("cache_k", "cache_v"))
def decode_step(
    params: dict,
    cfg: ModelConfig,
    tok: jnp.ndarray,  # [B] current decoder token
    pos: jnp.ndarray,  # scalar int32 decoder position
    cache_k: jnp.ndarray,  # [L, B, T, H, D] self-attn cache
    cache_v: jnp.ndarray,
    xk: jnp.ndarray,  # [L, B, S, H, D] cross K (from cross_kv)
    xv: jnp.ndarray,
    enc_valid: jnp.ndarray,  # [B] encoder lengths
):
    """One decoder step → (logits [B, V], cache_k, cache_v)."""
    B = tok.shape[0]
    H, D = cfg.n_heads, cfg.head_dim
    T = cache_k.shape[2]
    S = xk.shape[2]

    x = params["tok_embd"][tok][:, None].astype(jnp.bfloat16)  # [B, 1, C]

    buckets = _causal_buckets_jnp(pos, T, cfg.rel_buckets, cfg.rel_max_dist)
    pos_bias = params["dec_rel_b"][buckets].T[None, :, None, :]  # [1,H,1,T]
    self_mask = jnp.where(jnp.arange(T)[None] <= pos, 0.0, -1e30)  # [1, T]
    cross_mask = jnp.where(
        jnp.arange(S)[None, :] < enc_valid[:, None], 0.0, -1e30
    )[:, None, None, :]  # [B,1,1,S]

    def attend(q, k, v, bias):
        scores = jnp.einsum("bthd,bshd->bhts", q, k.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    def body(x, scanned):
        lp, ck, cv, kx, vx = scanned
        h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q = qlinear(h, lp["wq"]).reshape(B, 1, H, D).astype(jnp.bfloat16)
        k = qlinear(h, lp["wk"]).reshape(B, H, D).astype(jnp.bfloat16)
        v = qlinear(h, lp["wv"]).reshape(B, H, D).astype(jnp.bfloat16)
        ck = jax.lax.dynamic_update_index_in_dim(ck, k, pos, 1)
        cv = jax.lax.dynamic_update_index_in_dim(cv, v, pos, 1)
        ctx = attend(q, ck, cv, pos_bias + self_mask[None, None])
        x = x + qlinear(ctx.reshape(B, 1, H * D).astype(x.dtype), lp["wo"])

        h = rms_norm(x, lp["cross_norm"], cfg.rms_eps)
        qx = qlinear(h, lp["wq_x"]).reshape(B, 1, H, D).astype(jnp.bfloat16)
        ctx = attend(qx, kx, vx, cross_mask)
        x = x + qlinear(ctx.reshape(B, 1, H * D).astype(x.dtype), lp["wo_x"])

        h = rms_norm(x, lp["ffn_norm"], cfg.rms_eps)
        if "w_gate" in lp:
            from booster_tpu.models.llama import _act

            ff = _act(qlinear(h, lp["w_gate"]), cfg.act) * qlinear(h, lp["w_up"])
        else:
            ff = jax.nn.relu(qlinear(h, lp["w_up"]).astype(jnp.float32)
                             ).astype(x.dtype)
        x = x + qlinear(ff.astype(x.dtype), lp["w_down"])
        return x, (ck, cv)

    x, (cache_k, cache_v) = jax.lax.scan(
        body, x, (params["layers"], cache_k, cache_v, xk, xv)
    )
    x = rms_norm(x, params["output_norm"], cfg.rms_eps)
    out_w = params.get("output")
    if out_w is not None:
        logits = qlinear(x, out_w)
    else:  # tied embeddings: HF scales hidden by d_model^-0.5 first
        x = x * (float(cfg.n_embd) ** -0.5)
        logits = jax.lax.dot_general(
            x.astype(jnp.bfloat16), params["tok_embd"].astype(jnp.bfloat16),
            (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
    return logits[:, 0].astype(jnp.float32), cache_k, cache_v


def generate_t5(model, prompt_ids, max_new_tokens: int = 64,
                temp: float = 0.0, seed: int = 0, max_dec: int = 256):
    """Encoder-decoder generation (one-shot CLI): encode the prompt once,
    then autoregressive decode from cfg.dec_start_token."""
    cfg = model.cfg
    ids = jnp.asarray(np.asarray(prompt_ids, np.int32)[None, :])
    enc_out = encode(model.params, cfg, ids)
    xk, xv = cross_kv(model.params, cfg, enc_out)
    L, B, H, D = cfg.n_layers, 1, cfg.n_heads, cfg.head_dim
    ck = jnp.zeros((L, B, max_dec, H, D), jnp.bfloat16)
    cv = jnp.zeros((L, B, max_dec, H, D), jnp.bfloat16)
    enc_valid = jnp.full((B,), ids.shape[1], jnp.int32)

    start = cfg.dec_start_token if cfg.dec_start_token >= 0 else 0
    tok = jnp.full((B,), start, jnp.int32)
    key = jax.random.PRNGKey(seed)
    out: list[int] = []
    for step in range(min(max_new_tokens, max_dec)):
        logits, ck, cv = decode_step(
            model.params, cfg, tok, jnp.int32(step), ck, cv, xk, xv, enc_valid)
        if temp > 0:
            key, sub = jax.random.split(key)
            tok = jax.random.categorical(sub, logits / temp)
        else:
            tok = jnp.argmax(logits, axis=-1)
        t = int(tok[0])
        if model.tokenizer is not None and model.tokenizer.vocab.is_eog(t):
            break
        out.append(t)
        tok = tok.astype(jnp.int32)
    return out
