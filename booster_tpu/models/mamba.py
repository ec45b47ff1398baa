"""Mamba (selective state space) forward — the recurrent model family.

Reference: build_mamba (/root/reference/cpp/src/llama.cpp:12016) with the
SSM_CONV / SSM_SCAN ops (ggml.h) and the recurrent llama_kv_cache mode.
TPU redesign: the recurrence runs as `lax.scan` over time inside one jit;
decode carries an explicit (conv_state, ssm_state) pytree instead of a KV
cache — states are tiny ([B, d_inner, d_conv-1] and [B, d_inner, d_state])
so chunked multi-token decode stays one dispatch.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from booster_tpu.models.config import ModelConfig
from booster_tpu.ops.linear import qlinear


@dataclass
class MambaState:
    """Recurrent state pytree: conv [L, B, di, k-1], ssm [L, B, di, ds]."""

    conv: jnp.ndarray
    ssm: jnp.ndarray

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int) -> "MambaState":
        L, di = cfg.n_layers, cfg.ssm_d_inner
        return cls(
            conv=jnp.zeros((L, batch, di, cfg.ssm_d_conv - 1), jnp.float32),
            ssm=jnp.zeros((L, batch, di, cfg.ssm_d_state), jnp.float32),
        )


jax.tree_util.register_pytree_node(
    MambaState, lambda s: ((s.conv, s.ssm), None),
    lambda aux, c: MambaState(*c),
)


def _layer(x, lp, conv_st, ssm_st, cfg: ModelConfig):
    """One mamba block over [B, T, C]; returns (out, conv_st, ssm_st)."""
    B, T, C = x.shape
    di, ds = cfg.ssm_d_inner, cfg.ssm_d_state
    dk = cfg.ssm_d_conv
    dtr = cfg.ssm_dt_rank

    xz = qlinear(x.astype(jnp.bfloat16), lp["ssm_in"])  # [B, T, 2*di]
    x1 = xz[..., :di].astype(jnp.float32)
    z = xz[..., di:].astype(jnp.float32)

    # causal depthwise conv over time: prepend carried state
    seq = jnp.concatenate([conv_st, x1.transpose(0, 2, 1)], axis=-1)  # [B,di,k-1+T]
    cw = lp["conv_w"].astype(jnp.float32)  # [di, dk]
    conv = sum(
        seq[..., i : i + T] * cw[None, :, i : i + 1] for i in range(dk)
    )  # [B, di, T]
    conv = conv + lp["conv_b"].astype(jnp.float32)[None, :, None]
    new_conv_st = seq[..., T:]
    xc = jax.nn.silu(conv).transpose(0, 2, 1)  # [B, T, di]

    dbc = qlinear(xc.astype(jnp.bfloat16), lp["ssm_x"])  # [B,T,dtr+2ds]
    dt = dbc[..., :dtr].astype(jnp.float32)
    Bm = dbc[..., dtr : dtr + ds].astype(jnp.float32)
    Cm = dbc[..., dtr + ds :].astype(jnp.float32)
    dt = qlinear(dt.astype(jnp.bfloat16), lp["ssm_dt"]).astype(jnp.float32)
    dt = jax.nn.softplus(dt + lp["ssm_dt_b"].astype(jnp.float32))  # [B,T,di]

    A = -jnp.exp(lp["ssm_a"].astype(jnp.float32))  # [di, ds]

    def step(h, inp):
        dt_t, b_t, c_t, x_t = inp  # [B,di], [B,ds], [B,ds], [B,di]
        dA = jnp.exp(dt_t[..., None] * A[None])  # [B, di, ds]
        dBx = (dt_t * x_t)[..., None] * b_t[:, None, :]  # [B, di, ds]
        h = h * dA + dBx
        y = jnp.einsum("bds,bs->bd", h, c_t)  # [B, di]
        return h, y

    h, ys = jax.lax.scan(
        step, ssm_st,
        (dt.transpose(1, 0, 2), Bm.transpose(1, 0, 2),
         Cm.transpose(1, 0, 2), xc.transpose(1, 0, 2)),
    )
    y = ys.transpose(1, 0, 2)  # [B, T, di]
    y = y + xc * lp["ssm_d"].astype(jnp.float32)[None, None, :]
    y = y * jax.nn.silu(z)
    out = qlinear(y.astype(jnp.bfloat16), lp["ssm_out"])  # [B, T, C]
    return out.astype(x.dtype), new_conv_st, h


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T]
    state: MambaState,
) -> tuple[jnp.ndarray, MambaState]:
    """Returns (logits [B, T, V], updated state)."""
    from booster_tpu.models.llama import rms_norm

    x = params["tok_embd"][tokens].astype(jnp.bfloat16)

    def body(x, scanned):
        lp, conv_st, ssm_st = scanned
        h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        out, conv_st, ssm_st = _layer(h, lp, conv_st, ssm_st, cfg)
        return x + out, (conv_st, ssm_st)

    x, (new_conv, new_ssm) = jax.lax.scan(
        body, x, (params["layers"], state.conv, state.ssm)
    )
    x = rms_norm(x, params["output_norm"], cfg.rms_eps)
    emb = params["tok_embd"]
    out_w = params.get("output")
    if out_w is not None:
        logits = qlinear(x, out_w)
    else:
        logits = jax.lax.dot_general(
            x.astype(jnp.bfloat16), emb.astype(jnp.bfloat16),
            (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
    return logits.astype(jnp.float32), MambaState(new_conv, new_ssm)


@dataclass
class MambaCache:
    """Slot-state analog of ops.kv_cache.KVCache for the recurrent family:
    per-slot (conv, ssm) state + host-visible lengths bookkeeping.  The
    state is O(1) per slot, so serving slots never run out of 'cache' —
    context shift is a no-op (infinite generation is native)."""

    conv: jnp.ndarray  # [L, B, di, k-1] f32
    ssm: jnp.ndarray  # [L, B, di, ds] f32
    lengths: jnp.ndarray  # [B] i32 tokens consumed (bookkeeping only)

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int) -> "MambaCache":
        L, di = cfg.n_layers, cfg.ssm_d_inner
        return cls(
            conv=jnp.zeros((L, batch, di, cfg.ssm_d_conv - 1), jnp.float32),
            ssm=jnp.zeros((L, batch, di, cfg.ssm_d_state), jnp.float32),
            lengths=jnp.zeros(batch, jnp.int32),
        )


jax.tree_util.register_pytree_node(
    MambaCache, lambda c: ((c.conv, c.ssm, c.lengths), None),
    lambda aux, c: MambaCache(*c),
)


def _layer_masked(x, lp, conv_st, ssm_st, valid, cfg: ModelConfig):
    """One mamba block over [B, T, C] with a per-(row, t) validity mask:
    state only advances where valid (right-padded prefill rows / inactive
    decode slots).  Matmuls stay batched over T; only the depthwise conv
    window and the selective-scan state are sequential."""
    B, T, C = x.shape
    di, ds = cfg.ssm_d_inner, cfg.ssm_d_state
    dtr = cfg.ssm_dt_rank

    xz = qlinear(x.astype(jnp.bfloat16), lp["ssm_in"])  # [B, T, 2*di]
    x1 = xz[..., :di].astype(jnp.float32)
    z = xz[..., di:].astype(jnp.float32)

    cw = lp["conv_w"].astype(jnp.float32)  # [di, dk]
    cb = lp["conv_b"].astype(jnp.float32)
    vT = valid.T  # [T, B]

    def conv_step(w, inp):
        x_t, v_t = inp  # [B, di], [B]
        seq = jnp.concatenate([w, x_t[..., None]], axis=-1)  # [B, di, dk]
        out = jnp.sum(seq * cw[None], axis=-1) + cb[None]
        w = jnp.where(v_t[:, None, None], seq[..., 1:], w)
        return w, out

    new_conv, conv_out = jax.lax.scan(
        conv_step, conv_st, (x1.transpose(1, 0, 2), vT))
    xc = jax.nn.silu(conv_out).transpose(1, 0, 2)  # [B, T, di]

    dbc = qlinear(xc.astype(jnp.bfloat16), lp["ssm_x"])  # [B,T,dtr+2ds]
    dt = dbc[..., :dtr].astype(jnp.float32)
    Bm = dbc[..., dtr : dtr + ds].astype(jnp.float32)
    Cm = dbc[..., dtr + ds :].astype(jnp.float32)
    dt = qlinear(dt.astype(jnp.bfloat16), lp["ssm_dt"]).astype(jnp.float32)
    dt = jax.nn.softplus(dt + lp["ssm_dt_b"].astype(jnp.float32))  # [B,T,di]

    A = -jnp.exp(lp["ssm_a"].astype(jnp.float32))  # [di, ds]

    def step(h, inp):
        dt_t, b_t, c_t, x_t, v_t = inp
        dA = jnp.exp(dt_t[..., None] * A[None])  # [B, di, ds]
        dBx = (dt_t * x_t)[..., None] * b_t[:, None, :]
        hn = h * dA + dBx
        y = jnp.einsum("bds,bs->bd", hn, c_t)
        h = jnp.where(v_t[:, None, None], hn, h)
        return h, y

    h, ys = jax.lax.scan(
        step, ssm_st,
        (dt.transpose(1, 0, 2), Bm.transpose(1, 0, 2),
         Cm.transpose(1, 0, 2), xc.transpose(1, 0, 2), vT),
    )
    y = ys.transpose(1, 0, 2)  # [B, T, di]
    y = y + xc * lp["ssm_d"].astype(jnp.float32)[None, None, :]
    y = y * jax.nn.silu(z)
    out = qlinear(y.astype(jnp.bfloat16), lp["ssm_out"])  # [B, T, C]
    return out.astype(x.dtype), new_conv, h


@partial(jax.jit, static_argnames=("cfg", "last_only"))
def forward_slots(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T]
    cache: MambaCache,
    last_only: bool = False,
    gather_idx: Optional[jnp.ndarray] = None,  # [B]
    n_valid: Optional[jnp.ndarray] = None,  # [B] (decode: 0/1 live mask)
    rope_positions=None,  # accepted for llama.forward interface parity
) -> tuple[jnp.ndarray, MambaCache]:
    """llama.forward-compatible slot forward for the recurrent family —
    the serving engine's batched prefill/decode paths call this unchanged
    (reference analog: the recurrent llama_kv_cache mode, llama.cpp:2711)."""
    from booster_tpu.models.llama import rms_norm

    B, T = tokens.shape
    if n_valid is None:
        n_val = jnp.full((B,), T, jnp.int32)
    else:
        n_val = jnp.minimum(n_valid, T)
    valid = jnp.arange(T, dtype=jnp.int32)[None, :] < n_val[:, None]

    x = params["tok_embd"][tokens].astype(jnp.bfloat16)

    def body(x, scanned):
        lp, conv_st, ssm_st = scanned
        h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        out, conv_st, ssm_st = _layer_masked(h, lp, conv_st, ssm_st, valid, cfg)
        return x + out, (conv_st, ssm_st)

    x, (new_conv, new_ssm) = jax.lax.scan(
        body, x, (params["layers"], cache.conv, cache.ssm)
    )
    x = rms_norm(x, params["output_norm"], cfg.rms_eps)
    if gather_idx is not None:
        x = x[jnp.arange(B), gather_idx][:, None, :]
    elif last_only:
        x = x[:, -1:, :]
    out_w = params.get("output")
    if out_w is not None:
        logits = qlinear(x, out_w)
    else:
        logits = jax.lax.dot_general(
            x.astype(jnp.bfloat16), params["tok_embd"].astype(jnp.bfloat16),
            (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
    cache = MambaCache(new_conv, new_ssm, cache.lengths + n_val)
    return logits.astype(jnp.float32), cache


def generate_mamba(model, prompt_ids, max_new_tokens: int = 64,
                   temp: float = 0.0, seed: int = 0):
    """Greedy/sampled generation with the recurrent state (one-shot CLI)."""
    import numpy as np

    cfg = model.cfg
    state = MambaState.create(cfg, 1)
    ids = jnp.asarray(np.asarray(prompt_ids, np.int32)[None, :])
    logits, state = forward(model.params, cfg, ids, state)
    key = jax.random.PRNGKey(seed)
    out = []
    tok = jnp.argmax(logits[:, -1, :], axis=-1)
    for _ in range(max_new_tokens):
        t = int(tok[0])
        if model.tokenizer is not None and model.tokenizer.vocab.is_eog(t):
            break
        out.append(t)
        logits, state = forward(model.params, cfg, tok[:, None].astype(jnp.int32), state)
        if temp > 0:
            key, sub = jax.random.split(key)
            tok = jax.random.categorical(sub, logits[:, -1, :] / temp)
        else:
            tok = jnp.argmax(logits[:, -1, :], axis=-1)
    return out
