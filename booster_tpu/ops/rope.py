"""Rotary position embeddings: norm/neox styles, linear + YaRN scaling,
LLaMA-3.1 per-frequency factors.

Semantics parity: ggml_rope_ext / ggml_rope_yarn
(/root/reference/cpp/ggml/src/ggml.c rope kernels) — including the GGUF
convention that llama-family checkpoints are stored pre-permuted for the
"norm" style (rotate adjacent dim pairs), while neox-family models rotate
split halves.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

# rope application styles (ggml: GGML_ROPE_TYPE_* / llama.cpp LLAMA_ROPE_TYPE_*)
ROPE_NORM = "norm"  # rotate adjacent dim pairs (2i, 2i+1) — llama GGUF layout
ROPE_NEOX = "neox"  # rotate split halves (i, i + d/2) — qwen2/phi/gemma/...
ROPE_NONE = "none"


def rope_inv_freq(cfg: ModelConfig, freq_factors: Optional[np.ndarray] = None) -> np.ndarray:
    """Base inverse frequencies [rope_dims/2] (before position scaling)."""
    d = cfg.rope_dims
    inv = cfg.rope_base ** (-np.arange(0, d, 2, dtype=np.float64) / d)
    if freq_factors is not None:
        inv = inv / np.asarray(freq_factors, dtype=np.float64)
    return inv.astype(np.float32)


def _yarn_corr_dim(d: int, orig_ctx: int, beta: float, base: float) -> float:
    return d * math.log(orig_ctx / (beta * 2 * math.pi)) / (2 * math.log(base))


def yarn_params(cfg: ModelConfig) -> tuple[np.ndarray, float]:
    """Per-dim position multiplier [d/2] and attention magnitude scale.

    Returns (pos_scale, mscale): rotation angle = pos * inv_freq * pos_scale.
    For "linear" scaling pos_scale is a constant 1/rope_scale; for YaRN the
    high-frequency dims keep 1.0 and low-frequency dims interpolate
    (ggml_rope_yarn semantics with ext_factor=1).
    """
    d = cfg.rope_dims
    half = d // 2
    if cfg.rope_scaling == "none" or cfg.rope_scale == 1.0:
        return np.ones(half, np.float32), 1.0
    freq_scale = 1.0 / cfg.rope_scale
    if cfg.rope_scaling == "linear":
        return np.full(half, freq_scale, np.float32), 1.0
    # yarn
    orig = cfg.yarn_orig_ctx or cfg.n_ctx_train
    low = math.floor(_yarn_corr_dim(d, orig, cfg.yarn_beta_fast, cfg.rope_base))
    high = math.ceil(_yarn_corr_dim(d, orig, cfg.yarn_beta_slow, cfg.rope_base))
    low = max(0, low)
    high = min(d - 1, high)
    i0 = 2.0 * np.arange(half)
    ramp = 1.0 - np.clip((i0 / 2.0 - low) / max(0.001, high - low), 0.0, 1.0)
    # mix=ramp: 1 → extrapolate (keep), 0 → interpolate (scale down)
    pos_scale = freq_scale * (1.0 - ramp) + 1.0 * ramp
    mscale = cfg.yarn_attn_factor * (1.0 + 0.1 * math.log(1.0 / freq_scale))
    return pos_scale.astype(np.float32), float(mscale)


def rope_tables(
    positions: jnp.ndarray,  # [B, T] int32
    inv_freq: jnp.ndarray,  # [D_rot/2]
    mscale=1.0,
):
    """cos/sin tables [B, T, 1, D/2] — computed once per forward (they only
    depend on positions, not on the layer)."""
    angles = positions[..., None].astype(jnp.float32) * inv_freq
    cos = (jnp.cos(angles) * mscale)[:, :, None, :]
    sin = (jnp.sin(angles) * mscale)[:, :, None, :]
    return cos, sin


def apply_rope_tables(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                      style: str) -> jnp.ndarray:
    """Rotate with precomputed tables (see rope_tables)."""
    d_rot = 2 * cos.shape[-1]
    orig_dtype = x.dtype
    xr = x[..., :d_rot].astype(jnp.float32)
    x_pass = x[..., d_rot:]

    if style == ROPE_NORM:
        x0 = xr[..., 0::2]
        x1 = xr[..., 1::2]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rotated = jnp.stack([r0, r1], axis=-1).reshape(xr.shape)
    elif style == ROPE_NEOX:
        half = d_rot // 2
        x0 = xr[..., :half]
        x1 = xr[..., half:]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rotated = jnp.concatenate([r0, r1], axis=-1)
    else:
        return x
    out = (
        jnp.concatenate([rotated, x_pass.astype(jnp.float32)], axis=-1)
        if x_pass.shape[-1]
        else rotated
    )
    return out.astype(orig_dtype)


def apply_rope(
    x: jnp.ndarray,  # [B, T, H, D]
    positions: jnp.ndarray,  # [B, T] int32
    inv_freq: jnp.ndarray,  # [D_rot/2] (already includes pos_scale if static)
    style: str,
    mscale: float = 1.0,
) -> jnp.ndarray:
    """Rotate the first `2*len(inv_freq)` dims of each head."""
    d_rot = 2 * inv_freq.shape[0]
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [B,T,D/2]
    cos = (jnp.cos(angles) * mscale)[:, :, None, :]  # [B,T,1,D/2]
    sin = (jnp.sin(angles) * mscale)[:, :, None, :]
    orig_dtype = x.dtype
    xr = x[..., :d_rot].astype(jnp.float32)
    x_pass = x[..., d_rot:]

    if style == ROPE_NORM:
        x0 = xr[..., 0::2]
        x1 = xr[..., 1::2]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rotated = jnp.stack([r0, r1], axis=-1).reshape(xr.shape)
    elif style == ROPE_NEOX:
        half = d_rot // 2
        x0 = xr[..., :half]
        x1 = xr[..., half:]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rotated = jnp.concatenate([r0, r1], axis=-1)
    else:
        return x
    out = jnp.concatenate([rotated, x_pass.astype(jnp.float32)], axis=-1) if x_pass.shape[-1] else rotated
    return out.astype(orig_dtype)
