"""Importance-matrix (imatrix) quantization.

Reference: the quant_weights paths of ggml-quants.c —
quantize_row_q4_0_impl (:with make_qx_quants weighted scale search) and the
activation-statistics collection of llama.cpp's imatrix tool (per-column
mean squared input activations of every linear).

Two pieces:
  - collect_imatrix(): runs the model over calibration tokens with an
    instrumented per-layer forward and accumulates E[x²] per input column
    for every quantizable weight (GGUF tensor names as keys).
  - quantize_q4_0_imatrix(): bit-exact reimplementation of
    quantize_row_q4_0_impl — per-block weighted least-squares scale search
    (19 candidate scales), weights = qw · sqrt(sigma2 + x²).
"""

from __future__ import annotations

import numpy as np

from booster_tpu.gguf.constants import GGMLType


def _fp32_to_fp16_bytes(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float16).view(np.uint8)


def quantize_q4_0_imatrix(x: np.ndarray, qweights: np.ndarray) -> bytes:
    """[N, K] f32 + per-column importance [K] → Q4_0 blocks, matching
    quantize_q4_0(src, dst, nrow, n_per_row, quant_weights) bit-for-bit."""
    QK = 32
    N, K = x.shape
    assert K % QK == 0
    nb = K // QK
    x = x.astype(np.float32)
    qw_row = np.broadcast_to(qweights.astype(np.float32), (N, K))

    sigma2 = (x * x).sum(axis=1, keepdims=True) / K  # [N, 1]
    xb = x.reshape(N, nb, QK)
    w = (qw_row.reshape(N, nb, QK)
         * np.sqrt(sigma2[:, :, None] + xb * xb))  # [N, nb, QK]

    flat_x = xb.reshape(-1, QK)
    flat_w = w.reshape(-1, QK)
    B = flat_x.shape[0]

    amax_idx = np.argmax(np.abs(flat_x), axis=1)
    maxv = flat_x[np.arange(B), amax_idx]  # signed max-|x| element
    amax = np.abs(maxv)
    dead = amax < 1e-15  # GROUP_MAX_EPS

    def levels(iscale):  # [B, QK] ints in [-8, 7]
        l = np.rint(iscale[:, None] * flat_x)  # nearest_int = round-half-even
        return np.clip(l, -8, 7)

    safe_max = np.where(dead, 1.0, maxv)
    iscale0 = -8.0 / safe_max
    L = levels(iscale0)
    sumlx = (flat_w * flat_x * L).sum(axis=1)
    suml2 = (flat_w * L * L).sum(axis=1)
    scale = np.where(suml2 != 0, sumlx / np.where(suml2 == 0, 1, suml2), 0.0)
    best = scale * sumlx
    for step in range(-9, 10):
        if step == 0:
            continue
        isc = -(8.0 + 0.1 * step) / safe_max
        Lc = levels(isc)
        slx = (flat_w * flat_x * Lc).sum(axis=1)
        sl2 = (flat_w * Lc * Lc).sum(axis=1)
        better = (sl2 > 0) & (slx * slx > best * sl2)
        L = np.where(better[:, None], Lc, L)
        scale = np.where(better, slx / np.where(sl2 == 0, 1, sl2), scale)
        best = np.where(better, scale * slx, best)

    L = np.where(dead[:, None], 0.0, L).astype(np.int32) + 8  # 0..15
    d = np.where(dead, 0.0, scale).astype(np.float32)

    out = np.zeros((B, 2 + 16), np.uint8)
    out[:, :2] = _fp32_to_fp16_bytes(d).reshape(B, 2)
    out[:, 2:] = (L[:, :16] | (L[:, 16:] << 4)).astype(np.uint8)
    return out.tobytes()


def quantize_imatrix(x: np.ndarray, ggml_type: GGMLType,
                     qweights: np.ndarray) -> bytes:
    """imatrix-aware quantization; falls back to the unweighted encoder for
    formats without a weighted implementation yet."""
    if ggml_type == GGMLType.Q4_0:
        return quantize_q4_0_imatrix(x, qweights)
    from booster_tpu.quant.formats import quantize

    return quantize(x, ggml_type)


def collect_imatrix(model, token_ids, n_ctx: int = 512,
                    progress=None) -> dict[str, np.ndarray]:
    """Per-column mean squared input activations for every linear, keyed by
    GGUF tensor name (llama-family decoders)."""
    import jax
    import jax.numpy as jnp

    from booster_tpu.models.config import ModelConfig
    from booster_tpu.models.llama import _act, _norm, rms_norm
    from booster_tpu.ops.attention import attention, build_mask
    from booster_tpu.ops.kv_cache import KVCache, update_layer
    from booster_tpu.ops.linear import qlinear
    from booster_tpu.ops.rope import apply_rope_tables, rope_tables

    cfg: ModelConfig = model.cfg
    params = model.params
    if "layers" not in params:
        raise ValueError("imatrix collection supports homogeneous-layer models")
    sums: dict[str, np.ndarray] = {}
    counts: dict[str, int] = {}

    def record(name: str, act: jnp.ndarray):
        a = np.asarray(act.astype(jnp.float32)).reshape(-1, act.shape[-1])
        s = (a * a).sum(axis=0)
        if name in sums:
            sums[name] += s
            counts[name] += a.shape[0]
        else:
            sums[name] = s
            counts[name] = a.shape[0]

    ids = np.asarray(token_ids, np.int32)
    n_chunks = max(len(ids) // n_ctx, 1)
    layers = params["layers"]

    def layer_slice(i):
        return jax.tree.map(lambda a: a[i], layers)

    for c in range(n_chunks):
        chunk = ids[c * n_ctx : (c + 1) * n_ctx][None, :]
        T = chunk.shape[1]
        cache = KVCache.create(cfg.n_layers, 1, T, cfg.n_kv_heads,
                               cfg.head_dim, head_dim_v=cfg.head_dim_v)
        x = params["tok_embd"][jnp.asarray(chunk)].astype(jnp.bfloat16)
        positions = jnp.arange(T, dtype=jnp.int32)[None, :]
        rope_cos, rope_sin = rope_tables(
            positions, params["rope"]["inv_freq"], params["rope"]["mscale"]
        )
        kv_valid = jnp.full(1, T, jnp.int32)
        mask = build_mask(positions, kv_valid, T)
        B = 1
        H, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
        for i in range(cfg.n_layers):
            lp = layer_slice(i)
            h = _norm(x, lp, "attn_norm", cfg)
            if "wqkv" in lp:
                record(f"blk.{i}.attn_qkv.weight", h)
                qkv = qlinear(h, lp["wqkv"])
                dq, dkv = H * D, Hkv * D
                q = qkv[..., :dq].reshape(B, T, H, D)
                k = qkv[..., dq:dq + dkv].reshape(B, T, Hkv, D)
                v = qkv[..., dq + dkv:].reshape(B, T, Hkv, D)
            else:
                for nm in ("attn_q", "attn_k", "attn_v"):
                    record(f"blk.{i}.{nm}.weight", h)
                q = qlinear(h, lp["wq"], lp.get("bq")).reshape(B, T, H, D)
                k = qlinear(h, lp["wk"], lp.get("bk")).reshape(B, T, Hkv, D)
                v = qlinear(h, lp["wv"], lp.get("bv")).reshape(B, T, Hkv, D)
            q = apply_rope_tables(q, rope_cos, rope_sin, cfg.rope_style)
            k = apply_rope_tables(k, rope_cos, rope_sin, cfg.rope_style)
            k_sl, v_sl, _, _ = update_layer(
                cache.k[i], cache.v[i], k, v, cache.lengths
            )
            k_sl = k_sl[..., :D]  # storage is lane-padded (pad_head_dim)
            v_sl = v_sl[..., :(cfg.head_dim_v or D)]
            scale = cfg.attn_scale if cfg.attn_scale > 0 else 1.0 / (D ** 0.5)
            attn = attention(q, k_sl.astype(x.dtype), v_sl.astype(x.dtype),
                             positions, kv_valid, scale, mask=mask)
            attn = attn.reshape(B, T, -1)
            record(f"blk.{i}.attn_output.weight", attn)
            x = x + qlinear(attn, lp["wo"], lp.get("bo"))
            h = _norm(x, lp, "ffn_norm", cfg)
            if "w_gateup" in lp:
                record(f"blk.{i}.ffn_up.weight", h)
                gu = qlinear(h, lp["w_gateup"])
                ff = gu.shape[-1] // 2
                inner = _act(gu[..., :ff], cfg.act) * gu[..., ff:]
            else:
                record(f"blk.{i}.ffn_gate.weight", h)
                record(f"blk.{i}.ffn_up.weight", h)
                inner = _act(qlinear(h, lp["w_gate"]), cfg.act) * qlinear(
                    h, lp["w_up"])
            record(f"blk.{i}.ffn_down.weight", inner)
            x = x + qlinear(inner, lp["w_down"], lp.get("b_down"))
        if progress:
            progress(c + 1, n_chunks)

    return {k: (sums[k] / max(counts[k], 1)).astype(np.float32) for k in sums}


def save_imatrix(path: str, imatrix: dict[str, np.ndarray]) -> None:
    np.savez_compressed(path, **imatrix)


def load_imatrix(path: str) -> dict[str, np.ndarray]:
    data = np.load(path)
    return {k: data[k] for k in data.files}
