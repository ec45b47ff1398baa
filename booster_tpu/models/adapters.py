"""LoRA adapters and control vectors.

Reference API parity: llama_lora_adapter_init/apply and
llama_control_vector_apply (/root/reference/cpp/include/llama.h:416-553);
the graph applies LoRA as W·x + scale·B·(A·x) (`llm_build_lora_mm`,
/root/reference/cpp/src/llama.cpp) and adds per-layer direction vectors to
the residual stream (`llm_build_cvec`).

Here adapters are *merged into the residual path at load*: LoRA pairs become
per-layer low-rank params consumed by the forward (runtime low-rank matmuls
— exact, switchable per engine), control vectors become a stacked [L, C]
tensor added after each layer.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from booster_tpu.gguf import GGUFReader
from booster_tpu.quant import dequantize

# GGUF lora tensor suffix → the layer param the pair adapts
_LORA_TARGETS = {
    "attn_q.weight": "wq",
    "attn_k.weight": "wk",
    "attn_v.weight": "wv",
    "attn_output.weight": "wo",
    "ffn_gate.weight": "w_gate",
    "ffn_up.weight": "w_up",
    "ffn_down.weight": "w_down",
}


def load_lora(path: str) -> dict:
    """Read a llama.cpp-style LoRA GGUF: {target: (A [L,r,in], B [L,out,r])},
    plus the adapter's alpha/rank scale."""
    with GGUFReader(path) as r:
        alpha = float(r.field("adapter.lora.alpha", 16.0) or 16.0)
        pairs: dict[tuple[int, str], dict[str, np.ndarray]] = {}
        n_layers = 0
        for info in r:
            name = info.name
            if not name.startswith("blk."):
                continue
            for suffix, target in _LORA_TARGETS.items():
                for side in ("a", "b"):
                    tail = f"{suffix}.lora_{side}"
                    if name.endswith(tail):
                        idx = int(name.split(".")[1])
                        n_layers = max(n_layers, idx + 1)
                        w = dequantize(r.tensor_bytes(info), info.ggml_type,
                                       shape=info.shape)
                        pairs.setdefault((idx, target), {})[side] = w
        if not pairs:
            raise ValueError(f"{path}: no LoRA tensors found")
        rank = next(iter(pairs.values()))["a"].shape[0]
        out: dict[str, dict[str, np.ndarray]] = {}
        for target in {t for (_, t) in pairs}:
            a_stack, b_stack = [], []
            for layer in range(n_layers):
                pair = pairs.get((layer, target))
                if pair is None:  # adapter skips this layer: zero delta
                    a_ref = next(p for (i, t), p in pairs.items() if t == target)
                    a_stack.append(np.zeros_like(a_ref["a"]))
                    b_stack.append(np.zeros_like(a_ref["b"]))
                else:
                    a_stack.append(pair["a"])
                    b_stack.append(pair["b"])
            out[target] = {
                "a": np.stack(a_stack),  # [L, r, in]
                "b": np.stack(b_stack),  # [L, out, r]
            }
        return {"targets": out, "scale": alpha / rank, "rank": rank}


def apply_lora(params: dict, lora: dict, scale: Optional[float] = None,
               cfg=None) -> dict:
    """Attach LoRA low-rank params to the model pytree (runtime application:
    qlinear output += scale * (x @ A^T) @ B^T, exact).

    Pass the model's cfg when it has rope_deinterleaved=True: the adapter's
    wq/wk B rows (out features in q/k space) are permuted to match the
    loader's de-interleaved base weights."""
    import jax.numpy as jnp

    s = float(scale if scale is not None else lora["scale"])
    layers = dict(params["layers"])
    if "wqkv" in layers or "w_gateup" in layers:
        raise ValueError(
            "LoRA targets per-projection weights: load the model with "
            "load_model(..., fuse=False)"
        )
    for target, ab in lora["targets"].items():
        b = ab["b"]
        if (cfg is not None and getattr(cfg, "rope_deinterleaved", False)
                and target in ("wq", "wk")):
            from booster_tpu.models.loader import deinterleave_perm

            heads = cfg.n_heads if target == "wq" else cfg.n_kv_heads
            perm = deinterleave_perm(heads, cfg.head_dim, cfg.rope_dims)
            b = b[:, perm]  # [L, out, r]: permute out rows per layer
        layers[f"lora_a_{target}"] = jnp.asarray(ab["a"], jnp.bfloat16)
        layers[f"lora_b_{target}"] = jnp.asarray(b * s, jnp.bfloat16)
    out = dict(params)
    out["layers"] = layers
    return out


def load_control_vector(path: str, scale: float = 1.0, n_layers: int = 0) -> np.ndarray:
    """Read a control-vector GGUF ('direction.N' tensors) → [L, C] f32."""
    with GGUFReader(path) as r:
        dirs: dict[int, np.ndarray] = {}
        dim = 0
        for info in r:
            if info.name.startswith("direction."):
                idx = int(info.name.split(".")[1])
                v = dequantize(r.tensor_bytes(info), info.ggml_type, shape=info.shape)
                dirs[idx] = v.reshape(-1)
                dim = dirs[idx].shape[0]
        if not dirs:
            raise ValueError(f"{path}: no direction tensors")
        # control-vector GGUFs are 1-indexed per llama.cpp convention
        max_idx = max(dirs)
        L = n_layers or max_idx
        out = np.zeros((L, dim), np.float32)
        for idx, v in dirs.items():
            layer = idx - 1 if min(dirs) >= 1 else idx
            if 0 <= layer < L:
                out[layer] = v * scale
        return out


def apply_control_vector(params: dict, cvec: np.ndarray) -> dict:
    import jax.numpy as jnp

    layers = dict(params["layers"])
    layers["cvec"] = jnp.asarray(cvec, jnp.float32)
    out = dict(params)
    out["layers"] = layers
    return out
