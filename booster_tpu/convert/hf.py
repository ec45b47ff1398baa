"""Convert HuggingFace transformer checkpoints to GGUF.

The permutation of q/k projections for llama-family models follows the GGUF
convention: checkpoints are stored pre-permuted so that ggml's "norm" rope
(rotate adjacent dim pairs) is equivalent to HF's half-split rotation.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import numpy as np

from booster_tpu.gguf import GGMLType, GGUFWriter
from booster_tpu.quant import quantize

_HF_LAYER_MAP = {
    "self_attn.qkv_proj.weight": "attn_qkv.weight",  # phi3 fused
    "mlp.gate_up_proj.weight": "ffn_up.weight",  # phi3 fused (loader splits)
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.bias": "attn_v.bias",
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    "input_layernorm.weight": "attn_norm.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "pre_feedforward_layernorm.weight": "ffn_norm.weight",  # gemma2
    "post_feedforward_layernorm.weight": "post_ffw_norm.weight",  # gemma2
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}

# gemma2's post_attention_layernorm is actually the *post* norm; its pre-attn
# norm is input_layernorm and pre-ffn norm is pre_feedforward_layernorm.
_HF_LAYER_MAP_GEMMA2 = dict(_HF_LAYER_MAP)
_HF_LAYER_MAP_GEMMA2["post_attention_layernorm.weight"] = "post_attention_norm.weight"


def permute_rope(w: np.ndarray, n_heads: int) -> np.ndarray:
    """HF half-split rope layout → GGUF interleaved ("norm") layout."""
    out_f = w.shape[0]
    head_dim = out_f // n_heads
    rest = w.shape[1:]
    return (
        w.reshape(n_heads, 2, head_dim // 2, *rest)
        .swapaxes(1, 2)
        .reshape(out_f, *rest)
    )


def convert_state_dict(
    state_dict: Mapping[str, Any],
    config: Mapping[str, Any],
    arch: str = "llama",
) -> dict[str, np.ndarray]:
    """HF state dict → {gguf_name: float32 array} with rope permutation."""
    n_heads = int(config["num_attention_heads"])
    n_kv = int(config.get("num_key_value_heads", n_heads))
    permute = arch in ("llama", "mistral", "mixtral")  # "norm"-rope archs

    def to_np(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        return np.asarray(t, dtype=np.float32)

    out: dict[str, np.ndarray] = {}
    experts: dict[tuple[int, str], dict[int, np.ndarray]] = {}
    layer_map = _HF_LAYER_MAP_GEMMA2 if arch == "gemma2" else _HF_LAYER_MAP
    for name, tensor in state_dict.items():
        w = to_np(tensor)
        if name == "model.embed_tokens.weight":
            out["token_embd.weight"] = w
        elif name == "model.norm.weight":
            out["output_norm.weight"] = w
        elif name == "lm_head.weight":
            out["output.weight"] = w
        elif name.startswith("model.layers."):
            rest = name[len("model.layers.") :]
            idx, _, sub = rest.partition(".")
            if sub == "block_sparse_moe.gate.weight":
                out[f"blk.{idx}.ffn_gate_inp.weight"] = w
                continue
            if sub.startswith("block_sparse_moe.experts."):
                # experts.N.w1 (gate) / w2 (down) / w3 (up)
                _, _, tail = sub.partition("experts.")
                e_idx, _, wname = tail.partition(".")
                which = {"w1.weight": "ffn_gate_exps", "w2.weight": "ffn_down_exps",
                         "w3.weight": "ffn_up_exps"}.get(wname)
                if which:
                    experts.setdefault((int(idx), which), {})[int(e_idx)] = w
                continue
            gguf_sub = layer_map.get(sub)
            if gguf_sub is None:
                continue
            if permute and sub.startswith("self_attn.q_proj"):
                w = permute_rope(w, n_heads)
            elif permute and sub.startswith("self_attn.k_proj"):
                w = permute_rope(w, n_kv)
            out[f"blk.{idx}.{gguf_sub}"] = w
    for (idx, which), emap in experts.items():
        stacked = np.stack([emap[e] for e in sorted(emap)], axis=0)  # [E, out, in]
        out[f"blk.{idx}.{which}.weight"] = stacked
    return out


def convert_hf_model(
    model,
    tokenizer_vocab: Optional[dict] = None,
    out_path: str = "model.gguf",
    quant_type: GGMLType = GGMLType.F32,
    arch: Optional[str] = None,
) -> str:
    """Convert an in-memory transformers model to a GGUF file.

    `tokenizer_vocab`: optional dict with tokenizer.ggml.* keys to embed.
    2-D non-norm weights are quantized to `quant_type`; 1-D stay F32.
    """
    hf_cfg = model.config.to_dict()
    hf_archs = hf_cfg.get("architectures") or [type(model).__name__]
    arch = arch or {"LlamaForCausalLM": "llama", "MistralForCausalLM": "llama",
                    "Qwen2ForCausalLM": "qwen2", "Gemma2ForCausalLM": "gemma2",
                    "MixtralForCausalLM": "mixtral", "Phi3ForCausalLM": "phi3",
                    }.get(hf_archs[0], "llama")
    tensors = convert_state_dict(model.state_dict(), hf_cfg, arch=arch)
    if hf_cfg.get("tie_word_embeddings"):
        tensors.pop("output.weight", None)  # tied: lm head reuses token_embd

    w = GGUFWriter()
    w.add("general.architecture", arch)
    w.add("general.name", str(hf_cfg.get("_name_or_path", "converted")))
    n_embd = int(hf_cfg["hidden_size"])
    n_heads = int(hf_cfg["num_attention_heads"])
    w.add(f"{arch}.block_count", int(hf_cfg["num_hidden_layers"]))
    w.add(f"{arch}.context_length", int(hf_cfg.get("max_position_embeddings", 4096)))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", int(hf_cfg["intermediate_size"]))
    w.add(f"{arch}.attention.head_count", n_heads)
    w.add(f"{arch}.attention.head_count_kv", int(hf_cfg.get("num_key_value_heads", n_heads)))
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(hf_cfg.get("rms_norm_eps", 1e-5)))
    w.add(f"{arch}.rope.freq_base", float(hf_cfg.get("rope_theta", 10000.0)))
    head_dim = int(hf_cfg.get("head_dim") or n_embd // n_heads)
    w.add(f"{arch}.attention.key_length", head_dim)
    w.add(f"{arch}.attention.value_length", head_dim)
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.vocab_size", int(hf_cfg["vocab_size"]))
    if hf_cfg.get("sliding_window"):
        w.add(f"{arch}.attention.sliding_window", int(hf_cfg["sliding_window"]))
    if arch == "gemma2":
        w.add(f"{arch}.attn_logit_softcapping", float(hf_cfg.get("attn_logit_softcapping", 50.0)))
        w.add(f"{arch}.final_logit_softcapping", float(hf_cfg.get("final_logit_softcapping", 30.0)))
    if hf_cfg.get("num_local_experts"):
        w.add(f"{arch}.expert_count", int(hf_cfg["num_local_experts"]))
        w.add(f"{arch}.expert_used_count", int(hf_cfg.get("num_experts_per_tok", 2)))
    for key, val in (tokenizer_vocab or {}).items():
        w.add(key, val)

    from booster_tpu.gguf.constants import TYPE_TRAITS

    for name, arr in tensors.items():
        is_matrix = arr.ndim >= 2 and "norm" not in name
        tt = quant_type if is_matrix else GGMLType.F32
        if tt != GGMLType.F32 and arr.shape[-1] % TYPE_TRAITS[tt].block_size != 0:
            tt = GGMLType.F32  # fallback for non-block-aligned rows
        data = quantize(arr, tt)
        w.add_tensor(name, data, arr.shape, tt)
    w.write(out_path)
    return out_path
