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
    # "norm"-rope archs whose HF checkpoints use half-split rope layout
    # (chatglm is also "norm" rope but HF GLM is already interleaved)
    permute = arch in ("llama", "mistral", "mixtral", "xverse")

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
            if sub == "block_sparse_moe.gate.weight" or sub == "mlp.gate.weight":
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
            if sub.startswith("mlp.experts."):  # qwen2moe naming
                _, _, tail = sub.partition("experts.")
                e_idx, _, wname = tail.partition(".")
                which = {"gate_proj.weight": "ffn_gate_exps",
                         "up_proj.weight": "ffn_up_exps",
                         "down_proj.weight": "ffn_down_exps"}.get(wname)
                if which:
                    experts.setdefault((int(idx), which), {})[int(e_idx)] = w
                continue
            if sub.startswith("mlp.shared_expert."):
                tail = sub[len("mlp.shared_expert."):]
                which = {"gate_proj.weight": "ffn_gate_shexp.weight",
                         "up_proj.weight": "ffn_up_shexp.weight",
                         "down_proj.weight": "ffn_down_shexp.weight"}.get(tail)
                if which:
                    out[f"blk.{idx}.{which}"] = w
                continue
            if sub == "mlp.shared_expert_gate.weight":
                out[f"blk.{idx}.ffn_gate_inp_shexp.weight"] = w
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


def _deinterleave_qkv(w: np.ndarray, n_heads: int, n_kv: int,
                      head_dim: int, layout: str) -> np.ndarray:
    """Reorder a fused qkv projection into sequential [q rows, k rows, v rows].

    layouts: "seq" (already sequential), "per_head" (gpt-neox / old falcon:
    [n_heads, 3, head_dim]), "grouped" (falcon new-decoder: [n_kv,
    q_per_kv + 2, head_dim])."""
    rest = w.shape[1:]
    if layout == "seq":
        return w
    if layout == "per_head":
        w3 = w.reshape(n_heads, 3, head_dim, *rest)
        q = w3[:, 0].reshape(n_heads * head_dim, *rest)
        k = w3[:, 1].reshape(n_heads * head_dim, *rest)
        v = w3[:, 2].reshape(n_heads * head_dim, *rest)
        return np.concatenate([q, k, v], axis=0)
    if layout == "grouped":
        per = n_heads // n_kv
        w3 = w.reshape(n_kv, per + 2, head_dim, *rest)
        q = w3[:, :per].reshape(n_heads * head_dim, *rest)
        k = w3[:, per].reshape(n_kv * head_dim, *rest)
        v = w3[:, per + 1].reshape(n_kv * head_dim, *rest)
        return np.concatenate([q, k, v], axis=0)
    raise ValueError(layout)


# per-arch converters: HF module path suffix → gguf tensor name.  `T`
# marks Conv1D weights stored [in, out] (gpt2) that need transposing.
_SIMPLE_MAPS = {
    "gpt2": {
        "prefix": "transformer.",
        "embd": "wte.weight", "pos": "wpe.weight",
        "final_norm": ("ln_f.weight", "ln_f.bias"),
        "transpose_2d": True,
        "layers": "h.",
        "map": {
            "ln_1.weight": "attn_norm.weight", "ln_1.bias": "attn_norm.bias",
            "attn.c_attn.weight": "attn_qkv.weight",
            "attn.c_attn.bias": "attn_qkv.bias",
            "attn.c_proj.weight": "attn_output.weight",
            "attn.c_proj.bias": "attn_output.bias",
            "ln_2.weight": "ffn_norm.weight", "ln_2.bias": "ffn_norm.bias",
            "mlp.c_fc.weight": "ffn_up.weight", "mlp.c_fc.bias": "ffn_up.bias",
            "mlp.c_proj.weight": "ffn_down.weight",
            "mlp.c_proj.bias": "ffn_down.bias",
        },
    },
    "starcoder": {  # gpt_bigcode: Linear weights, MQA fused qkv is sequential
        "prefix": "transformer.",
        "embd": "wte.weight", "pos": "wpe.weight",
        "final_norm": ("ln_f.weight", "ln_f.bias"),
        "transpose_2d": False,
        "layers": "h.",
        "map": {
            "ln_1.weight": "attn_norm.weight", "ln_1.bias": "attn_norm.bias",
            "attn.c_attn.weight": "attn_qkv.weight",
            "attn.c_attn.bias": "attn_qkv.bias",
            "attn.c_proj.weight": "attn_output.weight",
            "attn.c_proj.bias": "attn_output.bias",
            "ln_2.weight": "ffn_norm.weight", "ln_2.bias": "ffn_norm.bias",
            "mlp.c_fc.weight": "ffn_up.weight", "mlp.c_fc.bias": "ffn_up.bias",
            "mlp.c_proj.weight": "ffn_down.weight",
            "mlp.c_proj.bias": "ffn_down.bias",
        },
    },
    "falcon": {
        "prefix": "transformer.",
        "embd": "word_embeddings.weight", "pos": None,
        "final_norm": ("ln_f.weight", "ln_f.bias"),
        "transpose_2d": False,
        "layers": "h.",
        "map": {
            "input_layernorm.weight": "attn_norm.weight",
            "input_layernorm.bias": "attn_norm.bias",
            "ln_attn.weight": "attn_norm.weight",
            "ln_attn.bias": "attn_norm.bias",
            "ln_mlp.weight": "ffn_norm.weight",
            "ln_mlp.bias": "ffn_norm.bias",
            "self_attention.query_key_value.weight": "attn_qkv.weight",
            "self_attention.dense.weight": "attn_output.weight",
            "mlp.dense_h_to_4h.weight": "ffn_up.weight",
            "mlp.dense_4h_to_h.weight": "ffn_down.weight",
        },
    },
    "phi2": {
        "prefix": "model.",
        "embd": "embed_tokens.weight", "pos": None,
        "final_norm": ("final_layernorm.weight", "final_layernorm.bias"),
        "transpose_2d": False,
        "layers": "layers.",
        "map": {
            "input_layernorm.weight": "attn_norm.weight",
            "input_layernorm.bias": "attn_norm.bias",
            "self_attn.q_proj.weight": "attn_q.weight",
            "self_attn.q_proj.bias": "attn_q.bias",
            "self_attn.k_proj.weight": "attn_k.weight",
            "self_attn.k_proj.bias": "attn_k.bias",
            "self_attn.v_proj.weight": "attn_v.weight",
            "self_attn.v_proj.bias": "attn_v.bias",
            "self_attn.dense.weight": "attn_output.weight",
            "self_attn.dense.bias": "attn_output.bias",
            "mlp.fc1.weight": "ffn_up.weight", "mlp.fc1.bias": "ffn_up.bias",
            "mlp.fc2.weight": "ffn_down.weight",
            "mlp.fc2.bias": "ffn_down.bias",
        },
    },
    "mpt": {
        "prefix": "transformer.",
        "embd": "wte.weight", "pos": "wpe.weight",
        "final_norm": ("norm_f.weight", "norm_f.bias"),
        "transpose_2d": False,
        "layers": "blocks.",
        "map": {
            "norm_1.weight": "attn_norm.weight",
            "norm_1.bias": "attn_norm.bias",
            "attn.Wqkv.weight": "attn_qkv.weight",
            "attn.Wqkv.bias": "attn_qkv.bias",
            "attn.out_proj.weight": "attn_output.weight",
            "norm_2.weight": "ffn_norm.weight",
            "norm_2.bias": "ffn_norm.bias",
            "ffn.up_proj.weight": "ffn_up.weight",
            "ffn.down_proj.weight": "ffn_down.weight",
        },
    },
    "gptneox": {
        "prefix": "gpt_neox.",
        "embd": "embed_in.weight", "pos": None,
        "final_norm": ("final_layer_norm.weight", "final_layer_norm.bias"),
        "transpose_2d": False,
        "layers": "layers.",
        "map": {
            "input_layernorm.weight": "attn_norm.weight",
            "input_layernorm.bias": "attn_norm.bias",
            "attention.query_key_value.weight": "attn_qkv.weight",
            "attention.query_key_value.bias": "attn_qkv.bias",
            "attention.dense.weight": "attn_output.weight",
            "attention.dense.bias": "attn_output.bias",
            "post_attention_layernorm.weight": "ffn_norm.weight",
            "post_attention_layernorm.bias": "ffn_norm.bias",
            "mlp.dense_h_to_4h.weight": "ffn_up.weight",
            "mlp.dense_h_to_4h.bias": "ffn_up.bias",
            "mlp.dense_4h_to_h.weight": "ffn_down.weight",
            "mlp.dense_4h_to_h.bias": "ffn_down.bias",
        },
    },
    "bloom": {
        "prefix": "transformer.",
        "embd": "word_embeddings.weight", "pos": None,
        "embd_norm": ("word_embeddings_layernorm.weight",
                      "word_embeddings_layernorm.bias"),
        "final_norm": ("ln_f.weight", "ln_f.bias"),
        "transpose_2d": False,
        "layers": "h.",
        "map": {
            "input_layernorm.weight": "attn_norm.weight",
            "input_layernorm.bias": "attn_norm.bias",
            "self_attention.query_key_value.weight": "attn_qkv.weight",
            "self_attention.query_key_value.bias": "attn_qkv.bias",
            "self_attention.dense.weight": "attn_output.weight",
            "self_attention.dense.bias": "attn_output.bias",
            "post_attention_layernorm.weight": "ffn_norm.weight",
            "post_attention_layernorm.bias": "ffn_norm.bias",
            "mlp.dense_h_to_4h.weight": "ffn_up.weight",
            "mlp.dense_h_to_4h.bias": "ffn_up.bias",
            "mlp.dense_4h_to_h.weight": "ffn_down.weight",
            "mlp.dense_4h_to_h.bias": "ffn_down.bias",
        },
    },
    "stablelm": {
        "prefix": "model.",
        "embd": "embed_tokens.weight", "pos": None,
        "final_norm": ("norm.weight", "norm.bias"),
        "transpose_2d": False,
        "layers": "layers.",
        "map": {
            "input_layernorm.weight": "attn_norm.weight",
            "input_layernorm.bias": "attn_norm.bias",
            "self_attn.q_proj.weight": "attn_q.weight",
            "self_attn.q_proj.bias": "attn_q.bias",
            "self_attn.k_proj.weight": "attn_k.weight",
            "self_attn.k_proj.bias": "attn_k.bias",
            "self_attn.v_proj.weight": "attn_v.weight",
            "self_attn.v_proj.bias": "attn_v.bias",
            "self_attn.o_proj.weight": "attn_output.weight",
            "post_attention_layernorm.weight": "ffn_norm.weight",
            "post_attention_layernorm.bias": "ffn_norm.bias",
            "mlp.gate_proj.weight": "ffn_gate.weight",
            "mlp.up_proj.weight": "ffn_up.weight",
            "mlp.down_proj.weight": "ffn_down.weight",
        },
    },
    "starcoder2": {
        "prefix": "model.",
        "embd": "embed_tokens.weight", "pos": None,
        "final_norm": ("norm.weight", "norm.bias"),
        "transpose_2d": False,
        "layers": "layers.",
        "map": {
            "input_layernorm.weight": "attn_norm.weight",
            "input_layernorm.bias": "attn_norm.bias",
            "self_attn.q_proj.weight": "attn_q.weight",
            "self_attn.q_proj.bias": "attn_q.bias",
            "self_attn.k_proj.weight": "attn_k.weight",
            "self_attn.k_proj.bias": "attn_k.bias",
            "self_attn.v_proj.weight": "attn_v.weight",
            "self_attn.v_proj.bias": "attn_v.bias",
            "self_attn.o_proj.weight": "attn_output.weight",
            "self_attn.o_proj.bias": "attn_output.bias",
            "post_attention_layernorm.weight": "ffn_norm.weight",
            "post_attention_layernorm.bias": "ffn_norm.bias",
            "mlp.c_fc.weight": "ffn_up.weight",
            "mlp.c_fc.bias": "ffn_up.bias",
            "mlp.c_proj.weight": "ffn_down.weight",
            "mlp.c_proj.bias": "ffn_down.bias",
        },
    },
    "olmo": {
        "prefix": "model.",
        "embd": "embed_tokens.weight", "pos": None,
        "final_norm": (None, None),  # non-parametric LayerNorm
        "transpose_2d": False,
        "layers": "layers.",
        "map": {
            "self_attn.q_proj.weight": "attn_q.weight",
            "self_attn.k_proj.weight": "attn_k.weight",
            "self_attn.v_proj.weight": "attn_v.weight",
            "self_attn.o_proj.weight": "attn_output.weight",
            "mlp.gate_proj.weight": "ffn_gate.weight",
            "mlp.up_proj.weight": "ffn_up.weight",
            "mlp.down_proj.weight": "ffn_down.weight",
        },
    },
    "command-r": {
        "prefix": "model.",
        "embd": "embed_tokens.weight", "pos": None,
        "final_norm": ("norm.weight", None),
        "transpose_2d": False,
        "layers": "layers.",
        "map": {
            "input_layernorm.weight": "attn_norm.weight",
            "self_attn.q_proj.weight": "attn_q.weight",
            "self_attn.k_proj.weight": "attn_k.weight",
            "self_attn.v_proj.weight": "attn_v.weight",
            "self_attn.o_proj.weight": "attn_output.weight",
            "mlp.gate_proj.weight": "ffn_gate.weight",
            "mlp.up_proj.weight": "ffn_up.weight",
            "mlp.down_proj.weight": "ffn_down.weight",
        },
    },
}


def _convert_simple(state_dict, hf_cfg, arch: str) -> dict[str, np.ndarray]:
    """Name-map conversion for the gpt2/falcon/phi2/mpt/gptneox/command-r
    families, including fused-qkv layout normalization."""
    spec = _SIMPLE_MAPS[arch]
    n_heads = int(hf_cfg.get("num_attention_heads") or hf_cfg.get("n_head")
                  or hf_cfg.get("n_heads"))
    n_embd = int(hf_cfg.get("hidden_size") or hf_cfg.get("n_embd")
                 or hf_cfg.get("d_model"))
    head_dim = n_embd // n_heads
    if arch == "falcon":
        if hf_cfg.get("new_decoder_architecture"):
            n_kv = int(hf_cfg.get("num_kv_heads", n_heads))
            qkv_layout = "grouped"
        elif hf_cfg.get("multi_query", True):
            n_kv, qkv_layout = 1, "seq"
        else:
            n_kv, qkv_layout = n_heads, "per_head"
    elif arch in ("gptneox", "bloom"):
        n_kv, qkv_layout = n_heads, "per_head"
    elif arch == "starcoder":
        n_kv = 1 if hf_cfg.get("multi_query", True) else n_heads
        qkv_layout = "seq"
    else:
        n_kv = int(hf_cfg.get("num_key_value_heads", n_heads))
        qkv_layout = "seq"

    def to_np(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        return np.asarray(t, dtype=np.float32)

    out: dict[str, np.ndarray] = {}
    prefix, layers = spec["prefix"], spec["prefix"] + spec["layers"]
    fw, fb = spec["final_norm"]
    ew, eb = spec.get("embd_norm", (None, None))
    for name, tensor in state_dict.items():
        w = to_np(tensor)
        if name == prefix + spec["embd"]:
            out["token_embd.weight"] = w
        elif spec["pos"] and name == prefix + spec["pos"]:
            out["position_embd.weight"] = w
        elif fw and name == prefix + fw:
            out["output_norm.weight"] = w
        elif fb and name == prefix + fb:
            out["output_norm.bias"] = w
        elif ew and name == prefix + ew:
            out["token_embd_norm.weight"] = w
        elif eb and name == prefix + eb:
            out["token_embd_norm.bias"] = w
        elif name == "lm_head.weight" or name == "embed_out.weight":
            out["output.weight"] = w
        elif name == "lm_head.bias":
            out["output.bias"] = w
        elif name.startswith(layers):
            rest = name[len(layers):]
            idx, _, sub = rest.partition(".")
            gguf_sub = spec["map"].get(sub)
            if gguf_sub is None:
                continue
            if spec["transpose_2d"] and w.ndim == 2:
                w = w.T  # gpt2 Conv1D stores [in, out]
            if gguf_sub.startswith("attn_qkv") and qkv_layout != "seq":
                w = _deinterleave_qkv(w, n_heads, n_kv, head_dim, qkv_layout)
            out[f"blk.{idx}.{gguf_sub}"] = w
    return out


def _convert_bert(state_dict, hf_cfg) -> dict[str, np.ndarray]:
    """HF BertModel → GGUF bert tensor names (llama.cpp:724-740)."""
    def to_np(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        return np.asarray(t, dtype=np.float32)

    m = {
        "embeddings.word_embeddings.weight": "token_embd.weight",
        "embeddings.position_embeddings.weight": "position_embd.weight",
        "embeddings.token_type_embeddings.weight": "token_types.weight",
        "embeddings.LayerNorm.weight": "token_embd_norm.weight",
        "embeddings.LayerNorm.bias": "token_embd_norm.bias",
    }
    lm = {
        "attention.self.query.weight": "attn_q.weight",
        "attention.self.query.bias": "attn_q.bias",
        "attention.self.key.weight": "attn_k.weight",
        "attention.self.key.bias": "attn_k.bias",
        "attention.self.value.weight": "attn_v.weight",
        "attention.self.value.bias": "attn_v.bias",
        "attention.output.dense.weight": "attn_output.weight",
        "attention.output.dense.bias": "attn_output.bias",
        "attention.output.LayerNorm.weight": "attn_output_norm.weight",
        "attention.output.LayerNorm.bias": "attn_output_norm.bias",
        "intermediate.dense.weight": "ffn_up.weight",
        "intermediate.dense.bias": "ffn_up.bias",
        "output.dense.weight": "ffn_down.weight",
        "output.dense.bias": "ffn_down.bias",
        "output.LayerNorm.weight": "layer_output_norm.weight",
        "output.LayerNorm.bias": "layer_output_norm.bias",
    }
    out: dict[str, np.ndarray] = {}
    for name, tensor in state_dict.items():
        name = name.removeprefix("bert.")
        if name in m:
            out[m[name]] = to_np(tensor)
        elif name.startswith("encoder.layer."):
            rest = name[len("encoder.layer."):]
            idx, _, sub = rest.partition(".")
            if sub in lm:
                out[f"blk.{idx}.{lm[sub]}"] = to_np(tensor)
    return out


def _convert_deepseek2(state_dict, hf_cfg) -> dict[str, np.ndarray]:
    """HF DeepseekV2ForCausalLM → GGUF deepseek2 tensor names (MLA +
    shared-expert MoE; no rope permutation — DeepSeek's decoupled rope part
    is interleaved, matching ggml's NORM style directly)."""
    def to_np(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        return np.asarray(t, dtype=np.float32)

    lm = {
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.q_a_proj.weight": "attn_q_a.weight",
        "self_attn.q_a_layernorm.weight": "attn_q_a_norm.weight",
        "self_attn.q_b_proj.weight": "attn_q_b.weight",
        "self_attn.kv_a_proj_with_mqa.weight": "attn_kv_a_mqa.weight",
        "self_attn.kv_a_layernorm.weight": "attn_kv_a_norm.weight",
        "self_attn.kv_b_proj.weight": "attn_kv_b.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "input_layernorm.weight": "attn_norm.weight",
        "post_attention_layernorm.weight": "ffn_norm.weight",
        "mlp.gate_proj.weight": "ffn_gate.weight",
        "mlp.up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
        "mlp.gate.weight": "ffn_gate_inp.weight",
        "mlp.shared_experts.gate_proj.weight": "ffn_gate_shexp.weight",
        "mlp.shared_experts.up_proj.weight": "ffn_up_shexp.weight",
        "mlp.shared_experts.down_proj.weight": "ffn_down_shexp.weight",
    }
    out: dict[str, np.ndarray] = {}
    experts: dict[tuple[int, str], dict[int, np.ndarray]] = {}
    for name, tensor in state_dict.items():
        w = to_np(tensor)
        if name == "model.embed_tokens.weight":
            out["token_embd.weight"] = w
        elif name == "model.norm.weight":
            out["output_norm.weight"] = w
        elif name == "lm_head.weight":
            out["output.weight"] = w
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx, _, sub = rest.partition(".")
            if sub.startswith("mlp.experts."):
                _, _, tail = sub.partition("experts.")
                e_idx, _, wname = tail.partition(".")
                which = {"gate_proj.weight": "ffn_gate_exps",
                         "up_proj.weight": "ffn_up_exps",
                         "down_proj.weight": "ffn_down_exps"}.get(wname)
                if which:
                    experts.setdefault((int(idx), which), {})[int(e_idx)] = w
            elif sub in lm:
                out[f"blk.{idx}.{lm[sub]}"] = w
    for (idx, which), emap in experts.items():
        out[f"blk.{idx}.{which}.weight"] = np.stack(
            [emap[e] for e in sorted(emap)], axis=0)
    return out


def _convert_mamba(state_dict, hf_cfg) -> dict[str, np.ndarray]:
    """HF MambaForCausalLM → GGUF mamba tensor names (ssm_* family)."""
    def to_np(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        return np.asarray(t, dtype=np.float32)

    lm = {
        "norm.weight": "attn_norm.weight",
        "mixer.in_proj.weight": "ssm_in.weight",
        "mixer.conv1d.bias": "ssm_conv1d.bias",
        "mixer.x_proj.weight": "ssm_x.weight",
        "mixer.dt_proj.weight": "ssm_dt.weight",
        "mixer.dt_proj.bias": "ssm_dt.bias",
        "mixer.A_log": "ssm_a",
        "mixer.D": "ssm_d",
        "mixer.out_proj.weight": "ssm_out.weight",
    }
    out: dict[str, np.ndarray] = {}
    for name, tensor in state_dict.items():
        w = to_np(tensor)
        if name == "backbone.embeddings.weight":
            out["token_embd.weight"] = w
        elif name == "backbone.norm_f.weight":
            out["output_norm.weight"] = w
        elif name == "lm_head.weight":
            out["output.weight"] = w
        elif name.startswith("backbone.layers."):
            rest = name[len("backbone.layers."):]
            idx, _, sub = rest.partition(".")
            if sub == "mixer.conv1d.weight":  # [di, 1, k] → [di, k]
                out[f"blk.{idx}.ssm_conv1d.weight"] = w[:, 0, :]
            elif sub in lm:
                out[f"blk.{idx}.{lm[sub]}"] = w
    return out


def _convert_t5_encoder(state_dict, hf_cfg) -> dict[str, np.ndarray]:
    """HF T5EncoderModel → GGUF t5encoder tensor names (enc.* namespace)."""
    def to_np(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        return np.asarray(t, dtype=np.float32)

    lm = {
        "layer.0.SelfAttention.q.weight": "attn_q.weight",
        "layer.0.SelfAttention.k.weight": "attn_k.weight",
        "layer.0.SelfAttention.v.weight": "attn_v.weight",
        "layer.0.SelfAttention.o.weight": "attn_o.weight",
        "layer.0.layer_norm.weight": "attn_norm.weight",
        "layer.1.DenseReluDense.wi.weight": "ffn_up.weight",
        "layer.1.DenseReluDense.wi_0.weight": "ffn_gate.weight",
        "layer.1.DenseReluDense.wi_1.weight": "ffn_up.weight",
        "layer.1.DenseReluDense.wo.weight": "ffn_down.weight",
        "layer.1.layer_norm.weight": "ffn_norm.weight",
    }
    out: dict[str, np.ndarray] = {}
    for name, tensor in state_dict.items():
        w = to_np(tensor)
        if name == "shared.weight" or name == "encoder.embed_tokens.weight":
            out["token_embd.weight"] = w
        elif name == "encoder.final_layer_norm.weight":
            out["enc.output_norm.weight"] = w
        elif name.startswith("encoder.block."):
            rest = name[len("encoder.block."):]
            idx, _, sub = rest.partition(".")
            if sub == "layer.0.SelfAttention.relative_attention_bias.weight":
                if idx == "0":
                    out["enc.blk.0.attn_rel_b.weight"] = w
            elif sub in lm:
                out[f"enc.blk.{idx}.{lm[sub]}"] = w
    return out


def _convert_t5(state_dict, hf_cfg) -> dict[str, np.ndarray]:
    """HF T5ForConditionalGeneration → GGUF t5 names (enc.* + dec.*).

    Decoder blocks (llama.cpp:1236-1252): layer.0 self-attention,
    layer.1 cross-attention (EncDecAttention), layer.2 feed-forward.
    """
    out = _convert_t5_encoder(state_dict, hf_cfg)

    def to_np(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        return np.asarray(t, dtype=np.float32)

    lm = {
        "layer.0.SelfAttention.q.weight": "attn_q.weight",
        "layer.0.SelfAttention.k.weight": "attn_k.weight",
        "layer.0.SelfAttention.v.weight": "attn_v.weight",
        "layer.0.SelfAttention.o.weight": "attn_o.weight",
        "layer.0.layer_norm.weight": "attn_norm.weight",
        "layer.1.EncDecAttention.q.weight": "cross_attn_q.weight",
        "layer.1.EncDecAttention.k.weight": "cross_attn_k.weight",
        "layer.1.EncDecAttention.v.weight": "cross_attn_v.weight",
        "layer.1.EncDecAttention.o.weight": "cross_attn_o.weight",
        "layer.1.layer_norm.weight": "cross_attn_norm.weight",
        "layer.2.DenseReluDense.wi.weight": "ffn_up.weight",
        "layer.2.DenseReluDense.wi_0.weight": "ffn_gate.weight",
        "layer.2.DenseReluDense.wi_1.weight": "ffn_up.weight",
        "layer.2.layer_norm.weight": "ffn_norm.weight",
        "layer.2.DenseReluDense.wo.weight": "ffn_down.weight",
    }
    for name, tensor in state_dict.items():
        if name == "decoder.final_layer_norm.weight":
            out["dec.output_norm.weight"] = to_np(tensor)
        elif name == "lm_head.weight":
            out["output.weight"] = to_np(tensor)
        elif name.startswith("decoder.block."):
            rest = name[len("decoder.block."):]
            idx, _, sub = rest.partition(".")
            if sub == "layer.0.SelfAttention.relative_attention_bias.weight":
                if idx == "0":
                    out["dec.blk.0.attn_rel_b.weight"] = to_np(tensor)
            elif sub in lm:
                out[f"dec.blk.{idx}.{lm[sub]}"] = to_np(tensor)
    return out


_HF_CLASS_ARCH = {
    "LlamaForCausalLM": "llama", "MistralForCausalLM": "llama",
    "Qwen2ForCausalLM": "qwen2", "Qwen2MoeForCausalLM": "qwen2moe",
    "Qwen3ForCausalLM": "qwen3", "Qwen3MoeForCausalLM": "qwen3moe",
    "Gemma2ForCausalLM": "gemma2",
    "MixtralForCausalLM": "mixtral", "Phi3ForCausalLM": "phi3",
    "GPT2LMHeadModel": "gpt2", "GPTBigCodeForCausalLM": "starcoder",
    "FalconForCausalLM": "falcon", "PhiForCausalLM": "phi2",
    "MptForCausalLM": "mpt", "GPTNeoXForCausalLM": "gptneox",
    "CohereForCausalLM": "command-r",
    "BertModel": "bert", "BertForMaskedLM": "bert",
    "BloomForCausalLM": "bloom", "StableLmForCausalLM": "stablelm",
    "Starcoder2ForCausalLM": "starcoder2", "OlmoForCausalLM": "olmo",
    "MambaForCausalLM": "mamba",
    "T5EncoderModel": "t5encoder",
    "T5ForConditionalGeneration": "t5",
    "DeepseekV2ForCausalLM": "deepseek2",
    # GLM-4 family → GGUF "chatglm" (interleaved partial rope, fused
    # gate_up; HF stores rope-interleaved weights, so no permutation)
    "GlmForCausalLM": "chatglm",
}


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
    arch = arch or _HF_CLASS_ARCH.get(hf_archs[0], "llama")

    def cfg_int(*keys, default=None):
        for k in keys:
            if hf_cfg.get(k) is not None:
                return int(hf_cfg[k])
        return default

    n_embd = cfg_int("hidden_size", "n_embd", "d_model")
    n_heads = cfg_int("num_attention_heads", "n_head", "n_heads", default=1)
    n_layers = cfg_int("num_hidden_layers", "n_layer", "n_layers")
    head_dim = cfg_int("head_dim", default=0) or n_embd // max(n_heads, 1)
    n_ff = cfg_int("intermediate_size", "n_inner", default=0)
    if not n_ff:
        n_ff = int(hf_cfg.get("expansion_ratio", 4)) * n_embd
    n_ctx = cfg_int("max_position_embeddings", "n_positions", "max_seq_len",
                    default=4096)

    if arch == "mamba":
        tensors = _convert_mamba(model.state_dict(), hf_cfg)
        n_heads = n_kv = 1
        head_dim = 1
    elif arch == "deepseek2":
        tensors = _convert_deepseek2(model.state_dict(), hf_cfg)
        n_kv = n_heads
        head_dim = (int(hf_cfg["qk_nope_head_dim"])
                    + int(hf_cfg["qk_rope_head_dim"]))
    elif arch in ("t5encoder", "t5"):
        if arch == "t5":
            dec_layers = cfg_int("num_decoder_layers", default=None)
            if dec_layers is not None and dec_layers != cfg_int("num_layers"):
                raise ValueError("t5: num_decoder_layers != num_layers unsupported")
            tensors = _convert_t5(model.state_dict(), hf_cfg)
        else:
            tensors = _convert_t5_encoder(model.state_dict(), hf_cfg)
        n_heads = cfg_int("num_heads", default=n_heads)
        n_kv = n_heads
        head_dim = cfg_int("d_kv", default=head_dim)
        n_layers = cfg_int("num_layers", default=n_layers)
        n_embd = cfg_int("d_model", default=n_embd)
        n_ff = cfg_int("d_ff", default=n_ff)
    elif arch == "bert":
        tensors = _convert_bert(model.state_dict(), hf_cfg)
        n_kv = n_heads
    elif arch in _SIMPLE_MAPS:
        tensors = _convert_simple(model.state_dict(), hf_cfg, arch)
        if arch == "falcon":
            if hf_cfg.get("new_decoder_architecture"):
                n_kv = cfg_int("num_kv_heads", default=n_heads)
            elif hf_cfg.get("multi_query", True):
                n_kv = 1
            else:
                n_kv = n_heads
        elif arch == "starcoder":
            n_kv = 1 if hf_cfg.get("multi_query", True) else n_heads
        elif arch in ("gpt2", "mpt", "gptneox", "bloom"):
            n_kv = n_heads
        else:
            n_kv = cfg_int("num_key_value_heads", default=n_heads)
    else:
        tensors = convert_state_dict(model.state_dict(), hf_cfg, arch=arch)
        n_kv = cfg_int("num_key_value_heads", default=n_heads)
    if hf_cfg.get("tie_word_embeddings"):
        tensors.pop("output.weight", None)  # tied: lm head reuses token_embd

    w = GGUFWriter()
    w.add("general.architecture", arch)
    w.add("general.name", str(hf_cfg.get("_name_or_path", "converted")))
    w.add(f"{arch}.block_count", n_layers)
    w.add(f"{arch}.context_length", n_ctx)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_heads)
    w.add(f"{arch}.attention.head_count_kv", n_kv)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(
        hf_cfg.get("rms_norm_eps") or hf_cfg.get("layer_norm_epsilon") or 1e-5))
    w.add(f"{arch}.attention.layer_norm_epsilon", float(
        hf_cfg.get("layer_norm_epsilon") or hf_cfg.get("layer_norm_eps")
        or hf_cfg.get("layernorm_epsilon") or 1e-5))
    w.add(f"{arch}.rope.freq_base", float(
        hf_cfg.get("rope_theta") or hf_cfg.get("rotary_emb_base") or 10000.0))
    w.add(f"{arch}.attention.key_length", head_dim)
    w.add(f"{arch}.attention.value_length", head_dim)
    rope_dims = head_dim
    if arch == "deepseek2":  # decoupled rope part only
        rope_dims = int(hf_cfg["qk_rope_head_dim"])
    elif hf_cfg.get("partial_rotary_factor"):  # phi2
        rope_dims = int(float(hf_cfg["partial_rotary_factor"]) * head_dim)
    elif hf_cfg.get("rotary_pct"):  # gpt-neox
        rope_dims = int(float(hf_cfg["rotary_pct"]) * head_dim)
    w.add(f"{arch}.rope.dimension_count", rope_dims)
    w.add(f"{arch}.vocab_size", int(hf_cfg["vocab_size"]))
    if hf_cfg.get("sliding_window"):
        w.add(f"{arch}.attention.sliding_window", int(hf_cfg["sliding_window"]))
    if arch == "gemma2":
        w.add(f"{arch}.attn_logit_softcapping", float(hf_cfg.get("attn_logit_softcapping", 50.0)))
        w.add(f"{arch}.final_logit_softcapping", float(hf_cfg.get("final_logit_softcapping", 30.0)))
    if arch == "command-r" and hf_cfg.get("logit_scale"):
        w.add(f"{arch}.logit_scale", float(hf_cfg["logit_scale"]))
    if arch == "gptneox":
        w.add(f"{arch}.use_parallel_residual",
              bool(hf_cfg.get("use_parallel_residual", True)))
    if arch == "mpt":
        attn_cfg = hf_cfg.get("attn_config") or {}
        if attn_cfg.get("alibi", True):
            w.add(f"{arch}.attention.max_alibi_bias",
                  float(attn_cfg.get("alibi_bias_max", 8.0)))
        if attn_cfg.get("clip_qkv"):
            w.add(f"{arch}.attention.clamp_kqv", float(attn_cfg["clip_qkv"]))
    if arch == "bloom":
        w.add(f"{arch}.attention.max_alibi_bias", 8.0)
    if arch == "olmo" and hf_cfg.get("clip_qkv"):
        w.add(f"{arch}.attention.clamp_kqv", float(hf_cfg["clip_qkv"]))
    if arch in ("t5encoder", "t5"):
        w.add(f"{arch}.attention.relative_buckets_count",
              int(hf_cfg.get("relative_attention_num_buckets", 32)))
        w.add(f"{arch}.attention.relative_max_distance",
              int(hf_cfg.get("relative_attention_max_distance", 128)))
        if arch == "t5":
            w.add(f"{arch}.decoder_start_token_id",
                  int(hf_cfg.get("decoder_start_token_id") or 0))
    if arch == "deepseek2":
        w.add(f"{arch}.attention.kv_lora_rank", int(hf_cfg["kv_lora_rank"]))
        if hf_cfg.get("q_lora_rank"):
            w.add(f"{arch}.attention.q_lora_rank", int(hf_cfg["q_lora_rank"]))
        w.add(f"{arch}.attention.value_length", int(hf_cfg["v_head_dim"]))
        w.add(f"{arch}.leading_dense_block_count",
              int(hf_cfg.get("first_k_dense_replace", 0)))
        w.add(f"{arch}.expert_shared_count",
              int(hf_cfg.get("n_shared_experts") or 0))
        w.add(f"{arch}.expert_weights_scale",
              float(hf_cfg.get("routed_scaling_factor", 1.0)))
        if hf_cfg.get("topk_method") == "group_limited_greedy":
            w.add(f"{arch}.expert_group_count", int(hf_cfg.get("n_group", 1)))
            w.add(f"{arch}.expert_group_used_count",
                  int(hf_cfg.get("topk_group", 1)))
        if hf_cfg.get("n_routed_experts"):
            w.add(f"{arch}.expert_count", int(hf_cfg["n_routed_experts"]))
            w.add(f"{arch}.expert_used_count",
                  int(hf_cfg.get("num_experts_per_tok") or 2))
            w.add(f"{arch}.expert_feed_forward_length",
                  int(hf_cfg.get("moe_intermediate_size") or 0))
    if arch == "mamba":
        import math

        w.add(f"{arch}.ssm.inner_size", int(hf_cfg.get(
            "intermediate_size") or 2 * n_embd))
        w.add(f"{arch}.ssm.state_size", int(hf_cfg.get("state_size", 16)))
        w.add(f"{arch}.ssm.conv_kernel", int(hf_cfg.get("conv_kernel", 4)))
        dt_rank = hf_cfg.get("time_step_rank")
        if not isinstance(dt_rank, int):
            dt_rank = math.ceil(n_embd / 16)
        w.add(f"{arch}.ssm.time_step_rank", int(dt_rank))
    if hf_cfg.get("num_local_experts"):
        w.add(f"{arch}.expert_count", int(hf_cfg["num_local_experts"]))
        w.add(f"{arch}.expert_used_count", int(hf_cfg.get("num_experts_per_tok", 2)))
    if arch in ("qwen2moe", "qwen3moe"):
        w.add(f"{arch}.expert_count", int(hf_cfg["num_experts"]))
        w.add(f"{arch}.expert_used_count", int(hf_cfg.get("num_experts_per_tok", 4)))
        w.add(f"{arch}.expert_feed_forward_length",
              int(hf_cfg.get("moe_intermediate_size") or 0))
        w.add(f"{arch}.expert_weights_norm", bool(hf_cfg.get("norm_topk_prob", False)))
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
