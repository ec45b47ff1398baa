"""ModelConfig: architecture hyperparameters parsed from GGUF metadata.

Key set mirrors the reference's llm_load_hparams
(/root/reference/cpp/src/llama.cpp:4912-) for the supported decoder families.
The config is a *static* (hashable) object so it can be a jit static arg.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping, Optional

from booster_tpu.ops.rope import ROPE_NEOX, ROPE_NONE, ROPE_NORM  # re-export

# per-architecture rope style (llama.cpp llama_rope_type :18549)
_ARCH_ROPE = {
    "llama": ROPE_NORM,
    "mistral": ROPE_NORM,  # (converted as llama arch in practice)
    "deci": ROPE_NORM,
    "baichuan": ROPE_NORM,
    "starcoder2": ROPE_NEOX,
    "qwen": ROPE_NEOX,
    "qwen2": ROPE_NEOX,
    "qwen2moe": ROPE_NEOX,
    "qwen3": ROPE_NEOX,
    "qwen3moe": ROPE_NEOX,
    "phi2": ROPE_NEOX,
    "phi3": ROPE_NEOX,
    "gemma": ROPE_NEOX,
    "gemma2": ROPE_NEOX,
    "stablelm": ROPE_NEOX,
    "gptneox": ROPE_NEOX,
    "olmo": ROPE_NEOX,
    "minicpm": ROPE_NORM,
    "command-r": ROPE_NEOX,
    "internlm2": ROPE_NORM,
    "mixtral": ROPE_NORM,
    # NONE-rope families (llama.cpp llama_rope_type :17030)
    "gpt2": ROPE_NONE,
    "mpt": ROPE_NONE,
    "bloom": ROPE_NONE,
    "jais": ROPE_NONE,
    "mamba": ROPE_NONE,
    "t5": ROPE_NONE,
    "refact": ROPE_NONE,
    # NORM-rope families (:17043)
    "starcoder": ROPE_NORM,
    "orion": ROPE_NORM,
    "deepseek2": ROPE_NORM,
    "xverse": ROPE_NORM,
    "plamo": ROPE_NORM,
    "arctic": ROPE_NORM,
    "chatglm": ROPE_NORM,
    # NEOX additions (:17059)
    "falcon": ROPE_NEOX,
    "dbrx": ROPE_NEOX,
    "bert": ROPE_NEOX,
    "nomic-bert": ROPE_NEOX,
    "jina-bert-v2": ROPE_NONE,  # ALiBi
    "codeshell": ROPE_NEOX,
    "grok": ROPE_NEOX,
    "bitnet": ROPE_NEOX,
    "openelm": ROPE_NEOX,
}


@dataclass(frozen=True)
class ModelConfig:
    arch: str
    n_layers: int
    n_embd: int
    n_heads: int
    n_kv_heads: int
    n_ff: int
    n_vocab: int
    n_ctx_train: int
    head_dim: int
    rms_eps: float = 1e-5
    rope_base: float = 10000.0
    rope_dim: int = 0  # 0 → head_dim
    rope_style: str = ROPE_NORM
    # loader converted interleaved ("norm") q/k weights to the split-half
    # (neox) row order (rope de-interleave — see loader._deinterleave_rope);
    # runtime rope_style is then neox.  LoRA deltas on wq/wk must be
    # permuted the same way (models/adapters.py).
    rope_deinterleaved: bool = False
    # rope scaling ("none" | "linear" | "yarn")
    rope_scaling: str = "none"
    rope_scale: float = 1.0
    yarn_orig_ctx: int = 0
    yarn_attn_factor: float = 1.0
    yarn_beta_fast: float = 32.0
    yarn_beta_slow: float = 1.0
    yarn_log_mul: float = 0.0
    # family quirks
    tie_embeddings: bool = False
    attn_logit_softcap: float = 0.0  # gemma2
    final_logit_softcap: float = 0.0  # gemma2
    sliding_window: int = 0  # 0 = disabled; gemma2 alternates per layer
    sliding_window_pattern: int = 1  # apply SWA on layers where l % p != p-1
    post_norms: bool = False  # gemma2 post-attention/post-ffn norms
    embedding_scale: float = 1.0  # gemma: sqrt(n_embd)
    logit_scale: float = 1.0
    residual_scale: float = 1.0  # minicpm: 1.4/sqrt(n_layer) on both adds
    attn_scale: float = 0.0  # 0 → 1/sqrt(head_dim)
    norm_eps_add_one: bool = False  # gemma rmsnorm uses (1 + w)
    act: str = "silu"  # "silu" | "gelu"
    qkv_bias: bool = False  # qwen2 attention biases
    q_norm: bool = False  # qwen3: per-head q/k rmsnorm
    # MoE
    n_experts: int = 0
    n_experts_used: int = 0
    moe_ff: int = 0  # expert ffn width (defaults to n_ff)
    moe_norm_topk: bool = True  # renormalize top-k weights (deepseek2: no)
    moe_scale: float = 1.0  # expert_weights_scale (deepseek2)
    n_expert_groups: int = 0  # deepseek2 group_limited_greedy: expert groups
    n_group_used: int = 0  # ... groups kept before top-k
    n_shared_experts: int = 0  # deepseek2 shared expert FFN
    n_dense_layers: int = 0  # leading dense (non-MoE) layers
    # MLA (deepseek2): low-rank kv compression + decoupled rope
    kv_lora_rank: int = 0
    q_lora_rank: int = 0
    head_dim_v: int = 0  # 0 → head_dim (MLA: v dim ≠ qk dim)
    # broader-family quirks
    norm_type: str = "rms"  # "rms" | "layer" (gpt2/falcon/phi2/mpt/command-r)
    parallel_residual: bool = False  # x + attn + ffn(attn_norm(x)) (falcon…)
    alibi_max_bias: float = 0.0  # mpt: ALiBi slopes replace rope
    clamp_kqv: float = 0.0  # mpt: clamp qkv projections to ±clamp
    # mamba SSM (recurrent — no KV cache)
    ssm_d_inner: int = 0
    ssm_d_state: int = 0
    ssm_d_conv: int = 0
    ssm_dt_rank: int = 0
    # openelm: per-layer head/ff counts (tuples, hashable); n_heads /
    # n_kv_heads hold the maxima (the KV cache is padded to them)
    heads_per_layer: tuple = ()
    kv_heads_per_layer: tuple = ()
    ff_per_layer: tuple = ()
    # t5 encoder / encoder-decoder
    rel_buckets: int = 0  # relative attention bias buckets (0 = off)
    rel_max_dist: int = 128
    dec_start_token: int = -1  # t5 decoder start token (llama.cpp:389)

    @property
    def gqa_groups(self) -> int:
        return self.n_heads // self.n_kv_heads

    @property
    def rope_dims(self) -> int:
        return self.rope_dim or self.head_dim

    @classmethod
    def from_gguf_metadata(cls, md: Mapping[str, Any]) -> "ModelConfig":
        arch = str(md.get("general.architecture", "llama"))

        def g(key: str, default=None):
            return md.get(f"{arch}.{key}", default)

        n_embd = int(g("embedding_length"))
        # openelm stores per-layer arrays under the scalar keys
        # (llama.cpp ml.get_key_or_arr into hparams.n_head_arr)
        per_layer: dict[str, tuple] = {}

        def g_scalar(key: str, default=None, agg=max):
            v = g(key, default)
            if isinstance(v, (list, tuple)) or (
                hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0
            ):
                per_layer[key] = tuple(int(x) for x in v)
                return agg(per_layer[key])
            return v

        n_heads = int(g_scalar("attention.head_count"))
        n_kv = int(g_scalar("attention.head_count_kv", n_heads))
        n_ff_max = int(g_scalar("feed_forward_length"))
        head_dim = int(g("attention.key_length", n_embd // n_heads))
        n_vocab = int(g("vocab_size", 0)) or len(md.get("tokenizer.ggml.tokens", []))
        scaling_type = str(g("rope.scaling.type", "none") or "none")
        rope_scale = float(g("rope.scaling.factor", 0.0) or 0.0)
        if rope_scale == 0.0:
            linear = float(g("rope.scale_linear", 0.0) or 0.0)
            rope_scale = linear if linear else 1.0
            if linear and scaling_type == "none":
                scaling_type = "linear"

        quirks: dict[str, Any] = {}
        if arch in ("gemma", "gemma2"):
            quirks.update(
                embedding_scale=float(n_embd) ** 0.5,
                norm_eps_add_one=True,
                act="gelu",
                tie_embeddings=True,
            )
        if arch == "gemma2":
            quirks.update(
                post_norms=True,
                attn_logit_softcap=float(g("attn_logit_softcapping", 50.0)),
                final_logit_softcap=float(g("final_logit_softcapping", 30.0)),
                sliding_window_pattern=2,
                attn_scale=1.0 / (float(n_embd // n_heads) ** 0.5),
            )
        if arch in ("qwen2", "qwen2moe"):
            quirks.update(qkv_bias=True)
        if arch == "qwen2moe":
            quirks.update(moe_norm_topk=bool(
                md.get(f"{arch}.expert_weights_norm", False)))
        if arch in ("qwen3", "qwen3moe"):
            quirks.update(q_norm=True)
        if arch in ("gpt2", "starcoder", "mpt", "bloom", "jais", "bert",
                    "starcoder2"):
            quirks.update(norm_type="layer", act="gelu")
        if arch in ("stablelm", "olmo"):
            quirks.update(norm_type="layer")  # silu FFN, LayerNorm
        if arch == "nomic-bert":
            # build_bert nomic path: rope positions, gated silu FFN
            quirks.update(norm_type="layer", act="silu")
        if arch == "jina-bert-v2":
            quirks.update(
                norm_type="layer", act="gelu",
                alibi_max_bias=float(g("attention.max_alibi_bias", 8.0) or 8.0),
            )
        if arch == "bloom":
            quirks.update(
                alibi_max_bias=float(g("attention.max_alibi_bias", 8.0) or 8.0),
                tie_embeddings=True,
            )
        if arch == "olmo":
            quirks.update(
                clamp_kqv=float(g("attention.clamp_kqv", 0.0) or 0.0))
        if arch == "deepseek2":
            quirks.update(
                kv_lora_rank=int(g("attention.kv_lora_rank", 0) or 0),
                q_lora_rank=int(g("attention.q_lora_rank", 0) or 0),
                head_dim_v=int(g("attention.value_length", 0) or 0),
                n_dense_layers=int(g("leading_dense_block_count", 0) or 0),
                n_shared_experts=int(g("expert_shared_count", 0) or 0),
                moe_scale=float(g("expert_weights_scale", 1.0) or 1.0),
                moe_norm_topk=False,
                n_expert_groups=int(g("expert_group_count", 0) or 0),
                n_group_used=int(g("expert_group_used_count", 0) or 0),
            )
        if arch in ("t5", "t5encoder"):
            quirks.update(
                rel_buckets=int(g("attention.relative_buckets_count", 32) or 32),
                rel_max_dist=int(g("attention.relative_max_distance", 128) or 128),
                attn_scale=1.0,  # T5 attention is unscaled
                act="gelu",  # gated t5 v1.1 (non-gated path uses relu)
                dec_start_token=int(g("decoder_start_token_id", -1)
                                    if g("decoder_start_token_id") is not None
                                    else -1),
            )
        if arch == "mamba":
            quirks.update(
                ssm_d_inner=int(g("ssm.inner_size", 0) or 0),
                ssm_d_state=int(g("ssm.state_size", 16) or 16),
                ssm_d_conv=int(g("ssm.conv_kernel", 4) or 4),
                ssm_dt_rank=int(g("ssm.time_step_rank", 0) or 0),
            )
        if arch in ("falcon", "phi2", "gptneox"):
            quirks.update(norm_type="layer", act="gelu",
                          parallel_residual=True)
        if arch == "gptneox":
            # use_parallel_residual is stored per model
            quirks.update(parallel_residual=bool(
                md.get(f"{arch}.use_parallel_residual", True)))
        if arch == "command-r":
            quirks.update(norm_type="layer", parallel_residual=True)
        if arch == "minicpm":
            # build_minicpm (llama.cpp:11514): fixed embedding (12.0),
            # residual (1.4/sqrt(L)) and lm-head (256/n_embd) multipliers
            quirks.update(
                embedding_scale=12.0,
                residual_scale=1.4 / float(int(g("block_count"))) ** 0.5,
            )
        if arch == "orion":
            # build_orion (:11277): mean-centered LayerNorm, silu gate FFN
            quirks.update(norm_type="layer")
        if arch == "dbrx":
            # build_dbrx (:9450): biasless LayerNorm, fused clamped qkv,
            # all-MoE FFN (attn_out_norm serves as the ffn norm — loader
            # renames it)
            quirks.update(
                norm_type="layer",
                clamp_kqv=float(g("attention.clamp_kqv", 0.0) or 0.0),
            )
        if arch == "jais":
            # build_jais (:13560): gpt2-style LayerNorm + fused qkv, but a
            # SwiGLU gate FFN, ALiBi positions, and 1/head_dim attn scale
            quirks.update(
                act="silu",
                attn_scale=1.0 / float(head_dim),
                alibi_max_bias=float(g("attention.max_alibi_bias", 8.0) or 8.0),
            )
        if arch == "openelm":
            # build_openelm (llama.cpp:12443): per-layer head/ff counts,
            # fused qkv in per-head layout, q/k rms norms, neox rope
            quirks.update(
                q_norm=True,
                heads_per_layer=per_layer.get("attention.head_count", ()),
                kv_heads_per_layer=per_layer.get("attention.head_count_kv", ()),
                ff_per_layer=per_layer.get("feed_forward_length", ()),
            )
        if arch == "plamo":
            # build_plamo (llama.cpp:10950): rms norm, attention and FFN both
            # read the attn_norm output, one residual add (falcon pattern)
            quirks.update(parallel_residual=True)
        if arch == "codeshell":
            # build_codeshell (:11159): gpt2 graph (LayerNorm, fused qkv
            # with bias, gelu FFN) + neox rope, no learned positions
            quirks.update(norm_type="layer", act="gelu")
        if arch == "grok":
            # build_grok (:9265): rms, gelu MoE, post attn/ffn norms, fixed
            # embedding (78.38…) and output (1/sqrt(3)) multipliers
            quirks.update(
                act="gelu",
                post_norms=True,
                embedding_scale=78.38367176906169,
                tie_embeddings=True,
            )
        if arch == "mpt":
            quirks.update(
                alibi_max_bias=float(g("attention.max_alibi_bias", 0.0) or 0.0),
                clamp_kqv=float(g("attention.clamp_kqv", 0.0) or 0.0),
            )

        return cls(
            arch=arch,
            n_layers=int(g("block_count")),
            n_embd=n_embd,
            n_heads=n_heads,
            n_kv_heads=n_kv,
            n_ff=n_ff_max,
            n_vocab=n_vocab,
            n_ctx_train=int(g("context_length", 4096)),
            head_dim=head_dim,
            rms_eps=float(
                g("attention.layer_norm_epsilon", 1e-5)
                if quirks.get("norm_type") == "layer"
                else g("attention.layer_norm_rms_epsilon",
                       g("attention.layer_norm_epsilon", 1e-5))
            ),
            rope_base=float(g("rope.freq_base", 10000.0)),
            rope_dim=int(g("rope.dimension_count", 0)),
            rope_style=_ARCH_ROPE.get(arch, ROPE_NEOX),
            rope_scaling=scaling_type,
            rope_scale=rope_scale,
            yarn_orig_ctx=int(g("rope.scaling.original_context_length", 0)),
            yarn_attn_factor=float(g("rope.scaling.attn_factor", 1.0)),
            yarn_log_mul=float(g("rope.scaling.yarn_log_multiplier", 0.0)),
            sliding_window=int(g("attention.sliding_window", 0) or 0),
            logit_scale=float(
                g("logit_scale", 0.0)
                or (0.5773502691896257 if arch == "grok"
                    else 256.0 / n_embd if arch == "minicpm" else 1.0)
            ),
            n_experts=int(g("expert_count", 0) or 0),
            n_experts_used=int(g("expert_used_count", 0) or 0),
            moe_ff=int(g("expert_feed_forward_length", 0) or 0),
            **quirks,
        )
