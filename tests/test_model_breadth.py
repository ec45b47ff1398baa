"""Forward parity vs HF transformers for the broader architecture sweep:
gpt2, starcoder (gpt_bigcode), falcon, phi2, mpt (ALiBi), gptneox
(parallel residual + partial rotary), command-r (parallel + logit scale).

Reference builders being reproduced: build_gpt2 (llama.cpp:11054),
build_starcoder (:9548), build_falcon (:9145), build_phi2 (:10701),
build_mpt (:10041), build_gptneox (:12568), build_command_r (:12164).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tests.test_model_families import check_model


def test_gpt2(tmp_path):
    cfg = transformers.GPT2Config(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=128,
        n_inner=None,  # 4*n_embd
    )
    torch.manual_seed(0)
    hf = transformers.GPT2LMHeadModel(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "gpt2.gguf"), ids)
    assert loaded.cfg.arch == "gpt2"
    assert loaded.cfg.norm_type == "layer"
    assert loaded.cfg.rope_style == "none"
    assert "pos_embd" in loaded.params


def test_starcoder(tmp_path):
    cfg = transformers.GPTBigCodeConfig(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=128,
        n_inner=256, multi_query=True,
    )
    torch.manual_seed(0)
    hf = transformers.GPTBigCodeForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "starcoder.gguf"), ids)
    assert loaded.cfg.arch == "starcoder"
    assert loaded.cfg.n_kv_heads == 1  # MQA


def test_falcon(tmp_path):
    cfg = transformers.FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, bias=False, alibi=False,
    )
    torch.manual_seed(0)
    hf = transformers.FalconForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "falcon.gguf"), ids)
    assert loaded.cfg.arch == "falcon"
    assert loaded.cfg.parallel_residual
    assert loaded.cfg.rope_style == "neox"


def test_falcon_new_arch_gqa(tmp_path):
    """Falcon-40B layout: new_decoder_architecture grouped qkv interleave."""
    cfg = transformers.FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2,
        new_decoder_architecture=True, bias=False, alibi=False,
    )
    torch.manual_seed(0)
    hf = transformers.FalconForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "falcon40.gguf"), ids)
    assert loaded.cfg.n_kv_heads == 2


def test_phi2(tmp_path):
    cfg = transformers.PhiConfig(
        vocab_size=256, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=0.5, max_position_embeddings=128,
    )
    torch.manual_seed(0)
    hf = transformers.PhiForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "phi2.gguf"), ids)
    assert loaded.cfg.arch == "phi2"
    assert loaded.cfg.parallel_residual
    assert loaded.cfg.rope_dims == 8  # partial rotary: 0.5 * head_dim(16)
    assert "output_b" in loaded.params  # phi2 lm-head bias


def test_mpt_alibi(tmp_path):
    cfg = transformers.MptConfig(
        vocab_size=256, d_model=64, n_layers=2, n_heads=4, max_seq_len=128,
        expansion_ratio=4,
    )
    torch.manual_seed(0)
    hf = transformers.MptForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "mpt.gguf"), ids)
    assert loaded.cfg.arch == "mpt"
    assert loaded.cfg.alibi_max_bias > 0
    assert loaded.cfg.rope_style == "none"


def test_gptneox(tmp_path):
    cfg = transformers.GPTNeoXConfig(
        vocab_size=256, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.25,
        max_position_embeddings=128, use_parallel_residual=True,
    )
    torch.manual_seed(0)
    hf = transformers.GPTNeoXForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "gptneox.gguf"), ids)
    assert loaded.cfg.arch == "gptneox"
    assert loaded.cfg.parallel_residual
    assert loaded.cfg.rope_dims == 4  # rotary_pct 0.25 * head_dim(16)


def test_bloom(tmp_path):
    cfg = transformers.BloomConfig(
        vocab_size=256, hidden_size=64, n_layer=2, n_head=4,
    )
    torch.manual_seed(0)
    hf = transformers.BloomForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "bloom.gguf"), ids)
    assert loaded.cfg.arch == "bloom"
    assert loaded.cfg.alibi_max_bias == 8.0
    assert "tok_norm" in loaded.params  # embedding LayerNorm


def test_stablelm(tmp_path):
    cfg = transformers.StableLmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.25, max_position_embeddings=128,
    )
    torch.manual_seed(0)
    hf = transformers.StableLmForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "stablelm.gguf"), ids)
    assert loaded.cfg.arch == "stablelm"
    assert loaded.cfg.norm_type == "layer"
    assert loaded.cfg.rope_dims == 4  # 0.25 * head_dim(16)


def test_starcoder2(tmp_path):
    cfg = transformers.Starcoder2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, sliding_window=None, use_bias=True,
    )
    torch.manual_seed(0)
    hf = transformers.Starcoder2ForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "starcoder2.gguf"), ids)
    assert loaded.cfg.arch == "starcoder2"
    assert loaded.cfg.act == "gelu"


def test_olmo(tmp_path):
    cfg = transformers.OlmoConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, clip_qkv=8.0,
    )
    torch.manual_seed(0)
    hf = transformers.OlmoForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "olmo.gguf"), ids)
    assert loaded.cfg.arch == "olmo"
    assert loaded.cfg.clamp_kqv == 8.0
    assert loaded.params["output_norm"] is None  # non-parametric LayerNorm


def test_command_r(tmp_path):
    cfg = transformers.CohereConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, logit_scale=0.25, use_qk_norm=False,
    )
    torch.manual_seed(0)
    hf = transformers.CohereForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "commandr.gguf"), ids)
    assert loaded.cfg.arch == "command-r"
    assert loaded.cfg.logit_scale == 0.25
    assert loaded.cfg.parallel_residual
    assert loaded.params["output"] is None  # tied embeddings


def test_qwen2moe(tmp_path):
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, shared_expert_intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        max_position_embeddings=128, tie_word_embeddings=False,
        norm_topk_prob=False,
    )
    torch.manual_seed(0)
    hf = transformers.Qwen2MoeForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "qwen2moe.gguf"), ids)
    assert loaded.cfg.arch == "qwen2moe"
    assert loaded.cfg.n_experts == 4
    assert not loaded.cfg.moe_norm_topk
    layers = loaded.params.get("layers") or loaded.params["layer_groups"][0]
    assert "shexp_gate" in layers  # sigmoid-gated shared expert


def test_qwen3moe(tmp_path):
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        max_position_embeddings=128, tie_word_embeddings=False,
        norm_topk_prob=True,
    )
    torch.manual_seed(0)
    hf = transformers.Qwen3MoeForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "qwen3moe.gguf"), ids)
    assert loaded.cfg.arch == "qwen3moe"
    assert loaded.cfg.q_norm and loaded.cfg.n_experts == 4
