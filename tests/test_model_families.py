"""Forward parity vs HF transformers for qwen2, gemma2 and mixtral (MoE).

Validates the per-family quirk paths: qkv biases + neox rope (qwen2),
softcaps + post-norms + alternating sliding window + tied scaled embeddings
(gemma2), and routed experts (mixtral).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from booster_tpu.convert import convert_hf_model
from booster_tpu.gguf import GGMLType
from booster_tpu.models import load_model
from booster_tpu.models.llama import forward
from booster_tpu.ops.kv_cache import KVCache


def check_model(hf_model, path, ids, atol=0.4, arch=None):
    convert_hf_model(hf_model, out_path=path, quant_type=GGMLType.F32, arch=arch)
    loaded = load_model(path)
    with torch.no_grad():
        want = hf_model(torch.tensor(ids)).logits.float().numpy()
    cache = KVCache.create(loaded.cfg.n_layers, 1, 32, loaded.cfg.n_kv_heads,
                           loaded.cfg.head_dim, dtype=jnp.float32)
    got, _ = forward(loaded.params, loaded.cfg, jnp.asarray(ids), cache)
    got = np.asarray(got)
    # argmax must agree wherever the HF top-2 margin exceeds fp noise
    # (random tiny models produce near-flat logits with genuine ties)
    top2 = np.sort(want, axis=-1)[..., -2:]
    decisive = (top2[..., 1] - top2[..., 0]) > 0.02
    np.testing.assert_array_equal(
        got.argmax(-1)[decisive], want.argmax(-1)[decisive]
    )
    np.testing.assert_allclose(got, want, atol=atol, rtol=0.05)
    return loaded


def test_qwen2(tmp_path):
    cfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = transformers.Qwen2ForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "qwen2.gguf"), ids)
    assert loaded.cfg.arch == "qwen2"
    assert loaded.cfg.rope_style == "neox"
    assert "bq" in loaded.params["layers"] or "wqkv" not in loaded.params["layers"]


def test_gemma2(tmp_path):
    cfg = transformers.Gemma2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=16, sliding_window=16,
        max_position_embeddings=512,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
    )
    torch.manual_seed(0)
    hf = transformers.Gemma2ForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7, 2, 11, 5]], np.int32)
    loaded = check_model(hf, str(tmp_path / "gemma2.gguf"), ids)
    assert loaded.cfg.arch == "gemma2"
    assert loaded.cfg.final_logit_softcap > 0
    assert loaded.cfg.post_norms
    assert loaded.params["output"] is None  # tied embeddings


def test_mixtral_moe(tmp_path):
    cfg = transformers.MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = transformers.MixtralForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "mixtral.gguf"), ids, arch="mixtral")
    assert loaded.cfg.n_experts == 4
    assert loaded.cfg.n_experts_used == 2
    assert "gate_exps" in loaded.params["layers"]


def test_phi3(tmp_path):
    cfg = transformers.Phi3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.Phi3ForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "phi3.gguf"), ids)
    assert loaded.cfg.arch == "phi3"
    assert loaded.cfg.rope_style == "neox"
    # loader split the fused qkv / gate_up projections
    keys = set(loaded.params["layers"])
    assert ("wq" in keys or "wqkv" in keys)


def test_qwen3(tmp_path):
    """qwen3: per-head q/k rmsnorm before rope."""
    cfg = transformers.Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = transformers.Qwen3ForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "qwen3.gguf"), ids, arch="qwen3")
    assert loaded.cfg.q_norm
    assert "q_norm" in loaded.params["layers"]


def test_gemma1(tmp_path):
    cfg = transformers.GemmaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512,
        hidden_act="gelu_pytorch_tanh",
    )
    torch.manual_seed(0)
    hf = transformers.GemmaForCausalLM(cfg).eval()
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    loaded = check_model(hf, str(tmp_path / "gemma1.gguf"), ids, arch="gemma")
    assert loaded.cfg.norm_eps_add_one
    assert loaded.cfg.embedding_scale == 8.0  # sqrt(64)
    assert loaded.params["output"] is None
