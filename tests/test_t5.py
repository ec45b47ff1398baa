"""T5 encoder parity vs HF transformers (llama_encode_internal analog).

Reference: build_t5_encoder (/root/reference/cpp/src/llama.cpp:13210).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from booster_tpu.convert import convert_hf_model
from booster_tpu.gguf import GGMLType
from booster_tpu.models import load_model
from booster_tpu.models.t5 import encode, relative_buckets


def _mk(tmp_path, gated: bool):
    cfg = transformers.T5Config(
        vocab_size=256, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=32,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = transformers.T5EncoderModel(cfg).eval()
    path = str(tmp_path / f"t5_{gated}.gguf")
    convert_hf_model(hf, out_path=path, quant_type=GGMLType.F32)
    return hf, load_model(path)


def test_relative_buckets_match_hf():
    from transformers.models.t5.modeling_t5 import T5Attention

    T = 24
    got = relative_buckets(T, 8, 32)
    ctx = torch.arange(T)[:, None]
    mem = torch.arange(T)[None, :]
    want = T5Attention._relative_position_bucket(
        mem - ctx, bidirectional=True, num_buckets=8, max_distance=32
    ).numpy()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("gated", [False, True])
def test_t5_encoder_parity(tmp_path, gated):
    hf, loaded = _mk(tmp_path, gated)
    assert loaded.cfg.arch == "t5encoder"
    assert loaded.cfg.head_dim == 16  # d_kv ≠ d_model / heads
    ids = np.array([[3, 17, 42, 99, 7, 12]], np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(ids.astype(np.int64))).last_hidden_state.float().numpy()
    got = np.asarray(encode(loaded.params, loaded.cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=0.03, rtol=0.05)
