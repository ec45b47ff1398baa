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


def _mk_full(tmp_path, tied: bool):
    cfg = transformers.T5Config(
        vocab_size=256, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=32,
        feed_forward_proj="gated-gelu",
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
        tie_word_embeddings=tied,
    )
    torch.manual_seed(1)
    hf = transformers.T5ForConditionalGeneration(cfg).eval()
    path = str(tmp_path / f"t5full_{tied}.gguf")
    convert_hf_model(hf, out_path=path, quant_type=GGMLType.F32)
    return hf, load_model(path)


@pytest.mark.parametrize("tied", [False, True])
def test_t5_encdec_parity(tmp_path, tied):
    """Full encoder-decoder: step the cached decoder and match HF logits
    at every decoder position (llama.cpp build_t5 decoder half :13377)."""
    from booster_tpu.models.t5 import cross_kv, decode_step

    hf, loaded = _mk_full(tmp_path, tied)
    assert loaded.cfg.arch == "t5"
    assert loaded.cfg.dec_start_token == 0
    enc_ids = np.array([[3, 17, 42, 99, 7, 12]], np.int32)
    dec_ids = np.array([[0, 5, 77, 130, 9]], np.int32)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(enc_ids.astype(np.int64)),
            decoder_input_ids=torch.tensor(dec_ids.astype(np.int64)),
        ).logits.float().numpy()  # [1, Tdec, V]

    enc_out = encode(loaded.params, loaded.cfg, jnp.asarray(enc_ids))
    xk, xv = cross_kv(loaded.params, loaded.cfg, enc_out)
    cfg = loaded.cfg
    T = dec_ids.shape[1]
    ck = jnp.zeros((cfg.n_layers, 1, T, cfg.n_heads, cfg.head_dim), jnp.bfloat16)
    cv = jnp.zeros_like(ck)
    enc_valid = jnp.full((1,), enc_ids.shape[1], jnp.int32)
    got = []
    for t in range(T):
        logits, ck, cv = decode_step(
            loaded.params, cfg, jnp.asarray(dec_ids[:, t]), jnp.int32(t),
            ck, cv, xk, xv, enc_valid)
        got.append(np.asarray(logits))
    got = np.stack(got, axis=1)
    # bf16 matmul accumulation: ~2% of logit magnitude; argmax must agree
    np.testing.assert_allclose(got, want, atol=0.3, rtol=0.08)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_t5_generate(tmp_path):
    from booster_tpu.models.t5 import generate_t5

    hf, loaded = _mk_full(tmp_path, False)
    ids = [3, 17, 42, 99]
    out = generate_t5(loaded, ids, max_new_tokens=8)
    with torch.no_grad():
        want = hf.generate(
            torch.tensor([ids]), max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, 1:].tolist()
    assert out[: len(want)] == want[: len(out)]
    assert len(out) > 0


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
