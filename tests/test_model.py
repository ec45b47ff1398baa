"""Model forward parity vs HuggingFace transformers (torch CPU).

Builds a tiny random LlamaForCausalLM, converts it to GGUF via our converter
(rope permutation included), loads it with our loader, and compares logits —
the whole chain: convert → write → read → repack → forward.
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


def tiny_llama_hf(vocab=256, hidden=64, layers=2, heads=4, kv_heads=2, ff=128):
    cfg = transformers.LlamaConfig(
        vocab_size=vocab,
        hidden_size=hidden,
        intermediate_size=ff,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    model = tiny_llama_hf()
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    convert_hf_model(model, out_path=path, quant_type=GGMLType.F32)
    loaded = load_model(path)
    return model, loaded


def hf_logits(model, ids):
    with torch.no_grad():
        return model(torch.tensor(ids)).logits.float().numpy()


def test_forward_matches_hf(tiny_model):
    hf, loaded = tiny_model
    ids = np.array([[1, 5, 9, 42, 77, 120, 3, 8]], dtype=np.int32)
    want = hf_logits(hf, ids)

    cache = KVCache.create(loaded.cfg.n_layers, 1, 32, loaded.cfg.n_kv_heads,
                           loaded.cfg.head_dim, dtype=jnp.float32)
    got, _ = forward(loaded.params, loaded.cfg, jnp.asarray(ids), cache)
    got = np.asarray(got)
    assert got.shape == want.shape
    # bf16 matmuls inside: compare argmax everywhere + loose numeric match
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=0.35, rtol=0.05)


def test_incremental_decode_matches_full(tiny_model):
    """prefill+decode through the KV cache == one-shot full forward."""
    _, loaded = tiny_model
    ids = np.array([[1, 5, 9, 42, 77, 120, 3, 8]], dtype=np.int32)
    cache = KVCache.create(loaded.cfg.n_layers, 1, 32, loaded.cfg.n_kv_heads,
                           loaded.cfg.head_dim, dtype=jnp.float32)
    full, _ = forward(loaded.params, loaded.cfg, jnp.asarray(ids), cache)

    cache2 = KVCache.create(loaded.cfg.n_layers, 1, 32, loaded.cfg.n_kv_heads,
                            loaded.cfg.head_dim, dtype=jnp.float32)
    # prefill first 5, then decode one at a time
    out5, cache2 = forward(loaded.params, loaded.cfg, jnp.asarray(ids[:, :5]), cache2)
    steps = [np.asarray(out5)[:, -1]]
    for t in range(5, 8):
        out1, cache2 = forward(loaded.params, loaded.cfg, jnp.asarray(ids[:, t : t + 1]), cache2)
        steps.append(np.asarray(out1)[:, -1])
    full_np = np.asarray(full)
    for i, t in enumerate([4, 5, 6, 7]):
        # bf16 activations: chunked vs full batching rounds differently
        np.testing.assert_allclose(steps[i], full_np[:, t], atol=6e-3, rtol=6e-3)


def test_batch_with_different_lengths(tiny_model):
    """Per-slot cache offsets: two sequences prefilled to different lengths."""
    _, loaded = tiny_model
    cfg = loaded.cfg
    a = np.array([[1, 5, 9, 42]], dtype=np.int32)
    b = np.array([[7, 3]], dtype=np.int32)

    # individual references
    ca = KVCache.create(cfg.n_layers, 1, 16, cfg.n_kv_heads, cfg.head_dim, dtype=jnp.float32)
    la, _ = forward(loaded.params, cfg, jnp.asarray(a), ca)
    cb = KVCache.create(cfg.n_layers, 1, 16, cfg.n_kv_heads, cfg.head_dim, dtype=jnp.float32)
    lb, _ = forward(loaded.params, cfg, jnp.asarray(b), cb)

    # batch: prefill b into slot 1 with left area; emulate by prefilling
    # slot-wise with equal T but per-slot lengths via two calls
    batch_ids = np.stack([a[0], np.array([7, 3, 0, 0], np.int32)])
    cab = KVCache.create(cfg.n_layers, 2, 16, cfg.n_kv_heads, cfg.head_dim, dtype=jnp.float32)
    lab, _ = forward(loaded.params, cfg, jnp.asarray(batch_ids), cab)
    np.testing.assert_allclose(np.asarray(lab)[0], np.asarray(la)[0], atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(lab)[1, :2], np.asarray(lb)[0], atol=2e-3, rtol=2e-3)


def test_quantized_model_close(tmp_path):
    """Q8_0-quantized model still predicts the same tokens on short input."""
    hf = tiny_llama_hf()
    path = str(tmp_path / "q8.gguf")
    convert_hf_model(hf, out_path=path, quant_type=GGMLType.Q8_0)
    loaded = load_model(path)
    assert any(t == GGMLType.Q8_0 for t in loaded.file_types.values())
    ids = np.array([[1, 5, 9]], dtype=np.int32)
    want = hf_logits(hf, ids)
    cache = KVCache.create(loaded.cfg.n_layers, 1, 8, loaded.cfg.n_kv_heads,
                           loaded.cfg.head_dim, dtype=jnp.float32)
    got, _ = forward(loaded.params, loaded.cfg, jnp.asarray(ids), cache)
    np.testing.assert_array_equal(np.asarray(got).argmax(-1), want.argmax(-1))
