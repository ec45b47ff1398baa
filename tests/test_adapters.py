"""LoRA adapters and control vectors: exactness vs manually merged weights."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

import jax.numpy as jnp

from booster_tpu.gguf import GGMLType, GGUFReader, GGUFWriter
from booster_tpu.models import load_model
from booster_tpu.models.adapters import (
    apply_control_vector,
    apply_lora,
    load_control_vector,
    load_lora,
)
from booster_tpu.models.llama import forward
from booster_tpu.ops.kv_cache import KVCache
from tools.make_test_model import make_model


def logits_of(loaded, ids):
    cache = KVCache.create(loaded.cfg.n_layers, 1, 16, loaded.cfg.n_kv_heads,
                           loaded.cfg.head_dim, dtype=jnp.float32)
    out, _ = forward(loaded.params, loaded.cfg, jnp.asarray(ids), cache)
    return np.asarray(out)


def write_lora(path, n_layers, rank, out_f, in_f, alpha=8.0, seed=0):
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add("general.architecture", "llama")
    w.add("general.type", "adapter")
    w.add("adapter.type", "lora")
    w.add("adapter.lora.alpha", alpha)
    tensors = {}
    for i in range(n_layers):
        a = rng.standard_normal((rank, in_f)).astype(np.float32) * 0.05
        b = rng.standard_normal((out_f, rank)).astype(np.float32) * 0.05
        w.add_tensor(f"blk.{i}.attn_q.weight.lora_a", a, a.shape, GGMLType.F32)
        w.add_tensor(f"blk.{i}.attn_q.weight.lora_b", b, b.shape, GGMLType.F32)
        tensors[i] = (a, b)
    w.write(path)
    return tensors, alpha / rank


def test_lora_matches_merged_weights(tmp_path):
    base_path = str(tmp_path / "base.gguf")
    make_model(base_path, vocab_size=256, hidden=64, layers=2, quant=GGMLType.F32)
    ids = np.array([[1, 7, 42]], np.int32)

    lora_path = str(tmp_path / "ad.gguf")
    tensors, scale = write_lora(lora_path, 2, rank=4, out_f=64, in_f=64)

    # runtime-LoRA model
    m = load_model(base_path, fuse=False)
    lora = load_lora(lora_path)
    assert lora["rank"] == 4
    # llama is an interleaved-rope arch: the loader de-interleaves wq/wk,
    # so apply_lora must permute the adapter's B rows to match (cfg arg)
    assert m.cfg.rope_deinterleaved
    m.params = apply_lora(m.params, lora, cfg=m.cfg)
    got = logits_of(m, ids)

    # merged-weights model: W_q' = W_q + scale * B @ A baked into the file
    with GGUFReader(base_path) as r:
        merged = GGUFWriter()
        for key, val in r.metadata.items():
            merged.add(key, val)
        for info in r:
            from booster_tpu.quant import dequantize, quantize

            wdat = dequantize(r.tensor_bytes(info), info.ggml_type, shape=info.shape)
            if info.name.endswith("attn_q.weight"):
                idx = int(info.name.split(".")[1])
                a, b = tensors[idx]
                wdat = wdat + scale * (b @ a)
            merged.add_tensor(info.name, quantize(wdat, GGMLType.F32),
                              info.shape, GGMLType.F32)
        merged_path = str(tmp_path / "merged.gguf")
        merged.write(merged_path)
    want = logits_of(load_model(merged_path, fuse=False), ids)
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_zero_lora_is_identity(tmp_path):
    base_path = str(tmp_path / "b2.gguf")
    make_model(base_path, vocab_size=256, hidden=64, layers=1, quant=GGMLType.F32)
    ids = np.array([[1, 7]], np.int32)
    m = load_model(base_path, fuse=False)
    base_logits = logits_of(m, ids)
    lora = {
        "targets": {"wq": {"a": np.zeros((1, 2, 64), np.float32),
                           "b": np.zeros((1, 64, 2), np.float32)}},
        "scale": 1.0, "rank": 2,
    }
    m.params = apply_lora(m.params, lora)
    np.testing.assert_array_equal(logits_of(m, ids), base_logits)


def test_control_vector(tmp_path):
    base_path = str(tmp_path / "b3.gguf")
    make_model(base_path, vocab_size=256, hidden=64, layers=2, quant=GGMLType.F32)
    ids = np.array([[1, 7]], np.int32)
    m = load_model(base_path)
    base_logits = logits_of(m, ids)

    cv_path = str(tmp_path / "cv.gguf")
    w = GGUFWriter()
    w.add("general.architecture", "controlvector")
    rng = np.random.default_rng(0)
    for i in (1, 2):  # 1-indexed llama.cpp convention
        v = rng.standard_normal(64).astype(np.float32) * 0.1
        w.add_tensor(f"direction.{i}", v, (64,), GGMLType.F32)
    w.write(cv_path)

    cvec = load_control_vector(cv_path, scale=1.0, n_layers=2)
    assert cvec.shape == (2, 64)
    m.params = apply_control_vector(m.params, cvec)
    steered = logits_of(m, ids)
    assert not np.allclose(steered, base_logits)
    # zero vector → identity
    m.params = apply_control_vector(m.params, np.zeros((2, 64), np.float32))
    np.testing.assert_allclose(logits_of(m, ids), base_logits, atol=1e-6)
