"""nomic-bert and jina-bert-v2 encoder parity vs an independent numpy
reference (no transformers implementation exists for either — both are
remote-code models).  Reference graph: build_bert's arch conditionals
(/root/reference/cpp/src/llama.cpp:9746 — nomic: neox rope + gated silu
FFN + GQA; jina: ALiBi + gated gelu FFN + q/k LayerNorms + attn_norm_2).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from booster_tpu.gguf import GGMLType, GGUFWriter
from booster_tpu.models import load_model
from booster_tpu.models.bert import POOL_NONE, encode
from tests.test_model_breadth3 import np_gelu, np_ln, np_rope, np_silu

IDS = np.array([[3, 17, 42, 99, 7]], np.int32)
H, HKV, HID, FF, L, V = 4, 2, 64, 128, 2, 256
HD = HID // H


def _build(arch, path, seed=0):
    rng = np.random.default_rng(seed)

    def W(*shape):
        return (rng.normal(size=shape) * 0.25 / np.sqrt(shape[-1])).astype(np.float32)

    jina = arch == "jina-bert-v2"
    w = GGUFWriter()
    w.add("general.architecture", arch)
    w.add(f"{arch}.block_count", L)
    w.add(f"{arch}.context_length", 128)
    w.add(f"{arch}.embedding_length", HID)
    w.add(f"{arch}.feed_forward_length", FF)
    w.add(f"{arch}.attention.head_count", H)
    w.add(f"{arch}.attention.head_count_kv", H if jina else HKV)
    w.add(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", HD)
    w.add(f"{arch}.vocab_size", V)
    if jina:
        w.add(f"{arch}.attention.max_alibi_bias", 8.0)

    kvh = H if jina else HKV
    t = {
        "token_embd.weight": W(V, HID),
        "token_types.weight": W(2, HID),
        "token_embd_norm.weight": 1.0 + W(HID),
        "token_embd_norm.bias": W(HID),
    }
    for i in range(L):
        p = f"blk.{i}."
        if jina:
            t[p + "attn_q.weight"] = W(HID, HID)
            t[p + "attn_q.bias"] = W(HID)
            t[p + "attn_k.weight"] = W(kvh * HD, HID)
            t[p + "attn_k.bias"] = W(kvh * HD)
            t[p + "attn_v.weight"] = W(kvh * HD, HID)
            t[p + "attn_v.bias"] = W(kvh * HD)
            t[p + "attn_q_norm.weight"] = 1.0 + W(HID)
            t[p + "attn_q_norm.bias"] = W(HID)
            t[p + "attn_k_norm.weight"] = 1.0 + W(kvh * HD)
            t[p + "attn_k_norm.bias"] = W(kvh * HD)
            t[p + "attn_norm_2.weight"] = 1.0 + W(HID)
            t[p + "attn_norm_2.bias"] = W(HID)
        else:  # nomic: fused qkv, no biases (loader splits)
            t[p + "attn_qkv.weight"] = W(HID + 2 * kvh * HD, HID)
        t[p + "attn_output.weight"] = W(HID, HID)
        t[p + "attn_output_norm.weight"] = 1.0 + W(HID)
        t[p + "attn_output_norm.bias"] = W(HID)
        t[p + "ffn_gate.weight"] = W(FF, HID)
        t[p + "ffn_up.weight"] = W(FF, HID)
        t[p + "ffn_down.weight"] = W(HID, FF)
        if jina:
            t[p + "ffn_down.bias"] = W(HID)
        t[p + "layer_output_norm.weight"] = 1.0 + W(HID)
        t[p + "layer_output_norm.bias"] = W(HID)
    for name, arr in t.items():
        w.add_tensor(name, arr.astype(np.float32), arr.shape, GGMLType.F32)
    w.write(path)
    return t


def _np_encode(arch, t, ids):
    jina = arch == "jina-bert-v2"
    kvh = H if jina else HKV
    act = np_gelu if jina else np_silu
    T = len(ids)
    pos = np.arange(T)
    slopes = None
    if jina:
        n2 = 2 ** int(np.floor(np.log2(H)))
        m0, m1 = 2.0 ** (-8.0 / n2), 2.0 ** (-4.0 / n2)
        slopes = np.array([m0 ** (h + 1) for h in range(n2)]
                          + [m1 ** (2 * (h - n2) + 1) for h in range(n2, H)])

    x = t["token_embd.weight"][ids] + t["token_types.weight"][0]
    x = np_ln(x, t["token_embd_norm.weight"], t["token_embd_norm.bias"])
    for i in range(L):
        p = f"blk.{i}."
        if jina:
            q = x @ t[p + "attn_q.weight"].T + t[p + "attn_q.bias"]
            k = x @ t[p + "attn_k.weight"].T + t[p + "attn_k.bias"]
            v = x @ t[p + "attn_v.weight"].T + t[p + "attn_v.bias"]
            q = np_ln(q, t[p + "attn_q_norm.weight"], t[p + "attn_q_norm.bias"])
            k = np_ln(k, t[p + "attn_k_norm.weight"], t[p + "attn_k_norm.bias"])
        else:
            qkv = x @ t[p + "attn_qkv.weight"].T
            q, k, v = (qkv[:, :HID], qkv[:, HID : HID + kvh * HD],
                       qkv[:, HID + kvh * HD :])
        q = q.reshape(T, H, HD)
        k = k.reshape(T, kvh, HD)
        v = v.reshape(T, kvh, HD)
        if not jina:  # nomic rope (neox)
            q = np_rope(q, pos, HD, "neox")
            k = np_rope(k, pos, HD, "neox")
        G = H // kvh
        attn = np.zeros((T, H, HD))
        for h in range(H):
            s = (q[:, h] @ k[:, h // G].T) / np.sqrt(HD)
            if slopes is not None:
                s = s + slopes[h] * pos[None, :]
            pr = np.exp(s - s.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            attn[:, h] = pr @ v[:, h // G]
        attn = attn.reshape(T, -1) @ t[p + "attn_output.weight"].T
        x = np_ln(x + attn, t[p + "attn_output_norm.weight"],
                  t[p + "attn_output_norm.bias"])
        if jina:
            x = np_ln(x, t[p + "attn_norm_2.weight"], t[p + "attn_norm_2.bias"])
        g = act(x @ t[p + "ffn_gate.weight"].T)
        ffn = (g * (x @ t[p + "ffn_up.weight"].T)) @ t[p + "ffn_down.weight"].T
        if jina:
            ffn = ffn + t[p + "ffn_down.bias"]
        x = np_ln(x + ffn, t[p + "layer_output_norm.weight"],
                  t[p + "layer_output_norm.bias"])
    return x


@pytest.mark.parametrize("arch", ["nomic-bert", "jina-bert-v2"])
def test_encoder_variant_parity(arch, tmp_path):
    path = str(tmp_path / f"{arch}.gguf")
    tensors = _build(arch, path, seed=5)
    want = _np_encode(arch, tensors, IDS[0])

    loaded = load_model(path)
    assert loaded.cfg.arch == arch
    got = np.asarray(
        encode(loaded.params, loaded.cfg, jnp.asarray(IDS), pooling=POOL_NONE)
    )[0]
    np.testing.assert_allclose(got, want.astype(np.float32), atol=0.05,
                               rtol=0.05)
