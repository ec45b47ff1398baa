#!/usr/bin/env python
"""Build a tiny random llama-shaped GGUF (with a working SPM vocab) for tests
and local verification without downloading anything.

Usage: python tools/make_test_model.py [out.gguf] [--quant Q4_K] [--vocab 512]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from booster_tpu.gguf import GGMLType, GGUFWriter
from booster_tpu.quant import quantize
from booster_tpu.tokenizer.vocab import TokenType


def build_vocab(n: int):
    """Tiny but real SPM vocab: specials, bytes, chars, common merges."""
    tokens = ["<unk>", "<s>", "</s>"]
    types = [int(TokenType.UNKNOWN), int(TokenType.CONTROL), int(TokenType.CONTROL)]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(int(TokenType.BYTE))
        scores.append(0.0)
    chars = list("▁abcdefghijklmnopqrstuvwxyz.,!?0123456789")
    merges = ["▁the", "▁a", "he", "th", "the", "in", "er", "an", "re", "on",
              "▁and", "▁to", "▁of", "at", "en", "nd", "ti", "es", "or", "▁in",
              "ll", "▁hello", "▁world", "hello", "world", "lo", "el"]
    for i, t in enumerate(chars):
        tokens.append(t)
        types.append(int(TokenType.NORMAL))
        scores.append(-100.0)
    for i, t in enumerate(merges):
        tokens.append(t)
        types.append(int(TokenType.NORMAL))
        scores.append(-60.0 + i)
    while len(tokens) < n:
        tokens.append(f"<extra_{len(tokens)}>")
        types.append(int(TokenType.UNUSED))
        scores.append(-1e9)
    return tokens[:n], np.array(scores[:n], np.float32), np.array(types[:n], np.int32)


def make_model(
    out_path: str,
    vocab_size: int = 512,
    hidden: int = 128,
    layers: int = 2,
    heads: int = 4,
    kv_heads: int = 2,
    ff: int = 256,
    quant: GGMLType = GGMLType.Q4_0,
    seed: int = 0,
    weight_scale: float = 0.05,
    head_dim: int = 0,  # 0 → hidden // heads; else explicit (gemma-style)
) -> str:
    rng = np.random.default_rng(seed)
    tokens, scores, types = build_vocab(vocab_size)

    w = GGUFWriter()
    w.add("general.architecture", "llama")
    w.add("general.name", "booster-tpu-test")
    w.add("llama.block_count", layers)
    w.add("llama.context_length", 2048)
    w.add("llama.embedding_length", hidden)
    w.add("llama.feed_forward_length", ff)
    w.add("llama.attention.head_count", heads)
    w.add("llama.attention.head_count_kv", kv_heads)
    w.add("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add("llama.rope.freq_base", 10000.0)
    w.add("llama.rope.dimension_count", head_dim or hidden // heads)
    if head_dim and head_dim != hidden // heads:
        w.add("llama.attention.key_length", head_dim)
        w.add("llama.attention.value_length", head_dim)
    w.add("llama.vocab_size", vocab_size)
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.scores", scores)
    w.add("tokenizer.ggml.token_type", types)
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)
    w.add("tokenizer.ggml.unknown_token_id", 0)
    w.add("tokenizer.ggml.add_bos_token", True)

    def add(name, arr, qt=None):
        qt = qt or (quant if arr.ndim == 2 and arr.shape[-1] % 256 == 0 else GGMLType.F32)
        if arr.ndim < 2 or "norm" in name:
            qt = GGMLType.F32
        w.add_tensor(name, quantize(arr, qt), arr.shape, qt)

    s = weight_scale
    head_dim = head_dim or hidden // heads
    add("token_embd.weight", rng.standard_normal((vocab_size, hidden)).astype(np.float32) * s)
    add("output_norm.weight", np.ones(hidden, np.float32))
    add("output.weight", rng.standard_normal((vocab_size, hidden)).astype(np.float32) * s)
    for i in range(layers):
        p = f"blk.{i}."
        add(p + "attn_norm.weight", np.ones(hidden, np.float32))
        add(p + "attn_q.weight", rng.standard_normal((heads * head_dim, hidden)).astype(np.float32) * s)
        add(p + "attn_k.weight", rng.standard_normal((kv_heads * head_dim, hidden)).astype(np.float32) * s)
        add(p + "attn_v.weight", rng.standard_normal((kv_heads * head_dim, hidden)).astype(np.float32) * s)
        add(p + "attn_output.weight", rng.standard_normal((hidden, heads * head_dim)).astype(np.float32) * s)
        add(p + "ffn_norm.weight", np.ones(hidden, np.float32))
        add(p + "ffn_gate.weight", rng.standard_normal((ff, hidden)).astype(np.float32) * s)
        add(p + "ffn_up.weight", rng.standard_normal((ff, hidden)).astype(np.float32) * s)
        add(p + "ffn_down.weight", rng.standard_normal((hidden, ff)).astype(np.float32) * s)
    w.write(out_path)
    return out_path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="/tmp/booster_tiny.gguf")
    ap.add_argument("--quant", default="Q4_0")
    ap.add_argument("--vocab", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--layers", type=int, default=2)
    args = ap.parse_args()
    path = make_model(
        args.out, vocab_size=args.vocab, hidden=args.hidden, layers=args.layers,
        quant=GGMLType[args.quant],
    )
    print(path)
