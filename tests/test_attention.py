"""Chunked (online-softmax) attention vs dense reference."""

import numpy as np

import jax.numpy as jnp

import importlib

att = importlib.import_module("booster_tpu.ops.attention")


def run_both(B=1, T=64, S=1024, H=4, Hkv=2, D=32, window=None, softcap=0.0):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)).astype(np.float32))
    pos = jnp.asarray(np.tile(np.arange(100, 100 + T, dtype=np.int32), (B, 1)))
    valid = jnp.asarray(np.full(B, 100 + T, np.int32))
    dense = att.attention(q, k, v, pos, valid, scale=0.1,
                          logit_softcap=softcap, sliding_window=window)
    chunked = att._attention_chunked(q, k, v, pos, valid, scale=0.1,
                                     logit_softcap=softcap, sliding_window=window)
    return np.asarray(dense), np.asarray(chunked)


def test_chunked_matches_dense():
    dense, chunked = run_both()
    np.testing.assert_allclose(chunked, dense, atol=2e-2, rtol=2e-2)


def test_chunked_with_window_and_softcap():
    dense, chunked = run_both(window=jnp.int32(64), softcap=30.0)
    np.testing.assert_allclose(chunked, dense, atol=2e-2, rtol=2e-2)


def test_chunked_dispatch_threshold(monkeypatch):
    # force the chunked path through the public entry and compare to dense
    monkeypatch.setattr(att, "_CHUNK_THRESHOLD", 1)
    dense_forced_chunk = run_both()[0]  # att.attention now routes chunked
    monkeypatch.undo()
    dense = run_both()[0]
    np.testing.assert_allclose(dense_forced_chunk, dense, atol=2e-2, rtol=2e-2)
