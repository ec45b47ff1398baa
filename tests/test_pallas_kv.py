"""Fused KV-append kernel parity vs the XLA dynamic_update_slice path."""

import numpy as np
import pytest

import jax.numpy as jnp

import booster_tpu.ops.pallas_kv as pk
from booster_tpu.ops.kv_cache import update_layer


@pytest.fixture(autouse=True)
def _interpret():
    pk.INTERPRET = True
    yield
    pk.INTERPRET = False


@pytest.mark.parametrize("quantized", [False, True])
def test_kv_append_matches_xla(quantized):
    rng = np.random.default_rng(0)
    B, H, S, D = 4, 2, 128, 64
    if quantized:
        k = jnp.asarray(rng.integers(-127, 127, (B, H, S, D)).astype(np.int8))
        v = jnp.asarray(rng.integers(-127, 127, (B, H, S, D)).astype(np.int8))
        ks = jnp.asarray(rng.random((B, H, S, 1)).astype(np.float32))
        vs = jnp.asarray(rng.random((B, H, S, 1)).astype(np.float32))
    else:
        k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32)).astype(jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32)).astype(jnp.bfloat16)
        ks = vs = None
    new_k = jnp.asarray(rng.normal(size=(B, 1, H, D)).astype(np.float32))
    new_v = jnp.asarray(rng.normal(size=(B, 1, H, D)).astype(np.float32))
    offs = jnp.asarray(np.array([0, 5, 127, 200], np.int32))  # incl. clamp case

    got = pk.kv_append_decode(k, v, new_k, new_v, offs, ks, vs)
    import os
    os.environ["BT_FUSED_KV"] = "0"
    try:
        want = update_layer(k, v, new_k, new_v, offs, ks, vs)
    finally:
        os.environ["BT_FUSED_KV"] = "1"

    # the kernel's RMW window clobbers positions AFTER the write offset
    # (future rows, never read: attention masks cols >= kv_valid) — compare
    # only the valid region [0, off] per row
    offs_np = np.minimum(np.asarray(offs), S - 1)
    for g, w, name in zip(got, want, ("k", "v", "ks", "vs")):
        if g is None:
            assert w is None
            continue
        g = np.asarray(g, np.float32)
        w = np.asarray(w, np.float32)
        for b in range(B):
            lim = int(offs_np[b]) + 1
            np.testing.assert_allclose(
                g[b, :, :lim], w[b, :, :lim], atol=1e-5,
                err_msg=f"{name} b={b}",
            )


@pytest.mark.parametrize("quantized", [False, True])
def test_kv_append_paired_d64(quantized):
    """D=64 lane-pairing path: adjacent positions share a 128-lane row."""
    rng = np.random.default_rng(3)
    B, H, S, D = 2, 2, 128, 64
    if quantized:
        k = jnp.asarray(rng.integers(-127, 127, (B, H, S, D)).astype(np.int8))
        v = jnp.asarray(rng.integers(-127, 127, (B, H, S, D)).astype(np.int8))
        ks = jnp.asarray(rng.random((B, H, S, 1)).astype(np.float32))
        vs = jnp.asarray(rng.random((B, H, S, 1)).astype(np.float32))
    else:
        k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32)).astype(jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32)).astype(jnp.bfloat16)
        ks = vs = None
    new_k = jnp.asarray(rng.normal(size=(B, 1, H, D)).astype(np.float32))
    new_v = jnp.asarray(rng.normal(size=(B, 1, H, D)).astype(np.float32))
    offs = jnp.asarray(np.array([7, 10], np.int32))  # odd + even offsets

    got = pk.kv_append_decode(k, v, new_k, new_v, offs, ks, vs)
    import os
    os.environ["BT_FUSED_KV"] = "0"
    try:
        want = update_layer(k, v, new_k, new_v, offs, ks, vs)
    finally:
        os.environ["BT_FUSED_KV"] = "1"
    offs_np = np.asarray(offs)
    for g, w, name in zip(got, want, ("k", "v", "ks", "vs")):
        if g is None:
            assert w is None
            continue
        g = np.asarray(g, np.float32)
        w = np.asarray(w, np.float32)
        for b in range(B):
            lim = int(offs_np[b]) + 1
            np.testing.assert_allclose(
                g[b, :, :lim], w[b, :, :lim], atol=1e-5,
                err_msg=f"{name} b={b}",
            )
