"""Fused KV-append kernel parity vs the XLA dynamic_update_slice path.

Cache head dims are lane-padded to multiples of 128 by the storage layer
(ops/kv_cache.pad_head_dim); the kernels require that and zero-pad narrower
new rows themselves.
"""

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


def _xla_update(k, v, new_k, new_v, offs, ks, vs):
    import os

    os.environ["BT_FUSED_KV"] = "0"
    try:
        return update_layer(k, v, new_k, new_v, offs, ks, vs)
    finally:
        os.environ["BT_FUSED_KV"] = "1"


def _assert_valid_region(got, want, offs, S):
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
        for b in range(len(offs_np)):
            lim = int(offs_np[b]) + 1
            np.testing.assert_allclose(
                g[b, :, :lim], w[b, :, :lim], atol=1e-5,
                err_msg=f"{name} b={b}",
            )


@pytest.mark.parametrize("quantized", [False, True])
def test_kv_append_matches_xla(quantized):
    rng = np.random.default_rng(0)
    B, H, S, D = 4, 2, 128, 128
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
    want = _xla_update(k, v, new_k, new_v, offs, ks, vs)
    _assert_valid_region(got, want, offs, S)


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("D", [128, 256])
def test_kv_append_stacked_layer_select(quantized, D):
    """Stacked-cache append: writes land only in the scalar-prefetched layer;
    the selected layer matches the per-layer-slice path bit for bit and the
    other layers are untouched."""
    rng = np.random.default_rng(11)
    L, B, H, S = 3, 2, 2, 128
    lay = 1
    if quantized:
        k = jnp.asarray(rng.integers(-127, 127, (L, B, H, S, D)).astype(np.int8))
        v = jnp.asarray(rng.integers(-127, 127, (L, B, H, S, D)).astype(np.int8))
        ks = jnp.asarray(rng.random((L, B, H, S, 1)).astype(np.float32))
        vs = jnp.asarray(rng.random((L, B, H, S, 1)).astype(np.float32))
    else:
        k = jnp.asarray(rng.normal(size=(L, B, H, S, D)).astype(np.float32)).astype(jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(L, B, H, S, D)).astype(np.float32)).astype(jnp.bfloat16)
        ks = vs = None
    new_k = jnp.asarray(rng.normal(size=(B, 1, H, D)).astype(np.float32))
    new_v = jnp.asarray(rng.normal(size=(B, 1, H, D)).astype(np.float32))
    offs = jnp.asarray(np.array([7, 64], np.int32))

    got = pk.kv_append_decode_stacked(
        k, v, new_k, new_v, offs, jnp.int32(lay), ks, vs)
    want = pk.kv_append_decode(
        k[lay], v[lay], new_k, new_v, offs,
        None if ks is None else ks[lay],
        None if vs is None else vs[lay])
    inputs = (k, v, ks, vs)
    offs_np = np.asarray(offs)
    for g, w, src, name in zip(got, want, inputs, ("k", "v", "ks", "vs")):
        if g is None:
            assert w is None
            continue
        g = np.asarray(g, np.float32)
        w = np.asarray(w, np.float32)
        src = np.asarray(src, np.float32)
        for ll in range(L):
            if ll != lay:  # other layers byte-identical to the input
                np.testing.assert_array_equal(g[ll], src[ll],
                                              err_msg=f"{name} layer {ll}")
        for b in range(B):
            lim = int(offs_np[b]) + 1
            np.testing.assert_allclose(
                g[lay, b, :, :lim], w[b, :, :lim], atol=1e-5,
                err_msg=f"{name} b={b}",
            )


@pytest.mark.parametrize("quantized", [False, True])
def test_kv_append_narrow_rows_lane_padded(quantized):
    """D=64 logical rows into a 128-lane-padded cache: the kernel zero-pads
    the new rows; lanes >= 64 of written positions are exact zeros and the
    logical lanes match the XLA path."""
    rng = np.random.default_rng(3)
    B, H, S, Dl, Dc = 2, 2, 128, 64, 128
    if quantized:
        k = jnp.zeros((B, H, S, Dc), jnp.int8)
        v = jnp.zeros((B, H, S, Dc), jnp.int8)
        ks = jnp.zeros((B, H, S, 1), jnp.float32)
        vs = jnp.zeros((B, H, S, 1), jnp.float32)
    else:
        k = jnp.zeros((B, H, S, Dc), jnp.bfloat16)
        v = jnp.zeros((B, H, S, Dc), jnp.bfloat16)
        ks = vs = None
    new_k = jnp.asarray(rng.normal(size=(B, 1, H, Dl)).astype(np.float32))
    new_v = jnp.asarray(rng.normal(size=(B, 1, H, Dl)).astype(np.float32))
    offs = jnp.asarray(np.array([7, 10], np.int32))

    got = pk.kv_append_decode(k, v, new_k, new_v, offs, ks, vs)
    want = _xla_update(k, v, new_k, new_v, offs, ks, vs)
    _assert_valid_region(got, want, offs, S)
    offs_np = np.asarray(offs)
    for g, name in zip(got[:2], ("k", "v")):
        g = np.asarray(g, np.float32)
        for b in range(B):
            pos = int(offs_np[b])
            assert (g[b, :, pos, Dl:] == 0).all(), f"{name} pad lanes b={b}"


@pytest.mark.parametrize("quantized", [False, True])
def test_kv_append_all_layers_matches_per_layer(quantized):
    """Deferred all-layer append == per-layer stacked appends."""
    rng = np.random.default_rng(17)
    L, B, H, S, D = 3, 2, 2, 128, 128
    if quantized:
        k = jnp.asarray(rng.integers(-127, 127, (L, B, H, S, D)).astype(np.int8))
        v = jnp.asarray(rng.integers(-127, 127, (L, B, H, S, D)).astype(np.int8))
        ks = jnp.asarray(rng.random((L, B, H, S, 1)).astype(np.float32))
        vs = jnp.asarray(rng.random((L, B, H, S, 1)).astype(np.float32))
    else:
        k = jnp.asarray(rng.normal(size=(L, B, H, S, D)).astype(np.float32)).astype(jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(L, B, H, S, D)).astype(np.float32)).astype(jnp.bfloat16)
        ks = vs = None
    new_k = jnp.asarray(rng.normal(size=(L, B, H, D)).astype(np.float32))
    new_v = jnp.asarray(rng.normal(size=(L, B, H, D)).astype(np.float32))
    offs = jnp.asarray(np.array([7, 64], np.int32))

    got = pk.kv_append_all_layers(k, v, new_k, new_v, offs, ks, vs)
    wk, wv, wks, wvs = k, v, ks, vs
    for lay in range(L):
        wk, wv, wks, wvs = pk.kv_append_decode_stacked(
            wk, wv, new_k[lay][:, None], new_v[lay][:, None], offs,
            jnp.int32(lay), wks, wvs)
    offs_np = np.asarray(offs)
    for g, w, name in zip(got, (wk, wv, wks, wvs), ("k", "v", "ks", "vs")):
        if g is None:
            assert w is None
            continue
        g = np.asarray(g, np.float32)
        w = np.asarray(w, np.float32)
        for b in range(B):
            lim = int(offs_np[b]) + 1
            np.testing.assert_allclose(
                g[:, b, :, :lim], w[:, b, :, :lim], atol=1e-5,
                err_msg=f"{name} b={b}",
            )
