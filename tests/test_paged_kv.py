"""Paged KV cache: append/gather parity vs the dense cache, allocator
bookkeeping (refcounts + prefix dedup), and the paged decode-attention
kernel (interpret mode) vs the XLA attention reference.

Reference analog: llama_kv_cache cells + seq sharing
(/root/reference/cpp/src/llama.cpp:2495-2540).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import booster_tpu.ops.pallas_paged_attention as ppa
from booster_tpu.ops.attention import attention
from booster_tpu.ops.kv_cache import KVCache, _quantize_kv, update_layer
from booster_tpu.ops.paged_kv import (
    PageAllocator,
    PagedKVCache,
    append_paged_layer,
    gather_layer,
    scatter_layer,
)


@pytest.fixture(autouse=True)
def _interpret():
    ppa.INTERPRET = True
    yield
    ppa.INTERPRET = False


def seq_tables(B, maxp):
    """Identity mapping: slot b owns pages [b*maxp, (b+1)*maxp)."""
    return jnp.asarray(
        np.arange(B * maxp, dtype=np.int32).reshape(B, maxp))


@pytest.mark.parametrize("quantized", [False, True])
def test_append_matches_dense(quantized):
    B, Hkv, D, P, maxp = 2, 2, 64, 128, 2
    S = P * maxp
    rng = np.random.default_rng(0)
    paged = PagedKVCache.create(1, B, S, Hkv, D, quantized=quantized,
                                page_size=P)
    dense = KVCache.create(1, B, S, Hkv, D, quantized=quantized)
    table = seq_tables(B, maxp)

    pk, pv, pks, pvs = (paged.k[0], paged.v[0],
                        None if not quantized else paged.k_scale[0],
                        None if not quantized else paged.v_scale[0])
    dk, dv, dks, dvs = (dense.k[0], dense.v[0],
                        None if not quantized else dense.k_scale[0],
                        None if not quantized else dense.v_scale[0])

    # a multi-token prefill at mixed offsets, then a single-token decode
    for T, offs in (((5), [0, 0]), ((1), [5, 5]), ((3), [6, 6])):
        new_k = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
        new_v = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
        offsets = jnp.asarray(np.asarray(offs, np.int32))
        pk, pv, pks, pvs = append_paged_layer(
            pk, pv, new_k, new_v, offsets, table, pks, pvs)
        dk, dv, dks, dvs = update_layer(dk, dv, new_k, new_v, offsets, dks, dvs)

    # both storages are lane-padded (kv_cache.pad_head_dim); compare the
    # logical lanes AND the pad lanes (exact zeros in both)
    np.testing.assert_array_equal(np.asarray(gather_layer(pk, table)),
                                  np.asarray(dk))
    np.testing.assert_array_equal(np.asarray(gather_layer(pv, table)),
                                  np.asarray(dv))
    if quantized:
        np.testing.assert_array_equal(
            np.asarray(gather_layer(pks, table)), np.asarray(dks))


def test_append_crosses_page_boundary():
    B, Hkv, D, P, maxp = 1, 1, 64, 128, 3
    rng = np.random.default_rng(1)
    paged = PagedKVCache.create(1, B, P * maxp, Hkv, D, page_size=P)
    # non-contiguous physical pages: logical order 2, 0, 1
    table = jnp.asarray(np.array([[2, 0, 1]], np.int32))
    T = 2 * P + 7  # spans all three pages
    new_k = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    new_v = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    pk, pv, _, _ = append_paged_layer(
        paged.k[0], paged.v[0], new_k, new_v,
        jnp.zeros(B, jnp.int32), table)
    got = np.asarray(gather_layer(pk, table))[0, :, :T, :D]  # [Hkv, T, D]
    want = np.asarray(new_k.astype(jnp.bfloat16)).transpose(0, 2, 1, 3)[0]
    np.testing.assert_array_equal(got, want)


def test_gather_scatter_roundtrip():
    B, Hkv, D, P, maxp = 2, 2, 64, 128, 2
    rng = np.random.default_rng(2)
    pool = jnp.asarray(
        rng.normal(size=(B * maxp, Hkv, P, D)).astype(np.float32))
    table = seq_tables(B, maxp)
    dense = gather_layer(pool, table)
    pool2 = scatter_layer(jnp.zeros_like(pool), table, dense)
    np.testing.assert_array_equal(np.asarray(pool2), np.asarray(pool))


def test_allocator_refcounts_and_dedup():
    al = PageAllocator(8, page_size=4)
    ids = list(range(11))  # 2 full pages + tail
    a = al.alloc(3)
    assert al.n_free == 5
    al.publish_prefix(ids, a[:2])

    # a second request with the same leading chain finds both full pages
    pages, n = al.lookup_prefix(ids + [99])
    assert pages == a[:2] and n == 8
    al.retain(pages)
    assert al.refcount[a[0]] == 2

    # divergent chain shares nothing
    assert al.lookup_prefix([7] + ids)[1] == 0

    # release the original owner: pages stay resident (refcount 1) and
    # still hashed; release the sharer too → hashed pages become CACHED
    # (still discoverable, evicted lazily under allocation pressure)
    al.release(a)
    assert al.n_free == 6  # a[2] freed; a[0], a[1] still shared
    pages2, n2 = al.lookup_prefix(ids)
    assert pages2 == a[:2] and n2 == 8
    al.release(a[:2])
    assert al.n_free == 8  # 6 free + 2 cached
    pages3, n3 = al.lookup_prefix(ids)
    assert pages3 == a[:2] and n3 == 8  # cached pages still hit
    al.retain(pages3)  # revive
    assert al.refcount[a[0]] == 1 and al.n_free == 6
    al.release(pages3)
    # allocation pressure evicts the cached pages and drops their hashes
    got = al.alloc(8)
    assert got is not None and len(got) == 8
    assert al.lookup_prefix(ids)[1] == 0


def paged_case(B, Hkv, G, D, P, maxp, seed=0, share=False, quantized=False):
    """Build a pool + tables; optionally slots 0 and 1 share their first
    (full) page — the dedup layout the scheduler produces."""
    rng = np.random.default_rng(seed)
    H = Hkv * G
    S = P * maxp
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)).astype(np.float32))
    tbl = np.arange(B * maxp, dtype=np.int32).reshape(B, maxp)
    if share:
        tbl[1, 0] = tbl[0, 0]
    table = jnp.asarray(tbl)
    Np = B * maxp
    kf = rng.normal(size=(Np, Hkv, P, D)).astype(np.float32)
    vf = rng.normal(size=(Np, Hkv, P, D)).astype(np.float32)
    lens = np.minimum(rng.integers(1, S, B), S).astype(np.int32)
    if share:
        lens[0] = max(lens[0], P)  # shared page fully valid for slot 0
        lens[1] = max(lens[1], P)
    if quantized:
        kq, ks = _quantize_kv(jnp.asarray(kf))
        vq, vs = _quantize_kv(jnp.asarray(vf))
        pools = (kq, vq, ks, vs)
        kd = (kq.astype(jnp.float32) * ks).astype(jnp.bfloat16)
        vd = (vq.astype(jnp.float32) * vs).astype(jnp.bfloat16)
    else:
        pools = (jnp.asarray(kf, jnp.bfloat16), jnp.asarray(vf, jnp.bfloat16),
                 None, None)
        kd, vd = pools[0], pools[1]
    dense_k = gather_layer(kd, table)
    dense_v = gather_layer(vd, table)
    return q, pools, table, jnp.asarray(lens), dense_k, dense_v


def ref_attention(q, k, v, lens, scale, softcap=0.0, window=None):
    qpos = (lens - 1)[:, None]
    return attention(
        q.astype(jnp.bfloat16), k, v, qpos, lens, scale,
        logit_softcap=softcap, sliding_window=window,
    )


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("share", [False, True])
def test_paged_attention_matches_xla(quantized, share):
    B, Hkv, G, D, P, maxp = 4, 2, 2, 64, 128, 2
    q, pools, table, lens, dk, dv = paged_case(
        B, Hkv, G, D, P, maxp, share=share, quantized=quantized)
    scale = 0.125
    ref = ref_attention(q, dk, dv, lens, scale)
    out = ppa.paged_decode_attention(
        q, *pools, table, lens, scale)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


def test_paged_attention_window_and_softcap():
    B, Hkv, G, D, P, maxp = 2, 1, 4, 64, 128, 2
    q, pools, table, lens, dk, dv = paged_case(B, Hkv, G, D, P, maxp, seed=3)
    scale = 0.1
    ref = ref_attention(q, dk, dv, lens, scale, softcap=30.0,
                        window=jnp.int32(96))
    out = ppa.paged_decode_attention(
        q, *pools, table, lens, scale, logit_softcap=30.0,
        window=jnp.int32(96))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


def test_paged_attention_scattered_tables():
    """Non-contiguous, permuted physical pages give the same result as the
    dense gather (the whole point of paging)."""
    B, Hkv, G, D, P, maxp = 2, 2, 2, 64, 128, 3
    rng = np.random.default_rng(7)
    q, pools, _, lens, _, _ = paged_case(B, Hkv, G, D, P, maxp, seed=7)
    perm = rng.permutation(B * maxp).astype(np.int32).reshape(B, maxp)
    table = jnp.asarray(perm)
    dk = gather_layer(pools[0] if pools[2] is None else
                      (pools[0].astype(jnp.float32) * pools[2]).astype(jnp.bfloat16),
                      table)
    dv = gather_layer(pools[1], table)
    scale = 0.125
    ref = ref_attention(q, dk, dv, lens, scale)
    out = ppa.paged_decode_attention(q, *pools, table, lens, scale)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


# ---------------- merged stacked paged kernel (r5) ----------------

def stacked_paged_case(B, Hkv, G, D, P, maxp, L, seed=0, quantized=False):
    rng = np.random.default_rng(seed)
    H = Hkv * G
    S = P * maxp
    lay = L - 1
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)).astype(np.float32))
    tbl = rng.permutation(B * maxp).astype(np.int32).reshape(B, maxp)
    table = jnp.asarray(tbl)
    Np = B * maxp
    kf = rng.normal(size=(L, Np, Hkv, P, D)).astype(np.float32)
    vf = rng.normal(size=(L, Np, Hkv, P, D)).astype(np.float32)
    lens = np.minimum(rng.integers(1, S - 1, B), S).astype(np.int32)
    if quantized:
        kq, ks = _quantize_kv(jnp.asarray(kf))
        vq, vs = _quantize_kv(jnp.asarray(vf))
        pools = (kq, vq, ks, vs)
        kd = (kq[lay].astype(jnp.float32) * ks[lay]).astype(jnp.bfloat16)
        vd = (vq[lay].astype(jnp.float32) * vs[lay]).astype(jnp.bfloat16)
    else:
        pools = (jnp.asarray(kf, jnp.bfloat16), jnp.asarray(vf, jnp.bfloat16),
                 None, None)
        kd, vd = pools[0][lay], pools[1][lay]
    dk, dv = gather_layer(kd, table), gather_layer(vd, table)
    return q, pools, table, lay, jnp.asarray(lens), dk, dv


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_stacked_merged_matches_xla(quantized):
    """The r5 merged kernel (head-folded DMA, block-diagonal dot, nv
    steering) matches the dense masked softmax for multi-head GQA shapes.
    P and D are 128-multiples so the merged path engages (not the
    unrolled fallback)."""
    assert ppa._MERGED_P
    B, Hkv, G, D, P, maxp, L = 8, 2, 4, 128, 128, 3, 2
    q, pools, table, lay, lens, dk, dv = stacked_paged_case(
        B, Hkv, G, D, P, maxp, L, seed=11, quantized=quantized)
    scale = 0.125
    ref = ref_attention(q, dk, dv, lens, scale)
    out = ppa.paged_decode_attention_stacked(
        q, *pools, table, jnp.int32(lay), lens, scale)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


def test_paged_stacked_merged_window_softcap_and_prep():
    B, Hkv, G, D, P, maxp, L = 4, 2, 2, 128, 128, 2, 2
    q, pools, table, lay, lens, dk, dv = stacked_paged_case(
        B, Hkv, G, D, P, maxp, L, seed=5)
    scale = 0.1
    win = jnp.int32(96)
    ref = ref_attention(q, dk, dv, lens, scale, softcap=30.0, window=win)
    prep = ppa.paged_decode_prep(lens, win, B=B, P=P, MAXP=maxp)
    out = ppa.paged_decode_attention_stacked(
        q, *pools, table, jnp.int32(lay), lens, scale,
        logit_softcap=30.0, window=win, prep=prep)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


def test_paged_stacked_merged_deferred_self():
    """Deferred-append self term (mirror-quantized) through the merged
    kernel == append-then-attend over the dense view."""
    B, Hkv, G, D, P, maxp, L = 4, 2, 2, 128, 128, 2, 2
    rng = np.random.default_rng(9)
    q, pools, table, lay, lens, dk, dv = stacked_paged_case(
        B, Hkv, G, D, P, maxp, L, seed=9, quantized=True)
    scale = 0.125
    nk = rng.normal(size=(B, Hkv, D)).astype(np.float32)
    nv = rng.normal(size=(B, Hkv, D)).astype(np.float32)
    ok = jnp.ones((B,), jnp.int32)

    def mirror(x):  # storage round-trip (int8 per (row, head))
        sc = np.max(np.abs(x), axis=-1, keepdims=True) / 127.0
        return np.round(x / np.maximum(sc, 1e-12)) * sc

    bi = np.arange(B)[:, None, None]
    hi = np.arange(Hkv)[None, :, None]
    si = np.asarray(lens)[:, None, None]
    dk2 = np.asarray(dk, np.float32)
    dv2 = np.asarray(dv, np.float32)
    dk2[bi, hi, si] = mirror(nk)[:, :, None][bi, hi, 0]
    dv2[bi, hi, si] = mirror(nv)[:, :, None][bi, hi, 0]
    ref = ref_attention(q, jnp.asarray(dk2), jnp.asarray(dv2),
                        lens + 1, scale)
    out = ppa.paged_decode_attention_stacked(
        q, *pools, table, jnp.int32(lay), lens, scale,
        self_kv=(jnp.asarray(nk), jnp.asarray(nv), ok))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_fused_append_matches_scatter(quantized):
    """kv_append_all_layers_paged == the XLA scatter path on the valid
    region (window-clobbered rows past each slot's offset are future
    positions, never read)."""
    import booster_tpu.ops.pallas_kv as pk
    from booster_tpu.ops.paged_kv import paged_append_all_layers

    pk.INTERPRET = True  # scoped: update_layer elsewhere must stay XLA
    rng = np.random.default_rng(3)
    L, B, Hkv, P, D, maxp = 2, 4, 2, 128, 128, 2
    Np = B * maxp
    table = jnp.asarray(rng.permutation(Np).astype(np.int32).reshape(B, maxp))
    kf = jnp.asarray(rng.normal(size=(L, Np, Hkv, P, D)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(L, Np, Hkv, P, D)).astype(np.float32))
    new_k = jnp.asarray(rng.normal(size=(L, B, Hkv, D)).astype(np.float32))
    new_v = jnp.asarray(rng.normal(size=(L, B, Hkv, D)).astype(np.float32))
    offs = jnp.asarray(np.array([0, 7, 130, 255], np.int32))
    if quantized:
        k, ks = _quantize_kv(kf)
        v, vs = _quantize_kv(vf)
    else:
        k, v = kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16)
        ks = vs = None
    try:
        got = pk.kv_append_all_layers_paged(k, v, new_k, new_v, offs, table,
                                            ks, vs)
    finally:
        pk.INTERPRET = False
    want = paged_append_all_layers(k, v, new_k, new_v, offs, table, ks, vs)
    offs_np, tbl_np = np.asarray(offs), np.asarray(table)
    for b in range(B):
        page = tbl_np[b, offs_np[b] // P]
        o = offs_np[b] % P
        for g, w, name in zip(got, want, ("k", "v", "ks", "vs")):
            if g is None:
                assert w is None
                continue
            np.testing.assert_allclose(
                np.asarray(g, np.float32)[:, page, :, o],
                np.asarray(w, np.float32)[:, page, :, o],
                atol=1e-5, err_msg=f"{name} b={b}")
