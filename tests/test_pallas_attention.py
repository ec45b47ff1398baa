"""Fused decode-attention kernel parity vs the XLA attention path.

Runs the Pallas kernel in interpreter mode on CPU and checks numerics
against ops.attention.attention on the dequantized cache.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import booster_tpu.ops.pallas_attention as pa
from booster_tpu.ops.attention import attention
from booster_tpu.ops.kv_cache import _quantize_kv


@pytest.fixture(autouse=True, params=[True, False], ids=["merged", "unrolled"])
def _interpret(request, monkeypatch):
    # run every case through BOTH kernel variants: the merged block-diagonal
    # dot and the per-b unrolled fallback
    monkeypatch.setattr(pa, "_MERGED", request.param)
    pa.INTERPRET = True
    yield
    pa.INTERPRET = False


def make_case(B=4, Hkv=2, G=2, S=256, D=64, seed=0, lens=None):
    rng = np.random.default_rng(seed)
    H = Hkv * G
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
    if lens is None:
        lens = rng.integers(1, S, B)
    lens = jnp.asarray(np.asarray(lens, np.int32))
    return q, k, v, lens


def ref_attention(q, k, v, lens, scale, softcap=0.0, window=None):
    B = q.shape[0]
    qpos = (lens - 1)[:, None]  # decode: query sits at the last valid pos
    return attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        qpos, lens, scale, logit_softcap=softcap,
        sliding_window=window,
    )


@pytest.mark.parametrize("quantized", [False, True])
def test_decode_attention_matches_xla(quantized):
    q, k, v, lens = make_case()
    scale = 0.125
    if quantized:
        # cache layout [B, H, S, D]: quantize per (token, head)
        kq, ks = _quantize_kv(k)
        vq, vs = _quantize_kv(v)
        kd = (kq.astype(jnp.float32) * ks).astype(jnp.bfloat16)
        vd = (vq.astype(jnp.float32) * vs).astype(jnp.bfloat16)
        ref = ref_attention(q, kd, vd, lens, scale)
        out = pa.decode_attention(q, kq, vq, ks, vs, lens, scale)
    else:
        ref = ref_attention(q, k, v, lens, scale)
        out = pa.decode_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), None, None, lens, scale)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_decode_attention_multi_s_tiles(monkeypatch):
    monkeypatch.setattr(pa, "_ST", 128)  # force online-softmax accumulation
    q, k, v, lens = make_case(S=512, seed=3)
    ref = ref_attention(q, k, v, lens, 0.2)
    out = pa.decode_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), None, None, lens, 0.2)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_decode_attention_skips_invalid_tail_tiles(monkeypatch):
    """Rows far shorter than the allocated cache: tiles past each batch
    tile's max valid length are steered to the last valid tile (DMA elided)
    and skipped — results must still match the full masked softmax."""
    monkeypatch.setattr(pa, "_ST", 128)
    monkeypatch.setattr(pa, "_BT", 2)  # lens [5, 500] share one batch tile
    q, k, v, lens = make_case(B=4, S=1024, seed=9, lens=[5, 500, 128, 1])
    ref = ref_attention(q, k, v, lens, 0.15)
    out = pa.decode_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), None, None, lens, 0.15)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_decode_attention_sliding_window_and_softcap():
    q, k, v, lens = make_case(B=2, S=128, seed=5, lens=[100, 128])
    window = 32
    ref = ref_attention(q, k, v, lens, 0.1, softcap=30.0,
                        window=jnp.int32(window))
    out = pa.decode_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), None, None, lens, 0.1,
        logit_softcap=30.0, window=jnp.int32(window))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_decode_attention_skips_leading_window_tiles(monkeypatch):
    """Sliding window deep into a long cache: S tiles wholly before every
    row's window start are steered to the first live tile (DMA elided) and
    skipped — results must still match the full masked softmax."""
    monkeypatch.setattr(pa, "_ST", 128)
    monkeypatch.setattr(pa, "_BT", 2)
    q, k, v, lens = make_case(B=4, S=1024, seed=13, lens=[900, 1000, 640, 130])
    window = 128
    ref = ref_attention(q, k, v, lens, 0.15, window=jnp.int32(window))
    out = pa.decode_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), None, None, lens, 0.15,
        window=jnp.int32(window))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_decode_attention_mha_group1():
    q, k, v, lens = make_case(B=2, Hkv=4, G=1, S=128, seed=7)
    ref = ref_attention(q, k, v, lens, 0.125)
    out = pa.decode_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), None, None, lens, 0.125)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


@pytest.mark.parametrize("quantized", [False, True])
def test_decode_attention_stacked_layer_select(quantized):
    """L>1 stacked cache: the kernel attends over exactly the scalar-
    prefetched layer's slice (every layer holds different data)."""
    L, lay = 3, 2
    rng = np.random.default_rng(21)
    B, Hkv, G, S, D = 2, 2, 2, 256, 64
    H = Hkv * G
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)).astype(np.float32))
    lens = jnp.asarray(np.array([100, 256], np.int32))
    scale = 0.125
    if quantized:
        kq, ks = _quantize_kv(k.reshape(L * B, Hkv, S, D))
        vq, vs = _quantize_kv(v.reshape(L * B, Hkv, S, D))
        kq = kq.reshape(L, B, Hkv, S, D); vq = vq.reshape(L, B, Hkv, S, D)
        ks = ks.reshape(L, B, Hkv, S, 1); vs = vs.reshape(L, B, Hkv, S, 1)
        kd = (kq[lay].astype(jnp.float32) * ks[lay]).astype(jnp.bfloat16)
        vd = (vq[lay].astype(jnp.float32) * vs[lay]).astype(jnp.bfloat16)
        ref = ref_attention(q, kd, vd, lens, scale)
        out = pa.decode_attention_stacked(
            q, kq, vq, ks, vs, jnp.int32(lay), lens, scale)
    else:
        ref = ref_attention(q, k[lay], v[lay], lens, scale)
        out = pa.decode_attention_stacked(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), None, None, jnp.int32(lay), lens, scale)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


@pytest.mark.parametrize("kv_quantized", [False, True])
def test_forward_stacked_decode_matches_xla(tmp_path, kv_quantized):
    """Whole-model stacked-cache decode (full cache as scan carry, layer
    selected by scalar prefetch) vs the XLA attention path.  D=64 and
    S%128==0 so _use_stacked_decode engages once both kernel gates are on."""
    import booster_tpu.ops.pallas_kv as pk
    from booster_tpu.models import load_model
    from booster_tpu.models.llama import forward, _use_stacked_decode
    from booster_tpu.ops.kv_cache import KVCache, pad_head_dim
    from booster_tpu.ops import linear
    from tools.make_test_model import make_model

    path = str(tmp_path / "tiny64.gguf")
    make_model(path, vocab_size=256, hidden=128, layers=3, heads=2, kv_heads=2)
    m = load_model(path)
    assert m.cfg.head_dim == 64

    def run():
        cache = KVCache.create(
            m.cfg.n_layers, 2, 128, m.cfg.n_kv_heads, m.cfg.head_dim,
            quantized=kv_quantized,
        )
        prompt = jnp.asarray(np.arange(16, dtype=np.int32)[None, :].repeat(2, 0))
        logits, cache = forward(m.params, m.cfg, prompt, cache, last_only=True)
        tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
        logits2, cache = forward(m.params, m.cfg, tok, cache, last_only=True)
        return np.asarray(logits2[:, -1, :], np.float32)

    old = linear._USE_PALLAS
    try:
        linear.set_use_pallas(False)
        pa.INTERPRET = False
        jax.clear_caches()  # INTERPRET isn't in the jit key: force retrace
        ref = run()  # XLA path (both kernel gates off)
        pa.INTERPRET = True
        pk.INTERPRET = True
        assert _use_stacked_decode(m.cfg, 1, 128, pad_head_dim(m.cfg.head_dim))
        jax.clear_caches()
        stacked = run()
    finally:
        linear.set_use_pallas(old)
        pk.INTERPRET = False
        jax.clear_caches()
    np.testing.assert_allclose(stacked, ref, atol=0.05, rtol=0.05)


@pytest.mark.parametrize("kv_quantized", [False, True])
def test_forward_fused_decode_matches_xla(tmp_path, kv_quantized):
    """Whole-model decode step: fused kernel path vs XLA attention path."""
    from booster_tpu.models import load_model
    from booster_tpu.models.llama import forward
    from booster_tpu.ops.kv_cache import KVCache
    from booster_tpu.ops import linear
    from tools.make_test_model import make_model

    path = str(tmp_path / "tiny.gguf")
    make_model(path, vocab_size=256, hidden=128, layers=2)
    m = load_model(path)

    def run():
        cache = KVCache.create(
            m.cfg.n_layers, 2, 128, m.cfg.n_kv_heads, m.cfg.head_dim,
            quantized=kv_quantized,
        )
        prompt = jnp.asarray(np.arange(16, dtype=np.int32)[None, :].repeat(2, 0))
        logits, cache = forward(m.params, m.cfg, prompt, cache, last_only=True)
        tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
        logits2, cache = forward(m.params, m.cfg, tok, cache, last_only=True)
        return np.asarray(logits2[:, -1, :], np.float32)

    old = linear._USE_PALLAS
    try:
        linear.set_use_pallas(False)
        # fused gate off: use_pallas False + INTERPRET off (the autouse
        # fixture turns it on, flip back).  INTERPRET isn't part of the jit
        # cache key, so clear_caches() forces a genuine retrace per mode.
        pa.INTERPRET = False
        jax.clear_caches()
        ref = run()
        pa.INTERPRET = True
        jax.clear_caches()
        fused = run()  # INTERPRET on → _use_fused_decode engages on CPU
    finally:
        linear.set_use_pallas(old)
        jax.clear_caches()
    np.testing.assert_allclose(fused, ref, atol=0.05, rtol=0.05)


def test_int8_kv_accuracy_bounded():
    """int8 KV degradation vs bf16 KV is bounded (the reference gates
    quantized KV behind flash-attn validity; here we quantify the error)."""
    q, k, v, lens = make_case(B=4, S=256, seed=11)
    scale = 0.125
    exact = ref_attention(q, k, v, lens, scale)
    kq, ks = _quantize_kv(k)
    vq, vs = _quantize_kv(v)
    out = pa.decode_attention(q, kq, vq, ks, vs, lens, scale)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(exact, np.float32))
    rel = err.max() / (np.abs(np.asarray(exact)).max() + 1e-9)
    assert rel < 0.05, f"int8 KV relative error {rel:.4f} too large"


@pytest.mark.parametrize("quantized", [False, True])
def test_decode_attention_self_term(quantized):
    """Deferred-append self term == appending the row first and attending,
    including the inactive-row gate (self_ok=0 rows ignore their new token)."""
    import booster_tpu.ops.pallas_kv as pk_mod
    from booster_tpu.ops.pallas_kv import kv_append_decode_stacked

    pk_mod.INTERPRET = True
    try:
        rng = np.random.default_rng(31)
        L, lay, B, Hkv, G, S, D = 2, 1, 2, 2, 2, 256, 128
        H = Hkv * G
        q = jnp.asarray(rng.normal(size=(B, 1, H, D)).astype(np.float32))
        lens = jnp.asarray(np.array([100, 255], np.int32))
        self_ok = jnp.asarray(np.array([True, False]))
        new_k = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)).astype(np.float32))
        new_v = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)).astype(np.float32))
        scale = 0.125
        kf = rng.normal(size=(L, B, Hkv, S, D)).astype(np.float32)
        vf = rng.normal(size=(L, B, Hkv, S, D)).astype(np.float32)
        if quantized:
            kq, ks = _quantize_kv(jnp.asarray(kf.reshape(L * B, Hkv, S, D)))
            vq, vs = _quantize_kv(jnp.asarray(vf.reshape(L * B, Hkv, S, D)))
            kc = kq.reshape(L, B, Hkv, S, D); vc = vq.reshape(L, B, Hkv, S, D)
            ksc = ks.reshape(L, B, Hkv, S, 1); vsc = vs.reshape(L, B, Hkv, S, 1)
        else:
            kc = jnp.asarray(kf, jnp.bfloat16); vc = jnp.asarray(vf, jnp.bfloat16)
            ksc = vsc = None

        # reference: append the new row at lens, then attend with lens+ok
        ak, av, aks, avs = kv_append_decode_stacked(
            kc, vc, new_k, new_v, lens, jnp.int32(lay), ksc, vsc)
        lens_after = lens + self_ok.astype(jnp.int32)
        ref = pa.decode_attention_stacked(
            q, ak, av, aks, avs, jnp.int32(lay), lens_after, scale)

        got = pa.decode_attention_stacked(
            q, kc, vc, ksc, vsc, jnp.int32(lay), lens, scale,
            self_kv=(new_k.reshape(B, Hkv, D), new_v.reshape(B, Hkv, D),
                     self_ok))
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )
    finally:
        pk_mod.INTERPRET = False


def _prefill_case(B=2, Hkv=2, G=2, S=256, T=32, D=128, seed=17, lens=None):
    rng = np.random.default_rng(seed)
    H = Hkv * G
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
    if lens is None:
        lens = rng.integers(T, S, B)
    lens = jnp.asarray(np.asarray(lens, np.int32))
    return q, k, v, lens


def ref_prefill(q, k, v, lens, scale, softcap=0.0, window=None, pos0=None):
    B, T = q.shape[:2]
    if pos0 is None:
        pos0 = lens - T
    qpos = pos0[:, None] + jnp.arange(T)[None, :]
    return attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), qpos, lens, scale,
        logit_softcap=softcap, sliding_window=window,
    )


@pytest.mark.parametrize("quantized", [True, False])
def test_prefill_attention_matches_xla(quantized):
    q, k, v, lens = _prefill_case()
    scale = 0.125
    if quantized:
        kq, ks = _quantize_kv(k)
        vq, vs = _quantize_kv(v)
        kd = (kq.astype(jnp.float32) * ks).astype(jnp.bfloat16)
        vd = (vq.astype(jnp.float32) * vs).astype(jnp.bfloat16)
        ref = ref_prefill(q, kd, vd, lens, scale)
        out = pa.prefill_attention(q, kq, vq, ks, vs, lens, scale)
    else:
        ref = ref_prefill(q, k, v, lens, scale)
        out = pa.prefill_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), None, None, lens, scale)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_prefill_attention_window_softcap_multitile():
    q, k, v, lens = _prefill_case(B=2, S=512, T=128, seed=23,
                                  lens=[200, 512])
    kq, ks = _quantize_kv(k)
    vq, vs = _quantize_kv(v)
    kd = (kq.astype(jnp.float32) * ks).astype(jnp.bfloat16)
    vd = (vq.astype(jnp.float32) * vs).astype(jnp.bfloat16)
    ref = ref_prefill(q, kd, vd, lens, 0.1, softcap=30.0,
                      window=jnp.int32(64))
    out = pa.prefill_attention(q, kq, vq, ks, vs, lens, 0.1,
                               logit_softcap=30.0, window=jnp.int32(64))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_prefill_attention_padded_rows_pos0():
    """Right-padded prefill rows (n_valid < T): pos0 is the pre-append
    cache length, padding queries sit past the valid range and attend the
    full prefix (engine semantics)."""
    q, k, v, lens = _prefill_case(B=2, S=256, T=64, seed=29,
                                  lens=[100, 256])
    pos0 = jnp.asarray([100 - 40, 256 - 64], jnp.int32)  # row 0: 40 real
    kq, ks = _quantize_kv(k)
    vq, vs = _quantize_kv(v)
    kd = (kq.astype(jnp.float32) * ks).astype(jnp.bfloat16)
    vd = (vq.astype(jnp.float32) * vs).astype(jnp.bfloat16)
    ref = ref_prefill(q, kd, vd, lens, 0.2, pos0=pos0)
    out = pa.prefill_attention(q, kq, vq, ks, vs, lens, 0.2, pos0=pos0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )
