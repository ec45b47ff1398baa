#!/usr/bin/env python
"""On-chip Pallas kernel smoke battery (VERDICT r4 next #2).

Compiles and runs ONE small tile of every Pallas entry point on the real
device (no interpret mode — interpret skips Mosaic lowering entirely, which
is exactly how r4 shipped a chip-crashing paged kernel while its tests were
green).  Each smoke checks numerics against a pure-XLA reference.

Run before committing any kernel change:

    python tools/kernel_smoke.py            # all kernels, ~2 min warm
    python tools/kernel_smoke.py --only paged
    python tools/kernel_smoke.py --list

Exit code is nonzero if ANY kernel fails — never swallow it in a pipeline
(use `set -o pipefail` if filtering output).

Reference analog: the reference compiles its CUDA kernels at build time so a
broken kernel can't ship silently (cpp/ggml/src/ggml-cuda/*.cu); Pallas
kernels only lower when traced on a real backend, so this battery is the
moral equivalent of its build step.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

RNG = np.random.default_rng(0)
SMOKES = []


def smoke(name):
    def deco(fn):
        SMOKES.append((name, fn))
        return fn
    return deco


def _close(got, want, atol=5e-2, rtol=5e-2, what=""):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol,
                               err_msg=what)


# ---------------- quantized matmul family ----------------

def _make_qt(fmt, N, K, transposed=False, prepared=True, stack=0):
    from booster_tpu.quant import quantize, repack_gguf_tensor
    from booster_tpu.quant.qtensor import (prepare_kernel_scales,
                                           transpose_qtensor)

    def one(seed):
        rng = np.random.default_rng(seed)
        w = rng.standard_normal((N, K)).astype(np.float32) * 0.1
        return repack_gguf_tensor(quantize(w, fmt), fmt, (N, K))

    if stack:
        from booster_tpu.models.loader import _stack_qtensors
        qt = _stack_qtensors([one(s) for s in range(stack)])
    else:
        qt = one(0)
    if prepared:
        qt = prepare_kernel_scales(qt)
    if transposed:
        qt = transpose_qtensor(qt)
    return qt.astype_device()


def _qt_ref(x, qt):
    from booster_tpu.quant.qtensor import dequantize_qtensor
    wd = dequantize_qtensor(qt, dtype=jnp.float32)
    return x.astype(jnp.float32) @ wd.T


def _qmm_case(fmt, transposed, M=8, N=256, K=512):
    import booster_tpu.ops.pallas_qmm as pq
    qt = _make_qt(fmt, N, K, transposed=transposed)
    if transposed:
        assert pq._supported_t(qt, K, M), "dispatch would fall back to XLA"
    else:
        assert pq._supported(qt, K, M), "dispatch would fall back to XLA"
    x = jnp.asarray(RNG.standard_normal((M, K)).astype(np.float32))
    got = pq.qmm(x, qt)
    # atol 0.08: bf16 dequant-rounding tails at sigma=1 inputs sit right at
    # 0.05 for affine formats (both min-dot and subtract paths; measured
    # rms is ~14x BELOW the formats' own quantization error floor)
    _close(got, _qt_ref(x, qt), atol=8e-2,
           what=f"qmm {fmt} transposed={transposed}")


@smoke("qmm_i4p")
def _s_qmm_i4p():
    from booster_tpu.gguf.constants import GGMLType
    _qmm_case(GGMLType.Q4_0, False)


@smoke("qmm_i8")
def _s_qmm_i8():
    from booster_tpu.gguf.constants import GGMLType
    _qmm_case(GGMLType.Q8_0, False)


@smoke("tqmm_i4t")
def _s_tqmm_i4t():
    from booster_tpu.gguf.constants import GGMLType
    _qmm_case(GGMLType.Q4_0, True)
    _qmm_case(GGMLType.Q4_K, True)  # affine mins
    _qmm_case(GGMLType.Q4_0, True, M=1)  # M=1 = group-dot path
    _qmm_case(GGMLType.Q4_K, True, M=1)


@smoke("tqmm_i8t")
def _s_tqmm_i8t():
    from booster_tpu.gguf.constants import GGMLType
    _qmm_case(GGMLType.Q8_0, True)
    _qmm_case(GGMLType.Q6_K, True)
    _qmm_case(GGMLType.Q5_K, True)  # i8 payload with affine mins (min-dot)
    _qmm_case(GGMLType.Q8_0, True, M=1)  # M=1 = group-dot path
    _qmm_case(GGMLType.Q5_K, True, M=1)


@smoke("tqmm_large_m")
def _s_tqmm_large_m():
    from booster_tpu.gguf.constants import GGMLType
    _qmm_case(GGMLType.Q4_0, True, M=512)
    _qmm_case(GGMLType.Q8_0, True, M=512)


@smoke("tqmm_stacked_view")
def _s_tqmm_stacked():
    """Stacked layer select via scalar prefetch — the decode hot path."""
    import dataclasses

    import booster_tpu.ops.pallas_qmm as pq
    from booster_tpu.gguf.constants import GGMLType

    N, K, L = 256, 512, 3
    for fmt in (GGMLType.Q4_0, GGMLType.Q8_0, GGMLType.Q4_K):
        qt = _make_qt(fmt, N, K, transposed=True, stack=L)
        for m in (4, 1):  # m=1 exercises the stacked group-dot path
            x = jnp.asarray(RNG.standard_normal((m, K)).astype(np.float32))
            for lay in (0, L - 1):
                view = dataclasses.replace(qt, layer=jnp.int32(lay))
                got = pq.qmm(x, view)
                one = dataclasses.replace(
                    qt, qw=qt.qw[lay], scales=qt.scales[lay],
                    mins=None if qt.mins is None else qt.mins[lay],
                    layer=None)
                _close(got, _qt_ref(x, one), atol=8e-2,
                       what=f"stacked {fmt} M={m} layer {lay}")


@smoke("i8c")
def _s_i8c():
    import booster_tpu.ops.pallas_qmm as pq
    from booster_tpu.gguf.constants import GGMLType
    from booster_tpu.quant.qtensor import channel_quantize

    qt = channel_quantize(_make_qt(GGMLType.Q8_0, 256, 512))
    assert pq._supported_i8c(qt, 512), "i8c dispatch would fall back"
    x = jnp.asarray(RNG.standard_normal((8, 512)).astype(np.float32))
    got = pq.qmm(x, qt)
    _close(got, _qt_ref(x, qt), what="i8c")


@smoke("gateup")
def _s_gateup():
    import booster_tpu.ops.pallas_qmm as pq
    from booster_tpu.gguf.constants import GGMLType
    from booster_tpu.models.loader import _stack_qtensors  # noqa: F401
    from booster_tpu.quant import quantize, repack_gguf_tensor
    from booster_tpu.quant.qtensor import (prepare_kernel_scales,
                                           transpose_qtensor)

    N2, K = 512, 512  # fused [gate; up] rows
    for fmt in (GGMLType.Q8_0, GGMLType.Q4_K):
        w = RNG.standard_normal((N2, K)).astype(np.float32) * 0.1
        qt = transpose_qtensor(prepare_kernel_scales(
            repack_gguf_tensor(quantize(w, fmt), fmt, (N2, K)))).astype_device()
        for m in (8, 1):  # m=1 exercises the group-dot gateup kernels
            x = jnp.asarray(RNG.standard_normal((m, K)).astype(np.float32))
            got = pq.qmm_gateup(x, qt, "silu")
            assert got is not None, f"qmm_gateup declined {fmt}"
            y = _qt_ref(x, qt)
            g, u = y[:, : N2 // 2], y[:, N2 // 2:]
            want = (g * jax.nn.sigmoid(g)) * u
            # product of two bf16-dequant matmuls: compounded rounding
            _close(got, want, atol=0.25, rtol=0.1,
                   what=f"gateup {fmt} M={m}")


@smoke("mlp_fused")
def _s_mlp():
    import booster_tpu.ops.pallas_qmm as pq
    from booster_tpu.gguf.constants import GGMLType
    from booster_tpu.quant import quantize, repack_gguf_tensor
    from booster_tpu.quant.qtensor import (prepare_kernel_scales,
                                           transpose_qtensor)

    C, F = 256, 512
    for fmt in (GGMLType.Q8_0, GGMLType.Q5_K):  # q5_K: i8 affine (min-dot)

        def mk(w, n, k, fmt=fmt):
            return transpose_qtensor(prepare_kernel_scales(
                repack_gguf_tensor(quantize(w, fmt), fmt,
                                   (n, k)))).astype_device()

        w_gu = RNG.standard_normal((2 * F, C)).astype(np.float32) * 0.1
        w_d = RNG.standard_normal((C, F)).astype(np.float32) * 0.1
        qt_gu, qt_d = mk(w_gu, 2 * F, C), mk(w_d, C, F)
        x = jnp.asarray(RNG.standard_normal((8, C)).astype(np.float32))
        got = pq.qmm_mlp(x, qt_gu, qt_d, "silu")
        assert got is not None, f"qmm_mlp declined {fmt}"
        y = _qt_ref(x, qt_gu)
        g, u = y[:, :F], y[:, F:]
        want = _qt_ref((g * jax.nn.sigmoid(g)) * u, qt_d)
        # compounded rounding across three bf16 matmuls vs an exact-f32
        # chain (q5_K tails ~0.18 on BOTH min paths; same bound as gateup)
        _close(got, want, atol=0.25, rtol=0.1, what=f"mlp fused {fmt}")


# ---------------- attention family ----------------

def _attn_ref(q, k, v, lens, scale, softcap=0.0, window=None):
    from booster_tpu.ops.attention import attention
    qpos = (lens - 1)[:, None]
    return attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                     v.astype(jnp.bfloat16), qpos, lens, scale,
                     logit_softcap=softcap, sliding_window=window)


def _mirror_kv(x, quantized):
    """Storage round-trip the deferred self token (matches kernels)."""
    x = jnp.asarray(x, jnp.float32)
    if not quantized:
        return x.astype(jnp.bfloat16).astype(jnp.float32)
    sc = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    return jnp.round(x / jnp.maximum(sc, 1e-12)) * sc


def _decode_case(quantized, self_term):
    from booster_tpu.ops.kv_cache import _quantize_kv
    import booster_tpu.ops.pallas_attention as pa

    B, Hkv, G, S, D, L = 8, 2, 4, 256, 128, 2
    H = Hkv * G
    lay = 1
    q = jnp.asarray(RNG.normal(size=(B, 1, H, D)).astype(np.float32))
    kf = RNG.normal(size=(L, B, Hkv, S, D)).astype(np.float32)
    vf = RNG.normal(size=(L, B, Hkv, S, D)).astype(np.float32)
    lens = jnp.asarray(RNG.integers(1, S - 1, B).astype(np.int32))
    scale = 0.125
    if quantized:
        kq, ks = _quantize_kv(jnp.asarray(kf))
        vq, vs = _quantize_kv(jnp.asarray(vf))
        kd = (kq[lay].astype(jnp.float32) * ks[lay])
        vd = (vq[lay].astype(jnp.float32) * vs[lay])
        caches = (kq, vq, ks, vs)
    else:
        caches = (jnp.asarray(kf, jnp.bfloat16), jnp.asarray(vf, jnp.bfloat16),
                  None, None)
        kd, vd = jnp.asarray(kf[lay]), jnp.asarray(vf[lay])

    self_kv = None
    ref_lens, ref_k, ref_v = lens, kd, vd
    if self_term:
        nk = RNG.normal(size=(B, Hkv, D)).astype(np.float32)
        nv = RNG.normal(size=(B, Hkv, D)).astype(np.float32)
        ok = jnp.ones((B,), jnp.int32)
        self_kv = (jnp.asarray(nk), jnp.asarray(nv), ok)
        bi = jnp.arange(B)[:, None, None]
        hi = jnp.arange(Hkv)[None, :, None]
        si = lens[:, None, None]
        ref_k = kd.at[bi, hi, si].set(
            _mirror_kv(nk, quantized)[:, :, None])[:, :, : S]
        ref_v = vd.at[bi, hi, si].set(
            _mirror_kv(nv, quantized)[:, :, None])[:, :, : S]
        ref_lens = lens + 1
    want = _attn_ref(q, ref_k, ref_v, ref_lens, scale)
    got = pa.decode_attention_stacked(
        q, *caches, jnp.int32(lay), lens, scale=scale, self_kv=self_kv)
    _close(got, want, what=f"decode quant={quantized} self={self_term}")


@smoke("decode_attn_bf16")
def _s_decode_bf16():
    _decode_case(False, False)


@smoke("decode_attn_int8_self")
def _s_decode_i8_self():
    _decode_case(True, True)  # the config-3 serving shape (deferred append)


@smoke("prefill_attn")
def _s_prefill():
    from booster_tpu.ops.attention import attention
    from booster_tpu.ops.kv_cache import _quantize_kv
    import booster_tpu.ops.pallas_attention as pa

    B, T, Hkv, G, S, D = 2, 64, 2, 4, 256, 128
    H = Hkv * G
    q = jnp.asarray(RNG.normal(size=(B, T, H, D)).astype(np.float32))
    kf = jnp.asarray(RNG.normal(size=(B, Hkv, S, D)).astype(np.float32))
    vf = jnp.asarray(RNG.normal(size=(B, Hkv, S, D)).astype(np.float32))
    lens = jnp.asarray(np.array([T + 10, S], np.int32))  # incl. this chunk
    scale = 0.125
    for quantized in (False, True):
        if quantized:
            kq, ks = _quantize_kv(kf)
            vq, vs = _quantize_kv(vf)
            kd = (kq.astype(jnp.float32) * ks).astype(jnp.bfloat16)
            vd = (vq.astype(jnp.float32) * vs).astype(jnp.bfloat16)
            args = (kq, vq, ks, vs)
        else:
            kd, vd = kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16)
            args = (kd, vd, None, None)
        qpos = (lens - T)[:, None] + jnp.arange(T)[None, :]
        want = attention(q.astype(jnp.bfloat16), kd, vd, qpos, lens, scale)
        got = pa.prefill_attention(q, *args, lens, scale)
        _close(got, want, what=f"prefill quant={quantized}")


# ---------------- kv append family ----------------

@smoke("kv_append_stacked")
def _s_kv_append():
    import booster_tpu.ops.pallas_kv as pk
    from booster_tpu.ops.kv_cache import _quantize_kv

    L, B, H, S, D = 2, 4, 2, 128, 128
    lay = 1
    kf = jnp.asarray(RNG.normal(size=(L, B, H, S, D)).astype(np.float32))
    vf = jnp.asarray(RNG.normal(size=(L, B, H, S, D)).astype(np.float32))
    new_k = jnp.asarray(RNG.normal(size=(B, 1, H, D)).astype(np.float32))
    new_v = jnp.asarray(RNG.normal(size=(B, 1, H, D)).astype(np.float32))
    offs = jnp.asarray(np.array([0, 5, 100, 127], np.int32))
    for quantized in (False, True):
        if quantized:
            k, ks = _quantize_kv(kf)
            v, vs = _quantize_kv(vf)
        else:
            k, v = kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16)
            ks = vs = None
        got = pk.kv_append_decode_stacked(
            k, v, new_k, new_v, offs, jnp.int32(lay), ks, vs)
        gk = np.asarray(got[0], np.float32)
        if quantized:
            gk = gk * np.asarray(got[2], np.float32)
        want_rows = np.asarray(_mirror_kv(new_k[:, 0], quantized))
        for b, o in enumerate(np.asarray(offs)):
            _close(gk[lay, b, :, o], want_rows[b], atol=2e-2, rtol=2e-2,
                   what=f"append quant={quantized} b={b}")


@smoke("kv_append_all_layers")
def _s_kv_append_all():
    import booster_tpu.ops.pallas_kv as pk
    from booster_tpu.ops.kv_cache import _quantize_kv

    L, B, H, S, D = 3, 2, 2, 128, 128
    kf = jnp.asarray(RNG.normal(size=(L, B, H, S, D)).astype(np.float32))
    vf = jnp.asarray(RNG.normal(size=(L, B, H, S, D)).astype(np.float32))
    new_k = jnp.asarray(RNG.normal(size=(L, B, H, D)).astype(np.float32))
    new_v = jnp.asarray(RNG.normal(size=(L, B, H, D)).astype(np.float32))
    offs = jnp.asarray(np.array([7, 64], np.int32))
    for quantized in (False, True):
        if quantized:
            k, ks = _quantize_kv(kf)
            v, vs = _quantize_kv(vf)
        else:
            k, v = kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16)
            ks = vs = None
        got = pk.kv_append_all_layers(k, v, new_k, new_v, offs, ks, vs)
        gk = np.asarray(got[0], np.float32)
        if quantized:
            gk = gk * np.asarray(got[2], np.float32)
        want = np.asarray(_mirror_kv(new_k, quantized))
        for b, o in enumerate(np.asarray(offs)):
            _close(gk[:, b, :, o], want[:, b], atol=2e-2, rtol=2e-2,
                   what=f"append-all quant={quantized} b={b}")


# ---------------- paged attention family ----------------

def _paged_case(quantized, stacked, self_term=False):
    from booster_tpu.ops.kv_cache import _quantize_kv
    from booster_tpu.ops.paged_kv import gather_layer
    import booster_tpu.ops.pallas_paged_attention as ppa

    B, Hkv, G, D, P, maxp, L = 8, 2, 4, 128, 128, 2, 2
    H = Hkv * G
    S = P * maxp
    lay = 1
    q = jnp.asarray(RNG.normal(size=(B, 1, H, D)).astype(np.float32))
    tbl = RNG.permutation(B * maxp).astype(np.int32).reshape(B, maxp)
    table = jnp.asarray(tbl)
    Np = B * maxp
    kf = RNG.normal(size=(L, Np, Hkv, P, D)).astype(np.float32)
    vf = RNG.normal(size=(L, Np, Hkv, P, D)).astype(np.float32)
    lens = jnp.asarray(np.minimum(RNG.integers(1, S - 1, B), S).astype(np.int32))
    scale = 0.125
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

    self_kv = None
    ref_lens = lens
    if self_term:
        nk = RNG.normal(size=(B, Hkv, D)).astype(np.float32)
        nv = RNG.normal(size=(B, Hkv, D)).astype(np.float32)
        ok = jnp.ones((B,), jnp.int32)
        self_kv = (jnp.asarray(nk), jnp.asarray(nv), ok)
        bi = jnp.arange(B)[:, None, None]
        hi = jnp.arange(Hkv)[None, :, None]
        si = lens[:, None, None]
        dk = dk.astype(jnp.float32).at[bi, hi, si].set(
            _mirror_kv(nk, quantized)[:, :, None])[:, :, : S]
        dv = dv.astype(jnp.float32).at[bi, hi, si].set(
            _mirror_kv(nv, quantized)[:, :, None])[:, :, : S]
        ref_lens = lens + 1
    want = _attn_ref(q, dk, dv, ref_lens, scale)
    if stacked:
        got = ppa.paged_decode_attention_stacked(
            q, *pools, table, jnp.int32(lay), lens, scale,
            self_kv=self_kv)
    else:
        flat = tuple(None if p is None else p[lay] for p in pools)
        got = ppa.paged_decode_attention(q, *flat, table, lens, scale)
    _close(got, want,
           what=f"paged quant={quantized} stacked={stacked} self={self_term}")


@smoke("paged_attn_flat")
def _s_paged_flat():
    _paged_case(False, False)
    _paged_case(True, False)


@smoke("paged_attn_stacked")
def _s_paged_stacked():
    _paged_case(False, True)
    _paged_case(True, True)


@smoke("paged_attn_stacked_self")
def _s_paged_stacked_self():
    # the r4 chip-crash shape: deferred append self term (selfok SMEM spec)
    _paged_case(True, True, self_term=True)
    _paged_case(False, True, self_term=True)


@smoke("kv_append_paged")
def _s_kv_append_paged():
    import booster_tpu.ops.pallas_kv as pk
    from booster_tpu.ops.kv_cache import _quantize_kv

    L, B, Hkv, P, D, maxp = 2, 4, 2, 128, 128, 2
    Np = B * maxp
    table = jnp.asarray(
        RNG.permutation(Np).astype(np.int32).reshape(B, maxp))
    kf = jnp.asarray(RNG.normal(size=(L, Np, Hkv, P, D)).astype(np.float32))
    vf = jnp.asarray(RNG.normal(size=(L, Np, Hkv, P, D)).astype(np.float32))
    new_k = jnp.asarray(RNG.normal(size=(L, B, Hkv, D)).astype(np.float32))
    new_v = jnp.asarray(RNG.normal(size=(L, B, Hkv, D)).astype(np.float32))
    offs = jnp.asarray(np.array([7, 127, 128, 200], np.int32))
    offs_np = np.asarray(offs)
    tbl_np = np.asarray(table)
    for quantized in (False, True):
        if quantized:
            k, ks = _quantize_kv(kf)
            v, vs = _quantize_kv(vf)
        else:
            k, v = kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16)
            ks = vs = None
        got = pk.kv_append_all_layers_paged(
            k, v, new_k, new_v, offs, table, ks, vs)
        gk = np.asarray(got[0], np.float32)
        if quantized:
            gk = gk * np.asarray(got[2], np.float32)
        want = np.asarray(_mirror_kv(new_k, quantized))
        for b in range(B):
            page = tbl_np[b, offs_np[b] // P]
            o = offs_np[b] % P
            _close(gk[:, page, :, o], want[:, b], atol=2e-2, rtol=2e-2,
                   what=f"paged append quant={quantized} b={b}")


# ---------------- moe ----------------

@smoke("moe_grouped")
def _s_moe():
    import booster_tpu.ops.pallas_moe as pm
    from booster_tpu.gguf.constants import GGMLType
    from booster_tpu.quant.qtensor import dequantize_qtensor

    E, Ne, K, N, k = 4, 256, 512, 64, 2
    for fmt in (GGMLType.Q4_0, GGMLType.Q8_0):
        w = _make_qt(fmt, E * Ne, K)
        x = jnp.asarray(RNG.standard_normal((N, K)).astype(np.float32) * 0.3)
        top = jnp.asarray(RNG.integers(0, E, (N, k)).astype(np.int32))
        xp, pos, te = pm.route_pad(x, top, E)
        got = np.asarray(pm.grouped_qmm(xp, w, te, E))[np.asarray(pos)]
        wd = np.asarray(dequantize_qtensor(w, dtype=jnp.float32)).reshape(
            E, Ne, K)
        xe = np.asarray(x)
        want = np.stack([
            xe[r // k] @ wd[int(np.asarray(top).reshape(-1)[r])].T
            for r in range(N * k)
        ])
        _close(got, want, what=f"moe {fmt}")


# ---------------- driver ----------------

def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="substring filter on kernel names")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args(argv)

    if args.list:
        for name, _ in SMOKES:
            print(name)
        return 0

    dev = jax.devices()[0]
    print(f"# kernel smoke on {dev.platform} ({dev.device_kind})", flush=True)
    if dev.platform == "cpu":
        print("# WARNING: running on CPU — Mosaic lowering NOT exercised",
              flush=True)

    failures = []
    t_all = time.perf_counter()
    for name, fn in SMOKES:
        if args.only and args.only not in name:
            continue
        # per-case deterministic data: a full run and `--only <case>` must
        # see the SAME draws, or borderline-tolerance elements appear and
        # vanish depending on which earlier cases consumed the stream
        global RNG
        RNG = np.random.default_rng(zlib.crc32(name.encode()))
        t0 = time.perf_counter()
        try:
            fn()
            print(f"PASS {name} ({time.perf_counter() - t0:.1f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report and keep going
            failures.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    print(f"# total {time.perf_counter() - t_all:.1f}s", flush=True)
    if failures:
        print(f"FAILED: {', '.join(failures)}", flush=True)
        return 1
    print("ALL PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
