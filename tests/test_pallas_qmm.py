"""Pallas fused dequant-matmul vs the XLA dequant reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import booster_tpu.ops.pallas_qmm as pq
from booster_tpu.gguf.constants import GGMLType
from booster_tpu.quant import quantize, repack_gguf_tensor
from booster_tpu.quant.qtensor import dequantize_qtensor


@pytest.fixture(autouse=True)
def interpret_mode():
    pq.INTERPRET = True
    yield
    pq.INTERPRET = False


RNG = np.random.default_rng(0)


def make_qt(fmt, N, K):
    w = RNG.standard_normal((N, K)).astype(np.float32) * 0.1
    qt = repack_gguf_tensor(quantize(w, fmt), fmt, (N, K))
    return qt.astype_device()


def reference(x, qt):
    wd = dequantize_qtensor(qt, dtype=jnp.float32)
    return (x.astype(jnp.float32) @ wd.T).astype(np.float32)


@pytest.mark.parametrize("fmt,kind", [
    (GGMLType.Q4_0, "i4p"),
    (GGMLType.Q4_K, "i4p"),
    (GGMLType.Q8_0, "i8"),
    (GGMLType.Q6_K, "i8"),
    (GGMLType.Q5_K, "i8"),
])
@pytest.mark.parametrize("M", [1, 8])
def test_qmm_matches_reference(fmt, kind, M):
    N, K = 256, 512
    qt = make_qt(fmt, N, K)
    assert qt.kind == kind
    x = jnp.asarray(RNG.standard_normal((M, K)).astype(np.float32))
    got = np.asarray(pq.qmm(x, qt))
    want = np.asarray(reference(x, qt))
    assert got.shape == (M, N)
    # kernel computes in bf16 inputs x f32 accum; reference in f32
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


@pytest.mark.parametrize("M", [512, 2048, 300])
def test_qmm_large_m_tiled(M):
    """Prefill shapes: the M-tiled grid streams 4-bit weights (no dequant
    fallback); 300 exercises the pad-to-256-multiple path."""
    N, K = 256, 512
    for fmt in (GGMLType.Q4_0, GGMLType.Q8_0):
        qt = make_qt(fmt, N, K)
        x = jnp.asarray(RNG.standard_normal((M, K)).astype(np.float32) * 0.3)
        got = np.asarray(pq.qmm(x, qt))
        want = np.asarray(reference(x, qt))
        assert got.shape == (M, N)
        np.testing.assert_allclose(got, want, atol=0.08, rtol=0.08)


def test_qmm_batch_shape():
    qt = make_qt(GGMLType.Q4_0, 256, 512)
    x = jnp.asarray(RNG.standard_normal((2, 3, 512)).astype(np.float32))
    y = pq.qmm(x, qt)
    assert y.shape == (2, 3, 256)


def test_qmm_unaligned_falls_back():
    # N=96 not lane aligned → XLA fallback path, still correct
    qt = make_qt(GGMLType.Q8_0, 96, 512)
    x = jnp.asarray(RNG.standard_normal((4, 512)).astype(np.float32))
    got = np.asarray(pq.qmm(x, qt))
    want = np.asarray(reference(x, qt))
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


# ---------------- K-major (transposed) layout ----------------

from booster_tpu.quant.qtensor import (dequantize_qtensor_np,  # noqa: E402
                                       prepare_kernel_scales,
                                       transpose_qtensor,
                                       untranspose_qtensor)


def make_qt_host(fmt, N, K):
    w = RNG.standard_normal((N, K)).astype(np.float32) * 0.1
    return repack_gguf_tensor(quantize(w, fmt), fmt, (N, K))


@pytest.mark.parametrize("fmt,kind", [
    (GGMLType.Q4_0, "i4t"),
    (GGMLType.Q4_K, "i4t"),
    (GGMLType.Q8_0, "i8t"),
    (GGMLType.Q6_K, "i8t"),
    (GGMLType.Q5_K, "i8t"),
])
@pytest.mark.parametrize("M", [1, 8])
def test_tqmm_matches_reference(fmt, kind, M):
    N, K = 256, 512
    qt = transpose_qtensor(make_qt_host(fmt, N, K)).astype_device()
    assert qt.kind == kind and qt.transposed
    x = jnp.asarray(RNG.standard_normal((M, K)).astype(np.float32))
    got = np.asarray(pq.qmm(x, qt))
    want = np.asarray(reference(x, qt))
    assert got.shape == (M, N)
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


@pytest.mark.parametrize("M", [512, 300])
def test_tqmm_large_m_tiled(M):
    N, K = 256, 512
    for fmt in (GGMLType.Q4_0, GGMLType.Q8_0):
        qt = transpose_qtensor(make_qt_host(fmt, N, K)).astype_device()
        x = jnp.asarray(RNG.standard_normal((M, K)).astype(np.float32) * 0.3)
        got = np.asarray(pq.qmm(x, qt))
        want = np.asarray(reference(x, qt))
        assert got.shape == (M, N)
        np.testing.assert_allclose(got, want, atol=0.08, rtol=0.08)


@pytest.mark.parametrize("fmt", [GGMLType.Q4_0, GGMLType.Q4_K, GGMLType.Q8_0,
                                 GGMLType.Q6_K, GGMLType.Q2_K, GGMLType.Q3_K])
def test_transpose_roundtrip_lossless(fmt):
    """transpose_qtensor is a pure relayout: dequantization is bit-identical
    through transpose and untranspose."""
    qt = make_qt_host(fmt, 128, 512)
    want = dequantize_qtensor_np(qt)
    tq = transpose_qtensor(qt)
    np.testing.assert_array_equal(dequantize_qtensor_np(tq), want)
    back = untranspose_qtensor(tq)
    np.testing.assert_array_equal(dequantize_qtensor_np(back), want)
    # prepared-scales invariants the kernels rely on
    assert tq.qw.shape[-1] == qt.shape[0]
    assert tq.scales.shape[-1] == qt.shape[0]


def test_tqmm_stacked_layers():
    """Stacked [L, ...] transposed tensors slice per layer under lax.scan."""
    from booster_tpu.models.loader import _stack_qtensors

    N, K, L = 256, 512, 3
    qts = [make_qt_host(GGMLType.Q4_0, N, K) for _ in range(L)]
    stacked = transpose_qtensor(prepare_kernel_scales(_stack_qtensors(qts)))
    assert stacked.qw.shape == (L, K // 2, N)
    x = jnp.asarray(RNG.standard_normal((4, K)).astype(np.float32))

    def body(c, lq):
        return c, pq.qmm(x, lq)

    _, ys = jax.lax.scan(body, 0, stacked.astype_device())
    for i in range(L):
        want = reference(x, transpose_qtensor(qts[i]).astype_device())
        np.testing.assert_allclose(np.asarray(ys[i]), want, atol=0.05, rtol=0.05)


@pytest.mark.parametrize("fmt", [GGMLType.Q4_0, GGMLType.Q4_K, GGMLType.Q8_0])
def test_compact_scales_bit_identical_kernel(fmt):
    """bf16 scale storage (quant.qtensor.compact_scales) is bit-identical
    through the t-kernels: they round scales to bf16 in-kernel regardless,
    so pre-rounding at load changes no kernel output bit."""
    from booster_tpu.quant.qtensor import compact_scales

    N, K = 256, 512
    qt = transpose_qtensor(make_qt_host(fmt, N, K))
    cq = compact_scales(qt)
    assert cq.scales.dtype.itemsize == 2
    x = jnp.asarray(RNG.standard_normal((8, K)).astype(np.float32))
    got_f32 = np.asarray(pq.qmm(x, qt.astype_device()))
    got_bf16 = np.asarray(pq.qmm(x, cq.astype_device()))
    np.testing.assert_array_equal(got_f32, got_bf16)


@pytest.mark.parametrize("fmt", [GGMLType.Q4_0, GGMLType.Q4_K, GGMLType.Q8_0])
def test_tqmm_stacked_layer_view(fmt):
    """Stacked tensors passed WHOLE with a traced `layer` view: the kernels
    select the layer via scalar-prefetch index maps instead of an XLA
    dynamic-slice (which copies the layer's weights before every call —
    tools/slice_probe.py measured 2x).  Every layer must match its own
    reference."""
    from booster_tpu.models.loader import _stack_qtensors

    N, K, L = 256, 512, 3
    qts = [make_qt_host(fmt, N, K) for _ in range(L)]
    stacked = transpose_qtensor(prepare_kernel_scales(_stack_qtensors(qts)))
    dev = stacked.astype_device()
    x = jnp.asarray(RNG.standard_normal((4, K)).astype(np.float32))

    import dataclasses

    for i in range(L):
        view = dataclasses.replace(dev, layer=jnp.int32(i))
        got = np.asarray(pq.qmm(x, view))
        # the unstacked kernel on the same layer: identical math, so the
        # stacked scalar-prefetch path must agree to fp exactness
        want = np.asarray(pq.qmm(
            x, transpose_qtensor(prepare_kernel_scales(qts[i])).astype_device()))
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6,
                                   err_msg=f"layer {i}")


def test_i8c_stacked_layer_view():
    from booster_tpu.models.loader import _stack_qtensors
    from booster_tpu.quant.qtensor import channel_quantize

    N, K, L = 256, 512, 3
    qts = [channel_quantize(make_qt_host(GGMLType.Q8_0, N, K))
           for _ in range(L)]
    stacked = _stack_qtensors(qts).astype_device()
    assert stacked.qw.shape == (L, K, N)
    x = jnp.asarray(RNG.standard_normal((4, K)).astype(np.float32))

    import dataclasses

    for i in range(L):
        view = dataclasses.replace(stacked, layer=jnp.int32(i))
        got = np.asarray(pq.qmm(x, view))
        want = np.asarray(pq.qmm(x, qts[i].astype_device()))
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6,
                                   err_msg=f"layer {i}")


def test_stacked_layer_view_in_scan():
    """The serving shape: whole stacked tensor closed over, per-iteration
    traced index — matches per-layer references token-for-token."""
    from booster_tpu.models.loader import _stack_qtensors

    N, K, L = 256, 512, 3
    qts = [make_qt_host(GGMLType.Q4_0, N, K) for _ in range(L)]
    dev = transpose_qtensor(
        prepare_kernel_scales(_stack_qtensors(qts))).astype_device()
    x = jnp.asarray(RNG.standard_normal((4, K)).astype(np.float32))

    import dataclasses

    def body(c, i):
        view = dataclasses.replace(dev, layer=i)
        return c, pq.qmm(x, view)

    _, ys = jax.lax.scan(body, 0, jnp.arange(L, dtype=jnp.int32))
    for i in range(L):
        want = np.asarray(pq.qmm(
            x, transpose_qtensor(prepare_kernel_scales(qts[i])).astype_device()))
        np.testing.assert_allclose(np.asarray(ys[i]), want, atol=1e-6,
                                   rtol=1e-6)


def _gateup_unfused(x, qt, act="silu"):
    gu = pq.qmm(x, qt)
    ff = gu.shape[-1] // 2
    gu = gu.astype(jnp.bfloat16)  # qlinear's astype(x.dtype) with bf16 h
    if act == "gelu":
        g = jax.nn.gelu(gu[..., :ff].astype(jnp.float32),
                        approximate=True).astype(jnp.bfloat16)
    else:
        # models.llama._act's decomposition (sigmoid in f32, rounded before
        # the product — the form Mosaic can lower; see _gateup_i8_kernel)
        gb = gu[..., :ff]
        g = gb * jax.lax.logistic(gb.astype(jnp.float32)).astype(jnp.bfloat16)
    return np.asarray(g * gu[..., ff:])


@pytest.mark.parametrize("fmt", [GGMLType.Q8_0, GGMLType.Q4_0,
                                 GGMLType.Q4_K, GGMLType.Q5_K])
@pytest.mark.parametrize("act", ["silu", "gelu"])
@pytest.mark.parametrize("M", [1, 8])
def test_gateup_epilogue_bit_exact(fmt, act, M):
    """qmm_gateup (fused act·mul epilogue) == qlinear + _act + mul,
    bit for bit: same sub-tile accumulation order, same bf16 rounding —
    across i8t (q8_0/q5_K incl. affine mins) and i4t (q4_0/q4_K)."""
    from booster_tpu.quant.qtensor import (prepare_kernel_scales,
                                           transpose_qtensor)

    ff, K = 256, 512
    w = RNG.standard_normal((2 * ff, K)).astype(np.float32) * 0.1
    qt = transpose_qtensor(
        repack_gguf_tensor(quantize(w, fmt), fmt,
                           (2 * ff, K))).astype_device()
    x = jnp.asarray(RNG.standard_normal((M, K)).astype(np.float32) * 0.2,
                    jnp.bfloat16)
    got = pq.qmm_gateup(x, qt, act)
    assert got is not None and got.dtype == jnp.bfloat16
    want = _gateup_unfused(x, qt, act)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_gateup_epilogue_stacked_layer_view():
    """The stacked [L, ...] gateup payload with a traced layer index feeds
    the fused kernel whole (scalar-prefetch select, no per-layer slice)."""
    from booster_tpu.models.loader import _stack_qtensors
    from booster_tpu.quant.qtensor import (prepare_kernel_scales,
                                           transpose_qtensor)

    ff, K, L = 128, 512, 3
    qts = []
    ws = []
    for _ in range(L):
        w = RNG.standard_normal((2 * ff, K)).astype(np.float32) * 0.1
        ws.append(w)
        qts.append(repack_gguf_tensor(quantize(w, GGMLType.Q8_0),
                                      GGMLType.Q8_0, (2 * ff, K)))
    stacked = transpose_qtensor(_stack_qtensors(qts)).astype_device()
    x = jnp.asarray(RNG.standard_normal((4, K)).astype(np.float32) * 0.2,
                    jnp.bfloat16)

    def body(c, i):
        import dataclasses
        lq = dataclasses.replace(stacked, layer=i)
        return c, pq.qmm_gateup(x, lq, "silu")

    _, ys = jax.lax.scan(body, 0, jnp.arange(L))
    for i in range(L):
        single = transpose_qtensor(
            repack_gguf_tensor(quantize(ws[i], GGMLType.Q8_0), GGMLType.Q8_0,
                               (2 * ff, K))).astype_device()
        want = _gateup_unfused(x, single, "silu")
        np.testing.assert_array_equal(np.asarray(ys[i]), want)


def _mlp_unfused(x, qt_gu, qt_down, act="silu"):
    """Reference: qmm_gateup-equivalent mid, then the unfused down qmm,
    rounded to bf16 (qlinear's astype(x.dtype) — the model's cast point)."""
    mid = jnp.asarray(_gateup_unfused(x, qt_gu, act), jnp.bfloat16)
    return np.asarray(pq.qmm(mid, qt_down).astype(jnp.bfloat16).astype(jnp.float32))


def _mk_t(w, fmt):
    from booster_tpu.quant.qtensor import transpose_qtensor

    return transpose_qtensor(
        repack_gguf_tensor(quantize(w, fmt), fmt, w.shape)).astype_device()


@pytest.mark.parametrize("act", ["silu", "gelu"])
@pytest.mark.parametrize("M", [1, 8])
def test_mlp_fused_bit_exact(act, M):
    """qmm_mlp (whole-MLP kernel) == qmm_gateup + unfused down, bit for
    bit: same sub-tile accumulation orders, same bf16 rounding points."""
    ff, K, C = 512, 512, 256
    w_gu = RNG.standard_normal((2 * ff, K)).astype(np.float32) * 0.1
    w_d = RNG.standard_normal((C, ff)).astype(np.float32) * 0.1
    qt_gu = _mk_t(w_gu, GGMLType.Q8_0)
    qt_d = _mk_t(w_d, GGMLType.Q8_0)
    x = jnp.asarray(RNG.standard_normal((M, K)).astype(np.float32) * 0.2,
                    jnp.bfloat16)
    got = pq.qmm_mlp(x, qt_gu, qt_d, act)
    assert got is not None and got.dtype == jnp.bfloat16
    want = _mlp_unfused(x, qt_gu, qt_d, act)
    np.testing.assert_array_equal(np.asarray(got, np.float32), want)


def test_mlp_fused_paired_scale_block(monkeypatch):
    """BF < 16 groups: the down scale block covers TWO ff steps (bf16
    sublane tiling) and the kernel selects the f%2 half — exact."""
    monkeypatch.setattr(pq, "_pick_bf_mlp", lambda *a, **k: 256)
    ff, K, C = 1024, 512, 256
    w_gu = RNG.standard_normal((2 * ff, K)).astype(np.float32) * 0.1
    w_d = RNG.standard_normal((C, ff)).astype(np.float32) * 0.1
    qt_gu = _mk_t(w_gu, GGMLType.Q8_0)
    qt_d = _mk_t(w_d, GGMLType.Q8_0)
    x = jnp.asarray(RNG.standard_normal((4, K)).astype(np.float32) * 0.2,
                    jnp.bfloat16)
    got = pq.qmm_mlp(x, qt_gu, qt_d, "silu")
    assert got is not None
    want = _mlp_unfused(x, qt_gu, qt_d, "silu")
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=2e-2, atol=2e-2)


def test_mlp_fused_stacked_layer_view():
    """Stacked [L, ...] gateup+down payloads with a traced layer index feed
    the whole-MLP kernel (scalar-prefetch select, no per-layer slice)."""
    from booster_tpu.models.loader import _stack_qtensors
    from booster_tpu.quant.qtensor import transpose_qtensor

    ff, K, C, L = 512, 512, 256, 3
    gus, ds, wgs, wds = [], [], [], []
    for _ in range(L):
        wg = RNG.standard_normal((2 * ff, K)).astype(np.float32) * 0.1
        wd = RNG.standard_normal((C, ff)).astype(np.float32) * 0.1
        wgs.append(wg)
        wds.append(wd)
        gus.append(repack_gguf_tensor(quantize(wg, GGMLType.Q8_0),
                                      GGMLType.Q8_0, (2 * ff, K)))
        ds.append(repack_gguf_tensor(quantize(wd, GGMLType.Q8_0),
                                     GGMLType.Q8_0, (C, ff)))
    st_gu = transpose_qtensor(_stack_qtensors(gus)).astype_device()
    st_d = transpose_qtensor(_stack_qtensors(ds)).astype_device()
    x = jnp.asarray(RNG.standard_normal((4, K)).astype(np.float32) * 0.2,
                    jnp.bfloat16)

    def body(c, i):
        import dataclasses
        lgu = dataclasses.replace(st_gu, layer=i)
        ld = dataclasses.replace(st_d, layer=i)
        return c, pq.qmm_mlp(x, lgu, ld, "silu")

    _, ys = jax.lax.scan(body, 0, jnp.arange(L))
    for i in range(L):
        want = _mlp_unfused(x, _mk_t(wgs[i], GGMLType.Q8_0),
                            _mk_t(wds[i], GGMLType.Q8_0), "silu")
        np.testing.assert_array_equal(np.asarray(ys[i], np.float32), want)


@pytest.mark.parametrize("M", [1, 8])
def test_mlp_fused_affine_mins(M):
    """Affine i8 formats (q5_K: scales AND mins) through the whole-MLP
    kernel: the min term rides as a group-sum dot (_min_corr) in both the
    gate/up and the down contractions.  Parity vs the unfused path is
    allclose (the correction is applied per ff-step, a different f32 add
    order than the unfused per-K-block form)."""
    ff, K, C = 512, 512, 256
    w_gu = RNG.standard_normal((2 * ff, K)).astype(np.float32) * 0.1
    w_d = RNG.standard_normal((C, ff)).astype(np.float32) * 0.1
    qt_gu = _mk_t(w_gu, GGMLType.Q5_K)
    qt_d = _mk_t(w_d, GGMLType.Q5_K)
    x = jnp.asarray(RNG.standard_normal((M, K)).astype(np.float32) * 0.2,
                    jnp.bfloat16)
    got = pq.qmm_mlp(x, qt_gu, qt_d, "silu")
    assert got is not None
    want = _mlp_unfused(x, qt_gu, qt_d, "silu")
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("fmt,kind", [
    (GGMLType.Q4_0, "i4t"),
    (GGMLType.Q4_K, "i4t"),
    (GGMLType.Q8_0, "i8t"),
    (GGMLType.Q5_K, "i8t"),
])
def test_tqmm_group_dot_vs_dequant_kernels(fmt, kind, monkeypatch):
    """The M=1 group-dot path (raw-payload dots + per-group f32 rescale)
    agrees with the dequant kernels — allclose, not bit-equal: the group
    partials are exact integer dots so the gd form is MORE accurate."""
    N, K = 256, 512
    qt = transpose_qtensor(make_qt_host(fmt, N, K)).astype_device()
    x = jnp.asarray(RNG.standard_normal((1, K)).astype(np.float32))
    monkeypatch.setattr(pq, "_GROUP_DOT", True)
    got_gd = np.asarray(pq.qmm(x, qt))
    monkeypatch.setattr(pq, "_GROUP_DOT", False)
    got_dq = np.asarray(pq.qmm(x, qt))
    np.testing.assert_allclose(got_gd, got_dq, atol=0.05, rtol=0.05)
    want = np.asarray(reference(x, qt))
    assert (np.abs(got_gd - want).mean()
            <= np.abs(got_dq - want).mean() + 1e-3)


@pytest.mark.parametrize("fmt", [GGMLType.Q4_0, GGMLType.Q4_K,
                                 GGMLType.Q8_0, GGMLType.Q5_K])
def test_tqmm_group_dot_stacked_m1(fmt):
    """M=1 stacked layer views through the group-dot kernels (the serving
    decode hot path: scalar-prefetch layer select + gd)."""
    from booster_tpu.models.loader import _stack_qtensors

    N, K, L = 256, 512, 3
    qts = [make_qt_host(fmt, N, K) for _ in range(L)]
    stacked = transpose_qtensor(prepare_kernel_scales(_stack_qtensors(qts)))
    dev = stacked.astype_device()
    x = jnp.asarray(RNG.standard_normal((1, K)).astype(np.float32))

    import dataclasses

    for i in range(L):
        view = dataclasses.replace(dev, layer=jnp.int32(i))
        got = np.asarray(pq.qmm(x, view))
        # the unstacked gd kernel on the same layer: identical math
        want = np.asarray(pq.qmm(
            x,
            transpose_qtensor(prepare_kernel_scales(qts[i])).astype_device()))
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6,
                                   err_msg=f"layer {i}")
