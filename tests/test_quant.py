"""Quantization format tests.

- hand-built golden blocks check bit-exact decode semantics
- encode→decode round trips bound the quantization error
- QTensor repack must be *lossless*: dequantize(repack(raw)) == dequantize(raw)
"""

import numpy as np
import pytest

from booster_tpu.gguf.constants import GGMLType, QK_K, TYPE_TRAITS
from booster_tpu.quant import dequantize, quantize
from booster_tpu.quant.qtensor import (
    dequantize_qtensor_np,
    repack_gguf_tensor,
    unpack_nibbles_planar,
)

RNG = np.random.default_rng(42)

ENCODE_FORMATS = [
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q8_0,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
]

# worst-case relative error per format (vs per-group amax), generous bounds
ERR_BOUND = {
    GGMLType.Q4_0: 0.20,  # asymmetric grid: clip error up to 1/8 + half-step
    GGMLType.Q4_1: 0.08,
    GGMLType.Q5_0: 0.10,
    GGMLType.Q5_1: 0.05,
    GGMLType.Q8_0: 0.006,
    GGMLType.Q2_K: 0.50,  # 2-bit + 4-bit quantized group scales
    GGMLType.Q3_K: 0.35,
    GGMLType.Q4_K: 0.10,  # 4-bit + 6-bit quantized group scales
    GGMLType.Q5_K: 0.07,
    GGMLType.Q6_K: 0.05,
}


# -- golden decode ----------------------------------------------------------


def test_q4_0_golden():
    """Hand-packed Q4_0 block: d=1.0, codes 0..15 twice → values code-8."""
    d = np.array([1.0], dtype=np.float16).tobytes()
    codes = np.arange(16, dtype=np.uint8)
    qs = (codes | (codes << 4)).tobytes()  # elem j = j, elem j+16 = j
    out = dequantize(d + qs, GGMLType.Q4_0)
    expect = np.concatenate([np.arange(16) - 8.0, np.arange(16) - 8.0])
    np.testing.assert_array_equal(out, expect)


def test_q8_0_golden():
    d = np.array([0.5], dtype=np.float16).tobytes()
    q = np.arange(-16, 16, dtype=np.int8).tobytes()
    out = dequantize(d + q, GGMLType.Q8_0)
    np.testing.assert_array_equal(out, np.arange(-16, 16) * 0.5)


def test_q4_1_golden():
    d = np.array([2.0], dtype=np.float16).tobytes()
    m = np.array([-3.0], dtype=np.float16).tobytes()
    codes = np.arange(16, dtype=np.uint8)
    qs = (codes | (codes << 4)).tobytes()
    out = dequantize(d + m + qs, GGMLType.Q4_1)
    expect = np.concatenate([np.arange(16) * 2.0 - 3.0] * 2)
    np.testing.assert_array_equal(out, expect)


def test_q5_0_golden():
    """High bit j of qh applies to element j (0..15) and j+16 (16..31)."""
    d = np.array([1.0], dtype=np.float16).tobytes()
    qh = np.array([0x0000FFFF], dtype=np.uint32).tobytes()  # elems 0..15 get +16
    qs = bytes(16)  # all nibbles 0
    out = dequantize(d + qh + qs, GGMLType.Q5_0)
    expect = np.concatenate([np.full(16, 0.0), np.full(16, -16.0)])
    np.testing.assert_array_equal(out, expect)


def test_q6_k_golden():
    """All-zero codes decode to -32*d*sc at every position."""
    buf = bytearray(TYPE_TRAITS[GGMLType.Q6_K].type_size)
    buf[192:208] = np.ones(16, dtype=np.int8).tobytes()  # scales = 1
    buf[208:210] = np.array([1.0], dtype=np.float16).tobytes()
    out = dequantize(bytes(buf), GGMLType.Q6_K)
    np.testing.assert_array_equal(out, np.full(QK_K, -32.0))


# -- encode/decode round trip ----------------------------------------------


@pytest.mark.parametrize("fmt", ENCODE_FORMATS)
def test_roundtrip_error(fmt):
    n = QK_K * 8
    x = RNG.standard_normal(n).astype(np.float32) * 3.0
    raw = quantize(x, fmt)
    assert len(raw) == n // TYPE_TRAITS[fmt].block_size * TYPE_TRAITS[fmt].type_size
    y = dequantize(raw, fmt)
    assert y.shape == (n,)
    # error relative to per-32-group amax
    gx = x.reshape(-1, 32)
    gy = y.reshape(-1, 32)
    amax = np.abs(gx).max(axis=1, keepdims=True) + 1e-8
    rel = np.abs(gx - gy) / amax
    assert rel.max() < ERR_BOUND[fmt], f"{fmt.name}: max rel err {rel.max():.4f}"


@pytest.mark.parametrize("fmt", ENCODE_FORMATS)
def test_roundtrip_zeros(fmt):
    x = np.zeros(QK_K * 2, dtype=np.float32)
    y = dequantize(quantize(x, fmt), fmt)
    np.testing.assert_array_equal(y, x)


def test_f16_bf16_passthrough():
    x = RNG.standard_normal(512).astype(np.float32)
    y16 = dequantize(quantize(x, GGMLType.F16), GGMLType.F16)
    np.testing.assert_allclose(y16, x, atol=2e-3, rtol=2e-3)
    yb = dequantize(quantize(x, GGMLType.BF16), GGMLType.BF16)
    np.testing.assert_allclose(yb, x, atol=2e-2, rtol=2e-2)
    y32 = dequantize(quantize(x, GGMLType.F32), GGMLType.F32)
    np.testing.assert_array_equal(y32, x)


# -- QTensor repack is lossless ---------------------------------------------

REPACK_FORMATS = ENCODE_FORMATS  # all repackable formats we can synthesize


@pytest.mark.parametrize("fmt", REPACK_FORMATS)
def test_repack_lossless(fmt):
    out_f, in_f = 4, QK_K * 2
    x = RNG.standard_normal((out_f, in_f)).astype(np.float32) * 2.0
    raw = quantize(x, fmt)
    golden = dequantize(raw, fmt, shape=(out_f, in_f))
    qt = repack_gguf_tensor(raw, fmt, (out_f, in_f))
    assert qt.shape == (out_f, in_f)
    got = dequantize_qtensor_np(qt)
    np.testing.assert_array_equal(got, golden)


def test_repack_iq4_nl_lossless():
    # craft valid IQ4_NL blocks directly: f16 d + random nibbles
    n_blocks = 8
    d = (RNG.standard_normal(n_blocks).astype(np.float16) * 0.1 + 1.0).astype("<f2")
    qs = RNG.integers(0, 256, (n_blocks, 16), dtype=np.uint8)
    raw = b"".join(d[i].tobytes() + qs[i].tobytes() for i in range(n_blocks))
    golden = dequantize(raw, GGMLType.IQ4_NL, shape=(2, 128))
    qt = repack_gguf_tensor(raw, GGMLType.IQ4_NL, (2, 128))
    np.testing.assert_array_equal(dequantize_qtensor_np(qt), golden)


def test_nibble_pack_roundtrip():
    q = RNG.integers(0, 16, (8, 64), dtype=np.uint8)
    from booster_tpu.quant.qtensor import _pack_nibbles_planar

    np.testing.assert_array_equal(unpack_nibbles_planar(_pack_nibbles_planar(q)), q)


def test_bits_per_weight():
    # GGUF density is preserved within QTensor payloads for 4-bit formats
    out_f, in_f = 8, QK_K * 4
    x = RNG.standard_normal((out_f, in_f)).astype(np.float32)
    qt = repack_gguf_tensor(quantize(x, GGMLType.Q4_K), GGMLType.Q4_K, (out_f, in_f))
    assert qt.kind == "i4p"
    assert qt.qw.shape == (out_f, in_f // 2)  # 4 bits/weight payload


@pytest.mark.parametrize("fmt", [GGMLType.Q4_0, GGMLType.Q4_K])
def test_repack_weights_i8_exact(fmt):
    """Runtime i4p→i8 widening is bit-exact: same dequantized values."""
    from booster_tpu.quant.qtensor import repack_weights

    out_f, in_f = 8, QK_K * 4
    x = RNG.standard_normal((out_f, in_f)).astype(np.float32)
    qt = repack_gguf_tensor(quantize(x, fmt), fmt, (out_f, in_f))
    assert qt.kind == "i4p"
    wide = repack_weights(qt, "i8")
    assert wide.kind == "i8" and wide.zero == 0
    np.testing.assert_array_equal(
        dequantize_qtensor_np(wide), dequantize_qtensor_np(qt))


def test_repack_weights_bf16():
    """bf16 repack holds the exact dequantized values (bf16-rounded)."""
    import jax.numpy as jnp

    from booster_tpu.quant.qtensor import repack_weights

    out_f, in_f = 8, 256
    x = RNG.standard_normal((out_f, in_f)).astype(np.float32)
    qt = repack_gguf_tensor(quantize(x, GGMLType.Q4_0), GGMLType.Q4_0,
                            (out_f, in_f))
    dense = repack_weights(qt, "bf16")
    assert dense.kind == "dense" and dense.qw.dtype == jnp.bfloat16
    ref = dequantize_qtensor_np(qt)
    np.testing.assert_allclose(np.asarray(dense.qw, np.float32), ref,
                               rtol=8e-3)


def test_load_model_weights_bf16_parity(tmp_path):
    """Whole-model: weights="bf16" logits match the native quantized path."""
    import jax.numpy as jnp

    from booster_tpu.models import load_model
    from booster_tpu.models.llama import forward
    from booster_tpu.ops.kv_cache import KVCache
    from tools.make_test_model import make_model

    path = str(tmp_path / "tiny.gguf")
    make_model(path, vocab_size=256, hidden=128, layers=2)
    ids = np.arange(12, dtype=np.int32)[None, :]

    def logits(weights):
        m = load_model(path, weights=weights)
        cache = KVCache.create(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads,
                               m.cfg.head_dim)
        out, _ = forward(m.params, m.cfg, jnp.asarray(ids), cache,
                         last_only=True)
        return np.asarray(out, np.float32)

    a = logits("native")
    b = logits("bf16")
    c = logits("i8")
    np.testing.assert_allclose(b, a, atol=0.05, rtol=0.05)
    np.testing.assert_allclose(c, a, atol=0.05, rtol=0.05)


def test_load_model_auto_batch_hint(tmp_path):
    """weights="auto" is batch-aware: small decode batches keep native
    (K-major) quantized weights, large batches repack to bf16 when the
    model fits (measured crossover, models/loader.py)."""
    import jax

    from booster_tpu.models import load_model
    from booster_tpu.quant.qtensor import QTensor
    from tools.make_test_model import make_model

    path = str(tmp_path / "tiny.gguf")
    make_model(path, vocab_size=256, hidden=128, layers=2)

    single = load_model(path, weights="auto", batch_hint=1)
    q = jax.tree.leaves(single.params["layers"],
                        is_leaf=lambda x: isinstance(x, QTensor))
    assert any(isinstance(t, QTensor) and t.kind != "dense" for t in q)

    batched = load_model(path, weights="auto", batch_hint=64)
    q = jax.tree.leaves(batched.params["layers"],
                        is_leaf=lambda x: isinstance(x, QTensor))
    assert all(t.kind == "dense" for t in q if isinstance(t, QTensor))
