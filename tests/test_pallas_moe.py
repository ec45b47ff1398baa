"""Grouped MoE dispatch vs the dense all-experts reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import booster_tpu.ops.pallas_moe as pm
import booster_tpu.ops.pallas_qmm as pq
from booster_tpu.gguf.constants import GGMLType
from booster_tpu.quant import quantize, repack_gguf_tensor
from booster_tpu.quant.qtensor import dequantize_qtensor


@pytest.fixture(autouse=True)
def interpret_mode():
    pm.INTERPRET = True
    pq.INTERPRET = True
    yield
    pm.INTERPRET = False
    pq.INTERPRET = False


RNG = np.random.default_rng(0)


def make_stacked(fmt, E, Ne, K):
    w = RNG.standard_normal((E * Ne, K)).astype(np.float32) * 0.1
    return repack_gguf_tensor(quantize(w, fmt), fmt, (E * Ne, K)).astype_device()


def test_route_pad_roundtrip():
    E, N, k, bm = 4, 10, 2, 8
    x = jnp.asarray(RNG.standard_normal((N, 16)).astype(np.float32))
    topi = jnp.asarray(RNG.integers(0, E, (N, k)).astype(np.int32))
    xp, pos, tile_expert = pm.route_pad(x, topi, E, bm)
    assert xp.shape[0] % bm == 0
    # every expanded row recoverable at its position
    rows = np.asarray(xp)[np.asarray(pos)]
    expect = np.asarray(x)[np.repeat(np.arange(N), k)]
    np.testing.assert_array_equal(rows, expect)
    # each tile's real rows all belong to the tile's expert
    te = np.asarray(tile_expert)
    pos_np, topi_np = np.asarray(pos), np.asarray(topi).reshape(-1)
    for r, p in enumerate(pos_np):
        assert te[p // bm] == topi_np[r]


@pytest.mark.parametrize("fmt", [GGMLType.Q4_0, GGMLType.Q8_0, GGMLType.Q4_K])
def test_grouped_qmm_matches_per_expert(fmt):
    E, Ne, K, bm = 4, 128, 256, 8
    qt = make_stacked(fmt, E, Ne, K)
    N, k = 12, 2
    x = jnp.asarray(RNG.standard_normal((N, K)).astype(np.float32) * 0.3)
    topi = jnp.asarray(RNG.integers(0, E, (N, k)).astype(np.int32))
    xp, pos, te = pm.route_pad(x, topi, E, bm)
    y = np.asarray(pm.grouped_qmm(xp, qt, te, E, bm))

    wd = np.asarray(dequantize_qtensor(qt, dtype=jnp.float32)).reshape(E, Ne, K)
    rows = y[np.asarray(pos)].reshape(N, k, Ne)
    for n in range(N):
        for j in range(k):
            e = int(topi[n, j])
            want = np.asarray(x)[n] @ wd[e].T
            np.testing.assert_allclose(rows[n, j], want, atol=0.05, rtol=0.05)


def test_mixtral_hf_parity_grouped(tmp_path):
    """HF transformers logits parity with the grouped dispatch engaged
    (the autouse fixture turns interpret mode on, so _moe_ffn routes to
    moe_ffn_grouped)."""
    from tests.test_model_families import test_mixtral_moe

    test_mixtral_moe(tmp_path)


def test_moe_ffn_grouped_matches_dense():
    """Whole-layer check (routing + 3 grouped matmuls + weighted combine)
    vs the dense all-experts reference formulation."""
    import dataclasses
    import os

    from booster_tpu.models.config import ModelConfig
    from booster_tpu.models.llama import _moe_ffn

    E, k, C, ff = 4, 2, 128, 256
    cfg = ModelConfig(
        arch="mixtral", n_vocab=32, n_embd=C, n_layers=1, n_heads=4,
        n_kv_heads=4, n_ff=ff, n_ctx_train=2048, head_dim=C // 4,
        n_experts=E, n_experts_used=k,
    )
    lp = {
        "router": repack_gguf_tensor(
            quantize(RNG.standard_normal((E, C)).astype(np.float32) * 0.2,
                     GGMLType.F32), GGMLType.F32, (E, C)).astype_device(),
        "gate_exps": make_stacked(GGMLType.Q4_0, E, ff, C),
        "up_exps": make_stacked(GGMLType.Q4_0, E, ff, C),
        "down_exps": make_stacked(GGMLType.Q8_0, E, C, ff),
    }
    x = jnp.asarray(
        RNG.standard_normal((2, 5, C)).astype(np.float32) * 0.5
    ).astype(jnp.bfloat16)
    os.environ["BT_MOE_GROUPED"] = "0"
    try:
        dense = np.asarray(_moe_ffn(x, lp, cfg), np.float32)
    finally:
        os.environ["BT_MOE_GROUPED"] = "1"
    grouped = np.asarray(pm.moe_ffn_grouped(x, lp, cfg), np.float32)
    np.testing.assert_allclose(grouped, dense, atol=0.08, rtol=0.08)
