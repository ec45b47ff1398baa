"""RoPE: styles, YaRN scaling parameters, freq factors."""

import numpy as np

import jax.numpy as jnp

from booster_tpu.models.config import ModelConfig
from booster_tpu.ops.rope import ROPE_NEOX, ROPE_NORM, apply_rope, rope_inv_freq, yarn_params


def make_cfg(**kw):
    base = dict(arch="llama", n_layers=1, n_embd=64, n_heads=4, n_kv_heads=4,
                n_ff=128, n_vocab=100, n_ctx_train=4096, head_dim=16)
    base.update(kw)
    return ModelConfig(**base)


def test_inv_freq_shape_and_factors():
    cfg = make_cfg()
    inv = rope_inv_freq(cfg)
    assert inv.shape == (8,)
    assert inv[0] == 1.0  # dim-0 frequency is base^0
    ff = np.full(8, 2.0, np.float32)
    inv2 = rope_inv_freq(cfg, ff)
    np.testing.assert_allclose(inv2, inv / 2.0, rtol=1e-6)


def test_yarn_params():
    none = yarn_params(make_cfg())
    np.testing.assert_array_equal(none[0], np.ones(8))
    lin, m = yarn_params(make_cfg(rope_scaling="linear", rope_scale=4.0))
    np.testing.assert_allclose(lin, np.full(8, 0.25))
    assert m == 1.0
    ypos, ym = yarn_params(make_cfg(rope_scaling="yarn", rope_scale=4.0,
                                    yarn_orig_ctx=2048))
    # high-frequency dims preserved (scale 1), low-frequency compressed
    assert ypos[0] == 1.0 or ypos[0] > 0.25
    assert ypos[-1] <= 0.2501
    assert ym > 1.0  # attention magnitude scale kicks in


def test_rope_styles_differ_and_preserve_norm():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 3, 2, 16)).astype(np.float32))
    pos = jnp.asarray([[5, 6, 7]], dtype=jnp.int32)
    inv = jnp.asarray(rope_inv_freq(make_cfg()))
    a = np.asarray(apply_rope(x, pos, inv, ROPE_NORM))
    b = np.asarray(apply_rope(x, pos, inv, ROPE_NEOX))
    assert not np.allclose(a, b)
    # rotation preserves per-pair magnitude → whole-vector norm
    np.testing.assert_allclose(
        np.linalg.norm(a, axis=-1), np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5
    )
    # position 0 is identity
    z = np.asarray(apply_rope(x, jnp.zeros((1, 3), jnp.int32), inv, ROPE_NORM))
    np.testing.assert_allclose(z, np.asarray(x), atol=1e-6)


def test_rope_norm_equals_neox_on_permuted_dims():
    """The two styles are the same rotation under the even/odd↔half-split
    permutation (the GGUF weight-permutation invariant)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 2, 1, 16)).astype(np.float32)
    perm = np.concatenate([np.arange(0, 16, 2), np.arange(1, 16, 2)])  # norm→neox
    x_perm = x[..., perm]
    pos = jnp.asarray([[3, 9]], dtype=jnp.int32)
    inv = jnp.asarray(rope_inv_freq(make_cfg()))
    out_norm = np.asarray(apply_rope(jnp.asarray(x), pos, inv, ROPE_NORM))
    out_neox = np.asarray(apply_rope(jnp.asarray(x_perm), pos, inv, ROPE_NEOX))
    np.testing.assert_allclose(out_norm[..., perm], out_neox, atol=1e-5)
