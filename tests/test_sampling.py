"""Sampling suite tests: filter semantics, distributions, penalties, Janus."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from booster_tpu.sampling import (
    JanusTables,
    SamplerState,
    SamplingParams,
    janus_sample,
    make_sampler_state,
    sample,
)
from booster_tpu.sampling.janus import (
    LANG_EN,
    LANG_RU,
    LANG_ZERO,
    SPACE_EN,
    SPACE_RU,
    is_lower,
    is_pedantic,
    tok_type,
)
from booster_tpu.sampling.samplers import (
    apply_penalties,
    min_p_filter,
    top_k_filter,
    top_p_filter,
    typical_filter,
)


def logits_row(vals):
    return jnp.asarray(np.array([vals], np.float32))


def test_top_k():
    lg = logits_row([1.0, 5.0, 3.0, 2.0, 4.0])
    out = np.asarray(top_k_filter(lg, 2))
    assert np.isfinite(out[0, [1, 4]]).all()
    assert np.isneginf(out[0, [0, 2, 3]]).all()


def test_top_p_keeps_mass():
    lg = logits_row([0.0, np.log(0.5) + 5, np.log(0.3) + 5, np.log(0.2) + 5])
    # probs ≈ (tiny, .5, .3, .2); top_p=0.75 keeps .5+.3
    out = np.asarray(top_p_filter(lg, 0.75))
    assert np.isfinite(out[0, 1]) and np.isfinite(out[0, 2])
    assert np.isneginf(out[0, 3]) and np.isneginf(out[0, 0])


def test_min_p():
    lg = logits_row([10.0, 10.0 + np.log(0.5), 10.0 + np.log(0.01)])
    out = np.asarray(min_p_filter(lg, 0.05))
    assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
    assert np.isneginf(out[0, 2])


def test_typical_keeps_most_typical():
    lg = logits_row([5.0, 4.0, 3.0, 2.0, 1.0])
    out = np.asarray(typical_filter(lg, 0.5))
    assert np.isfinite(out).any() and np.isneginf(out).any()


def test_penalties():
    lg = jnp.asarray(np.array([[2.0, -1.0, 0.5]], np.float32))
    prev = jnp.asarray(np.array([[0, 0, 1, -1]], np.int32))
    out = np.asarray(apply_penalties(lg, prev, 1.5, 0.1, 0.2))
    # token 0 seen twice: 2.0/1.5 - 2*0.1 - 0.2
    np.testing.assert_allclose(out[0, 0], 2.0 / 1.5 - 0.4, atol=1e-6)
    # token 1 seen once, negative: -1*1.5 - 0.1 - 0.2
    np.testing.assert_allclose(out[0, 1], -1.5 - 0.3, atol=1e-6)
    # token 2 unseen
    np.testing.assert_allclose(out[0, 2], 0.5, atol=1e-6)


def test_greedy_and_determinism():
    params = SamplingParams(temp=0.0)
    state = make_sampler_state(2, 64, seed=0)
    lg = jnp.asarray(np.array([[1.0, 9.0, 2.0], [4.0, 1.0, 0.0]], np.float32))
    tok, state = sample(lg, state, params)
    assert tok.tolist() == [1, 0]
    # history recorded
    assert state.prev_tokens[0, 0] == 1 and state.prev_tokens[1, 0] == 0


def test_sampling_distribution():
    """temp=1, no filters: empirical distribution tracks softmax."""
    params = SamplingParams(
        temp=1.0, top_k=0, top_p=1.0, min_p=0.0, penalty_repeat=1.0
    )
    B = 2048
    state = make_sampler_state(B, 8, seed=42)
    base = np.array([2.0, 1.0, 0.0], np.float32)
    lg = jnp.asarray(np.tile(base, (B, 1)))
    tok, _ = sample(lg, state, params)
    counts = np.bincount(np.asarray(tok), minlength=3) / B
    expect = np.exp(base) / np.exp(base).sum()
    np.testing.assert_allclose(counts, expect, atol=0.05)


def test_mirostat_runs():
    params = SamplingParams(temp=1.0, mirostat=2)
    state = make_sampler_state(4, 8, seed=1)
    lg = jnp.asarray(np.random.default_rng(0).normal(size=(4, 64)).astype(np.float32))
    tok, state = sample(lg, state, params)
    assert tok.shape == (4,)
    assert np.all(np.asarray(state.mirostat_mu) != 0.0)


# -- Janus ------------------------------------------------------------------


def test_tok_type_classifier():
    assert tok_type(b"hello") == LANG_EN
    assert tok_type(b" hello") == SPACE_EN
    assert tok_type("привет".encode()) == LANG_RU
    assert tok_type(" привет".encode()) == SPACE_RU
    assert tok_type(b"123") == LANG_ZERO
    assert tok_type("héllo".encode()) != LANG_ZERO  # é → other dominates


def test_is_lower():
    assert is_lower(b"abc")
    assert not is_lower(b"Abc")
    assert is_lower("привет".encode())
    assert not is_lower("Привет".encode())


def test_is_pedantic():
    for t in [b"123", b" 42", b"{", b" ]", b"```", b"0"]:
        assert is_pedantic(t), t
    for t in [b"hello", b" the", b"12x", b"."]:
        assert not is_pedantic(t), t


@pytest.fixture(scope="module")
def janus_setup():
    # build a small vocab via the tokenizer test helper
    import tests.test_tokenizer as tt

    from booster_tpu.tokenizer import Tokenizer

    tok = Tokenizer(tt.make_spm_vocab())
    tables = JanusTables.build(tok)
    return tok, tables


def test_janus_tables(janus_setup):
    tok, tables = janus_setup
    V = tok.vocab.n_tokens
    assert tables.scales.shape == (V,)
    assert tables.scales[0] == 1.0
    assert np.all(tables.scales > 0.9)  # all partial penalties near 1
    # eos penalized at start
    assert tables.scales[tables.eos_id] == pytest.approx(0.97)


def test_janus_sample_penalizes_repeats(janus_setup):
    tok, tables = janus_setup
    V = tok.vocab.n_tokens
    params = SamplingParams(janus=1)
    key = jax.random.split(jax.random.PRNGKey(0), 1)

    base = np.zeros((1, V), np.float32)
    tid = tok.vocab.token_to_id["▁hello"]
    alt = tok.vocab.token_to_id["▁world"]
    base[0, tid] = 10.0
    base[0, alt] = 9.99  # within the lo cutoff of the top

    # no history: hello wins mostly
    no_hist = jnp.full((1, 16), -1, jnp.int32)
    t1 = janus_sample(
        jnp.asarray(base), no_hist, jnp.asarray([0]), 128,
        jnp.asarray(tables.scales), jnp.asarray(tables.types),
        jnp.asarray(tables.pedantic), tables.eos_id, params, key,
    )
    assert int(t1[0]) in (tid, alt)

    # heavy repetition of hello: its logit is scaled by scale^16, world's not
    hello_scaled = base[0, tid] * tables.scales[tid] ** 16
    assert hello_scaled < base[0, alt]  # repetition flips the ranking
    hist = jnp.full((1, 16), tid, jnp.int32)
    rng_tokens = [
        int(
            janus_sample(
                jnp.asarray(base), hist, jnp.asarray([16]), 128,
                jnp.asarray(tables.scales), jnp.asarray(tables.types),
                jnp.asarray(tables.pedantic), tables.eos_id, params,
                jax.random.split(jax.random.PRNGKey(s), 1),
            )[0]
        )
        for s in range(8)
    ]
    assert alt in rng_tokens  # world becomes the dominant choice


def test_janus_jit_compiles(janus_setup):
    tok, tables = janus_setup
    V = tok.vocab.n_tokens
    params = SamplingParams(janus=1)

    @jax.jit
    def step(lg, hist, n_gen, key):
        return janus_sample(
            lg, hist, n_gen, 128,
            jnp.asarray(tables.scales), jnp.asarray(tables.types),
            jnp.asarray(tables.pedantic), tables.eos_id, params, key,
        )

    lg = jnp.asarray(np.random.default_rng(3).normal(size=(2, V)).astype(np.float32) * 3)
    hist = jnp.full((2, 32), -1, jnp.int32)
    key = jax.random.split(jax.random.PRNGKey(1), 2)
    out = step(lg, hist, jnp.asarray([0, 5]), key)
    assert out.shape == (2,)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) < V).all()
