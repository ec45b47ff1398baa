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


def test_mirostat_v1_matches_reference_math():
    """v1 truncation size k follows the reference formula (llama-sampling
    .cpp:507-533) computed here in numpy from the same inputs."""
    from booster_tpu.sampling.samplers import _mirostat_v1

    rng = np.random.default_rng(5)
    V = 512
    lg = rng.normal(0, 2.0, (1, V)).astype(np.float32)
    mu0 = np.array([8.0], np.float32)
    tau, eta, m = 5.0, 0.1, 100

    # reference-math k
    p = np.exp(lg[0] - lg[0].max())
    p /= p.sum()
    order = np.argsort(-p)
    ps = p[order]
    s_hat_num = s_hat_den = 0.0
    for i in range(m - 1):
        t_i = np.log((i + 2) / (i + 1))
        b_i = np.log(ps[i] / ps[i + 1])
        s_hat_num += t_i * b_i
        s_hat_den += t_i * t_i
    s_hat = s_hat_num / s_hat_den
    eps = s_hat - 1
    k_ref = ((eps * 2**mu0[0]) / (1 - V ** (-eps))) ** (1 / s_hat)

    key = jax.random.split(jax.random.PRNGKey(0), 1)
    tok, mu1 = _mirostat_v1(jnp.asarray(lg), jnp.asarray(mu0), tau, eta, key, m=m)
    # the sampled token must come from the top-k_ref set
    k_int = max(1, int(k_ref))
    allowed = set(order[:k_int].tolist())
    assert int(tok[0]) in allowed
    # mu update = mu - eta * (-log2 p[tok] - tau)
    obs = -np.log2(p[int(tok[0])])
    np.testing.assert_allclose(float(mu1[0]), 8.0 - eta * (obs - tau), rtol=1e-4)


def test_penalty_window_last_n():
    """Only the last penalty_last_n accepted tokens are penalized."""
    from booster_tpu.sampling.samplers import history_window_mask

    # ring N=8, 10 tokens accepted → slots hold positions 2..9
    prev = jnp.asarray(np.arange(8)[None, :].astype(np.int32))
    pos = jnp.asarray([10])
    m = np.asarray(history_window_mask(prev, pos, 4))
    # newest = position 9 → ring slot 1; window of 4 = positions 6,7,8,9 →
    # slots 6,7,0,1
    assert m[0].tolist() == [True, True, False, False, False, False, True, True]
    # whole-ring window
    m_all = np.asarray(history_window_mask(prev, pos, -1))
    assert m_all[0].all()


def test_penalize_nl_false_restores_newline():
    params = SamplingParams(temp=0.0, penalty_repeat=2.0, penalize_nl=False,
                            penalty_last_n=8)
    state = make_sampler_state(1, 8, seed=0)
    from booster_tpu.sampling.samplers import accept_token

    nl = 2
    state = accept_token(state, jnp.asarray([nl]))
    state = accept_token(state, jnp.asarray([0]))
    lg = jnp.asarray(np.array([[1.0, 0.9, 0.99]], np.float32))
    # token 0 penalized → 0.5; nl (=2) seen but restored → 0.99 wins
    tok, _ = sample(lg, state, params, nl_token=nl)
    assert int(tok[0]) == 2


def test_seed_prompt_row_and_generated_counter():
    from booster_tpu.sampling.samplers import seed_prompt_row

    state = make_sampler_state(2, 4, seed=0)
    state = seed_prompt_row(state, 0, [7, 8, 9, 10, 11])  # longer than ring
    assert int(state.prev_pos[0]) == 5
    assert int(state.prompt_len[0]) == 5
    # last 4 tokens live at ring slots (p % 4): 8→0? positions 1..4 = 8,9,10,11
    ring = np.asarray(state.prev_tokens[0])
    assert sorted(ring.tolist()) == [8, 9, 10, 11]
    assert ring[(5 - 1) % 4] == 11  # newest at (pos-1) % N
    # row 1 untouched
    assert int(state.prev_pos[1]) == 0


def test_cfg_guidance_math():
    from booster_tpu.sampling.samplers import apply_guidance

    rng = np.random.default_rng(0)
    l = rng.normal(size=(2, 16)).astype(np.float32)
    g = rng.normal(size=(2, 16)).astype(np.float32)
    scale = 1.5
    out = np.asarray(apply_guidance(jnp.asarray(l), jnp.asarray(g), scale))

    def lsm(x):
        e = x - x.max(-1, keepdims=True)
        return e - np.log(np.exp(e).sum(-1, keepdims=True))

    expect = scale * (lsm(l) - lsm(g)) + lsm(g)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


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

    zero = jnp.asarray([0])
    # no history: hello wins mostly
    no_hist = jnp.full((1, 16), -1, jnp.int32)
    t1 = janus_sample(
        jnp.asarray(base), no_hist, zero, zero, 128,
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
                jnp.asarray(base), hist, jnp.asarray([16]), zero, 128,
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
            lg, hist, n_gen, jnp.zeros_like(n_gen), 128,
            jnp.asarray(tables.scales), jnp.asarray(tables.types),
            jnp.asarray(tables.pedantic), tables.eos_id, params, key,
        )

    lg = jnp.asarray(np.random.default_rng(3).normal(size=(2, V)).astype(np.float32) * 3)
    hist = jnp.full((2, 32), -1, jnp.int32)
    key = jax.random.split(jax.random.PRNGKey(1), 2)
    out = step(lg, hist, jnp.asarray([0, 5]), key)
    assert out.shape == (2,)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) < V).all()


def _janus_shortlist_reference(logits_row, types, pedantic, hi, lo):
    """Sort-based shortlist exactly as janus.cpp:287-330: desc sort, truncate
    at the first logit/top < cutoff."""
    order = np.argsort(-logits_row, kind="stable")
    top = order[0]
    top_logit = logits_row[top]
    cutoff = hi if (pedantic[top] or types[top] in (LANG_RU, LANG_EN)) else lo
    keep = [top]
    for tid in order[1:]:
        if logits_row[tid] / top_logit < cutoff:
            break
        keep.append(tid)
    return set(int(t) for t in keep)


def test_janus_shortlist_matches_sorted_reference(janus_setup):
    """Property test: the elementwise ratio cutoff equals the reference's
    sorted-prefix truncation for positive, negative, and mixed-sign logits."""
    tok, tables = janus_setup
    V = tok.vocab.n_tokens
    rng = np.random.default_rng(7)
    cases = [
        rng.normal(2.0, 3.0, V),          # mixed signs, positive top
        -np.abs(rng.normal(3.0, 1.0, V)), # all negative
        np.abs(rng.normal(3.0, 1.0, V)),  # all positive
    ]
    for row in cases:
        row = row.astype(np.float32)
        top = int(np.argmax(row))
        use_hi = tables.pedantic[top] or tables.types[top] in (LANG_RU, LANG_EN)
        cutoff = 0.99 if use_hi else 0.96
        ref = _janus_shortlist_reference(row, tables.types, tables.pedantic,
                                         0.99, 0.96)
        ours = (row / row[top] >= cutoff) | (np.arange(V) == top)
        ours_set = set(np.nonzero(ours)[0].tolist())
        # ties at the exact boundary can differ by sort stability; compare
        # modulo boundary-equal logits
        sym = ref.symmetric_difference(ours_set)
        for t in sym:
            assert row[t] / row[top] == pytest.approx(cutoff), (t, row[t])


def test_janus_window_excludes_prompt(janus_setup):
    """depth = min(depth, pos - promptLen): prompt tokens are not repeat-
    penalized, but lastToken at the first sample is the last prompt token."""
    tok, tables = janus_setup
    V = tok.vocab.n_tokens
    params = SamplingParams(janus=1, temp=0.0)
    tid = tok.vocab.token_to_id["▁hello"]
    alt = tok.vocab.token_to_id["▁world"]
    base = np.zeros((1, V), np.float32)
    base[0, tid] = 10.0
    base[0, alt] = 5.0
    key = jax.random.split(jax.random.PRNGKey(0), 1)
    # ring full of `tid`, but ALL of it is prompt → no pessimization
    hist = jnp.full((1, 16), tid, jnp.int32)
    t = janus_sample(
        jnp.asarray(base), hist, jnp.asarray([16]), jnp.asarray([16]), 128,
        jnp.asarray(tables.scales), jnp.asarray(tables.types),
        jnp.asarray(tables.pedantic), tables.eos_id, params, key,
    )
    assert int(t[0]) == tid  # not penalized: still the top choice
