"""The standard sampler suite, vectorized over a batch of logit rows.

Each filter reproduces the corresponding llama_sample_*_impl from
/root/reference/cpp/src/llama-sampling.cpp, reformulated without explicit
candidate arrays: filters mask logits to -inf in place of shrinking a sorted
list (identical distributions, TPU-friendly).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from booster_tpu.sampling.params import SamplingParams

NEG_INF = -jnp.inf


@dataclass
class SamplerState:
    """Per-slot sampler state (pytree).

    The ring holds the last N *accepted* tokens — prompt tokens are seeded in
    before generation (the reference pushes the prompt into the penalty
    history, bridge.cpp:618) and `prompt_len` records how many accepted
    tokens came from the prompt so Janus can window over generated tokens
    only (janus.cpp: depth = min(depth, pos - promptLen)).
    """

    prev_tokens: jnp.ndarray  # [B, N] int32 ring of recent tokens (-1 = empty)
    prev_pos: jnp.ndarray  # [B] int32 total accepted tokens (ring idx = pos % N)
    mirostat_mu: jnp.ndarray  # [B] f32
    key: jnp.ndarray  # [B, 2] per-slot PRNG keys (uint32)
    prompt_len: jnp.ndarray = None  # [B] int32 accepted tokens that were prompt


def _flatten(s):
    return (s.prev_tokens, s.prev_pos, s.mirostat_mu, s.key, s.prompt_len), None


jax.tree_util.register_pytree_node(
    SamplerState, _flatten, lambda aux, c: SamplerState(*c)
)


def make_sampler_state(batch: int, window: int, seed: int = 0) -> SamplerState:
    keys = jax.random.split(jax.random.PRNGKey(seed), batch)
    return SamplerState(
        prev_tokens=jnp.full((batch, window), -1, jnp.int32),
        prev_pos=jnp.zeros(batch, jnp.int32),
        mirostat_mu=jnp.zeros(batch, jnp.float32),
        key=keys,
        prompt_len=jnp.zeros(batch, jnp.int32),
    )


@partial(jax.jit, static_argnames=("batch", "window"))
def _seeded_state(batch: int, window: int, seed, ring, n) -> SamplerState:
    keys = jax.random.split(jax.random.PRNGKey(seed), batch)
    prev = jnp.full((batch, window), -1, jnp.int32).at[0].set(ring)
    npos = jnp.zeros(batch, jnp.int32).at[0].set(n)
    return SamplerState(prev, npos, jnp.zeros(batch, jnp.float32), keys, npos)


def make_seeded_state(batch: int, window: int, seed: int,
                      ids) -> SamplerState:
    """make_sampler_state + seed_prompt_row(0, ids) fused into ONE device
    computation.  The unfused pair issues ~6 small dispatches (zeros, full,
    split, 4 scatters); through the axon tunnel each costs a ~26 ms
    round-trip floor, which dominated measured TTFT (prefill itself is
    ~30 ms at 1.1B).  Bit-identical: same PRNG derivation, same ring."""
    import numpy as np

    ring = np.full(window, -1, np.int32)
    n = len(ids)
    for p in range(max(0, n - window), n):
        ring[p % window] = ids[p]
    return _seeded_state(batch, window, jnp.uint32(seed), jnp.asarray(ring),
                         jnp.int32(n))


def accept_token(state: SamplerState, tokens: jnp.ndarray) -> SamplerState:
    """Push sampled tokens into the penalty history ring."""
    B, N = state.prev_tokens.shape
    idx = state.prev_pos % N
    prev = state.prev_tokens.at[jnp.arange(B), idx].set(tokens)
    return SamplerState(prev, state.prev_pos + 1, state.mirostat_mu, state.key,
                        state.prompt_len)


def seed_prompt_row(state: SamplerState, row: int, ids) -> SamplerState:
    """Seed one slot's ring with its prompt tokens (host-side, called between
    steps).  Reference parity: llama_sampling_accept on every prompt token
    (bridge.cpp:618) so penalties and Janus's lastToken see the prompt."""
    import numpy as np

    N = state.prev_tokens.shape[1]
    n = len(ids)
    ring = np.full(N, -1, np.int32)
    for p in range(max(0, n - N), n):
        ring[p % N] = ids[p]
    return SamplerState(
        prev_tokens=state.prev_tokens.at[row].set(jnp.asarray(ring)),
        prev_pos=state.prev_pos.at[row].set(n),
        mirostat_mu=state.mirostat_mu,
        key=state.key,
        prompt_len=state.prompt_len.at[row].set(n),
    )


def history_window_mask(
    prev_tokens: jnp.ndarray,  # [B, N]
    prev_pos: jnp.ndarray,  # [B]
    last_n,  # int or [B]: window size (<0 → whole ring, 0 → empty)
) -> jnp.ndarray:
    """[B, N] bool: ring entries whose recency is within `last_n`.

    Ring slot j holds the token accepted at the largest position p < prev_pos
    with p ≡ j (mod N); its recency is (prev_pos - 1 - j) mod N."""
    B, N = prev_tokens.shape
    idx = jnp.arange(N)[None, :]
    recency = jnp.mod(prev_pos[:, None] - 1 - idx, N)
    ln = jnp.asarray(last_n)
    if ln.ndim == 0:
        ln = jnp.where(ln < 0, N, ln)
    else:
        ln = jnp.where(ln < 0, N, ln)[:, None]
    return (prev_tokens >= 0) & (recency < ln) & (recency < prev_pos[:, None])


# -- filters ----------------------------------------------------------------


def apply_penalties(
    logits: jnp.ndarray,  # [B, V]
    prev_tokens: jnp.ndarray,  # [B, N] (-1 padding ignored)
    penalty_repeat: float,
    penalty_freq: float,
    penalty_present: float,
    prev_pos: Optional[jnp.ndarray] = None,  # [B]; None → whole ring
    last_n: int = -1,  # window size; -1 → whole ring
) -> jnp.ndarray:
    """llama_sample_repetition_penalties_impl over the last `last_n` accepted
    tokens (reference takes prev.end() - penalty_last_n .. prev.end())."""
    B, V = logits.shape
    if prev_pos is not None:
        valid = history_window_mask(prev_tokens, prev_pos, last_n)
    else:
        valid = prev_tokens >= 0
    tok = jnp.where(valid, prev_tokens, 0)
    one = valid.astype(jnp.float32)
    counts = jnp.zeros((B, V), jnp.float32).at[
        jnp.arange(B)[:, None], tok
    ].add(one)
    seen = counts > 0
    if penalty_repeat != 1.0:
        scaled = jnp.where(
            logits <= 0, logits * penalty_repeat, logits / penalty_repeat
        )
        logits = jnp.where(seen, scaled, logits)
    logits = logits - counts * penalty_freq - seen.astype(jnp.float32) * penalty_present
    return logits


def apply_guidance(
    logits: jnp.ndarray,  # [B, V] main-context logits
    guidance_logits: jnp.ndarray,  # [B, V] negative-prompt context logits
    scale: float,
) -> jnp.ndarray:
    """Classifier-free guidance (llama_sample_apply_guidance_impl,
    /root/reference/cpp/src/llama-sampling.cpp:484): both rows log-softmaxed,
    then l = scale·(l − g) + g."""
    l = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    g = jax.nn.log_softmax(guidance_logits.astype(jnp.float32), axis=-1)
    return scale * (l - g) + g


def top_k_filter(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    V = logits.shape[-1]
    if k <= 0 or k >= V:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits: jnp.ndarray, p: float, min_keep: int = 1) -> jnp.ndarray:
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds p (inclusive), at least min_keep
    keep_sorted = (cum - probs) < p  # token included if mass before it < p
    keep_sorted = keep_sorted.at[..., :min_keep].set(True)
    n_keep = keep_sorted.sum(axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, n_keep - 1, axis=-1)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def min_p_filter(logits: jnp.ndarray, min_p: float, min_keep: int = 1) -> jnp.ndarray:
    if min_p <= 0.0:
        return logits
    max_logit = jnp.max(logits, axis=-1, keepdims=True)
    # p_i / p_max >= min_p  ⟺  logit_i >= logit_max + log(min_p)
    thresh = max_logit + jnp.log(min_p)
    kth = jax.lax.top_k(logits, max(min_keep, 1))[0][..., -1:]
    return jnp.where(logits < jnp.minimum(thresh, kth), NEG_INF, logits)


def tfs_filter(logits: jnp.ndarray, z: float, min_keep: int = 1) -> jnp.ndarray:
    """Tail-free sampling: drop the tail by curvature of the sorted prob curve."""
    if z >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    d2 = jnp.abs(jnp.diff(probs, n=2, axis=-1))
    norm = jnp.sum(d2, axis=-1, keepdims=True)
    d2 = jnp.where(norm > 0, d2 / jnp.maximum(norm, 1e-20), 1.0 / d2.shape[-1])
    cum = jnp.cumsum(d2, axis=-1)
    keep2 = cum < z  # over the d2 positions (length V-2)
    # last position stays kept when cum never reaches z (the reference's
    # last_idx defaults to size: all candidates survive then)
    keep = jnp.concatenate(
        [jnp.ones_like(keep2[..., :1]), keep2, cum[..., -1:] < z], axis=-1
    )
    keep = keep.at[..., :min_keep].set(True)
    n_keep = keep.sum(axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, n_keep - 1, axis=-1)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def typical_filter(logits: jnp.ndarray, p: float, min_keep: int = 1) -> jnp.ndarray:
    if p >= 1.0:
        return logits
    lp = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(lp)
    ent = -jnp.sum(jnp.where(probs > 0, probs * lp, 0.0), axis=-1, keepdims=True)
    shifted = jnp.abs(-lp - ent)  # distance from typical surprise
    order = jnp.argsort(shifted, axis=-1)  # ascending: most typical first
    probs_sorted = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    keep_sorted = (cum - probs_sorted) < p
    keep_sorted = keep_sorted.at[..., :min_keep].set(True)
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(logits.shape[0])[:, None], order
    ].set(keep_sorted)
    return jnp.where(keep, logits, NEG_INF)


def apply_temp(logits: jnp.ndarray, params: SamplingParams) -> jnp.ndarray:
    t = params.temp
    if params.dynatemp_range > 0.0:
        # entropy-scaled temperature (llama_sample_entropy_impl)
        t_min = max(0.0, t - params.dynatemp_range)
        t_max = t + params.dynatemp_range
        lp = jax.nn.log_softmax(logits, axis=-1)
        probs = jnp.exp(lp)
        ent = -jnp.sum(jnp.where(probs > 0, probs * lp, 0.0), axis=-1, keepdims=True)
        n_valid = jnp.sum(jnp.isfinite(logits), axis=-1, keepdims=True)
        max_ent = jnp.log(jnp.maximum(n_valid.astype(jnp.float32), 2.0))
        norm_ent = jnp.clip(ent / jnp.maximum(max_ent, 1e-9), 0.0, 1.0)
        dyn_t = t_min + (t_max - t_min) * norm_ent**params.dynatemp_exponent
        return logits / jnp.maximum(dyn_t, 1e-9)
    if t <= 0.0:
        return logits  # greedy handled by caller
    return logits / t


def _categorical(key, logits):
    return jax.random.categorical(key, logits, axis=-1)


def _mirostat_v2(logits, mu, tau, eta, key):
    """llama_sample_token_mirostat_v2_impl, vectorized.

    Reference order: softmax → truncate where surprise > mu → *re*-softmax →
    sample → observed surprise from the renormalized distribution."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    surprise = -lp / jnp.log(2.0)
    cut = surprise > mu[:, None]
    # keep at least the best token
    best = jnp.argmax(lp, axis=-1)
    masked = jnp.where(cut, NEG_INF, lp)
    masked = masked.at[jnp.arange(lp.shape[0]), best].set(
        lp[jnp.arange(lp.shape[0]), best]
    )
    renorm = jax.nn.log_softmax(masked, axis=-1)
    tok = jax.vmap(_categorical)(key, renorm)
    observed = -renorm[jnp.arange(lp.shape[0]), tok] / jnp.log(2.0)
    mu = mu - eta * (observed - tau)
    return tok, mu


def _mirostat_v1(logits, mu, tau, eta, key, m: int = 100):
    """llama_sample_token_mirostat_impl (v1), vectorized.

    Estimates the Zipf exponent s_hat from the top-m probabilities, derives
    the truncation size k, top-k samples from the *original* distribution,
    and updates mu with the observed (pre-truncation) surprise — exactly the
    reference flow (llama-sampling.cpp:507-550)."""
    B, V = logits.shape
    lp = jax.nn.log_softmax(logits, axis=-1)
    top_lp, _ = jax.lax.top_k(lp, min(m, V))  # [B, m] descending
    i = jnp.arange(top_lp.shape[1] - 1, dtype=jnp.float32)
    t_i = jnp.log((i + 2.0) / (i + 1.0))  # [m-1]
    b_i = top_lp[:, :-1] - top_lp[:, 1:]  # log(p_i / p_{i+1})
    s_hat = jnp.sum(t_i * b_i, axis=-1) / jnp.sum(t_i * t_i)
    eps = s_hat - 1.0
    k = jnp.power(
        (eps * jnp.power(2.0, mu)) / (1.0 - jnp.power(float(V), -eps)),
        1.0 / s_hat,
    )
    k = jnp.clip(k.astype(jnp.int32), 1, V)
    sorted_lg = jnp.sort(logits, axis=-1)[:, ::-1]
    cutoff = jnp.take_along_axis(sorted_lg, (k - 1)[:, None], axis=-1)
    masked = jnp.where(logits < cutoff, NEG_INF, lp)
    tok = jax.vmap(_categorical)(key, masked)
    observed = -lp[jnp.arange(B), tok] / jnp.log(2.0)
    mu = mu - eta * (observed - tau)
    return tok, mu


def sample(
    logits: jnp.ndarray,  # [B, V] raw model logits
    state: SamplerState,
    params: SamplingParams,
    nl_token: int = -1,  # vocab "\n" id: restored when penalize_nl is False
) -> tuple[jnp.ndarray, SamplerState]:
    """Full chain: penalties → filters (params order) → temp → sample.

    Greedy when temp <= 0.  Returns (tokens [B], updated state).
    """
    B = logits.shape[0]
    logits = logits.astype(jnp.float32)

    if params.penalty_repeat != 1.0 or params.penalty_freq != 0.0 or params.penalty_present != 0.0:
        nl_saved = logits[:, nl_token] if (not params.penalize_nl and nl_token >= 0) else None
        logits = apply_penalties(
            logits,
            state.prev_tokens,
            params.penalty_repeat,
            params.penalty_freq,
            params.penalty_present,
            prev_pos=state.prev_pos,
            last_n=params.penalty_last_n,
        )
        if nl_saved is not None:  # reference restores the NL logit post-penalty
            logits = logits.at[:, nl_token].set(nl_saved)

    keys = jax.vmap(jax.random.split, in_axes=(0, None))(state.key, 2)
    step_key, next_key = keys[:, 0], keys[:, 1]

    if params.temp <= 0.0:
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    elif params.mirostat in (1, 2):
        logits = apply_temp(logits, params)
        fn = _mirostat_v2 if params.mirostat == 2 else _mirostat_v1
        tokens, mu = fn(
            logits, state.mirostat_mu, params.mirostat_tau, params.mirostat_eta, step_key
        )
        state = SamplerState(state.prev_tokens, state.prev_pos, mu, next_key,
                             state.prompt_len)
        tokens = tokens.astype(jnp.int32)
        state = accept_token(state, tokens)
        return tokens, state
    else:
        for ch in params.samplers_sequence:
            if ch == "k":
                logits = top_k_filter(logits, params.top_k)
            elif ch == "f":
                logits = tfs_filter(logits, params.tfs_z)
            elif ch == "y":
                logits = typical_filter(logits, params.typical_p)
            elif ch == "p":
                logits = top_p_filter(logits, params.top_p)
            elif ch == "m":
                logits = min_p_filter(logits, params.min_p)
            elif ch == "t":
                logits = apply_temp(logits, params)
        tokens = jax.vmap(_categorical)(step_key, logits).astype(jnp.int32)

    state = SamplerState(state.prev_tokens, state.prev_pos, state.mirostat_mu,
                         next_key, state.prompt_len)
    state = accept_token(state, tokens)
    return tokens, state
